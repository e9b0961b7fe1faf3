"""Multi-device paths on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.parallel import (
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    shard_global_batch,
    stack_device_batches,
)
from schnetpack_tpu.parallel.spatial import pad_batch_for_mesh, shard_batch_by_atoms
from schnetpack_tpu.representation import PaiNN, SchNet
from schnetpack_tpu.train import AtomisticTask, ModelOutput
from tests.conftest import random_molecule

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _make_pot(rep_cls=SchNet, **kw):
    return NeuralNetworkPotential(
        representation=rep_cls(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=5.0, **kw),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key="energy"), Forces()],
    )


def test_data_parallel_matches_single_device(rng):
    """8-way DP gradients == single-device gradients over the same batches."""
    pot = _make_pot()
    task = AtomisticTask(
        pot, outputs=[ModelOutput("energy", loss_weight=0.1),
                      ModelOutput("forces", loss_weight=0.9)],
        learning_rate=1e-3,
    )
    spec = PaddingSpec(16, 128, 2)
    per_dev = []
    for d in range(8):
        mol = random_molecule(rng, 5)
        mol["energy"] = np.array(0.1 * d)
        mol["forces"] = np.zeros((5, 3))
        per_dev.append(collate([mol], spec))
    state = task.create_state(jax.random.PRNGKey(0), per_dev[0])

    mesh = make_mesh(8, axis_names=("data",))
    with mesh:
        gb = shard_global_batch(stack_device_batches(per_dev), mesh)
        pstep = make_parallel_train_step(task, mesh)
        pstate, pmetrics = pstep(state, gb)

    # single-device reference: average gradients over the 8 batches manually
    grads = []
    for b in per_dev:
        (_, _), g = jax.value_and_grad(task.loss_and_outputs, has_aux=True)(
            state.params, {k: jnp.asarray(v) for k, v in b.items()}
        )
        grads.append(g)
    mean_grad = jax.tree.map(lambda *x: sum(x) / 8.0, *grads)
    import optax

    updates, _ = task.optimizer.update(mean_grad, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)

    for a, b in zip(jax.tree.leaves(pstate.params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)

    loss = float(pmetrics["train_loss"][0])
    assert np.isfinite(loss)


def test_atom_sharded_forces_match_replicated(rng):
    """Spatial (atom) sharding over 8 devices gives identical forces."""
    pot = _make_pot(PaiNN)
    mols = [random_molecule(rng, 7), random_molecule(rng, 6)]
    spec = PaddingSpec(16, 256, 3, n_neighbors=8)
    batch = collate(mols, spec)
    batch = pad_batch_for_mesh(batch, 8)
    params = pot.init(jax.random.PRNGKey(1), batch)
    ref = pot.apply(params, {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh(8, axis_names=("atoms",))
    with mesh:
        sharded, shardings = shard_batch_by_atoms(batch, mesh)
        step = jax.jit(lambda p, b: pot.apply(p, b))
        out = step(params, sharded)
    np.testing.assert_allclose(
        np.asarray(out["energy"]), np.asarray(ref["energy"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["forces"]), np.asarray(ref["forces"]), rtol=1e-4, atol=1e-6
    )
