"""Dense neighbor-matrix layout: exact consistency with the flat pair list."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import PaiNN, SchNet
from schnetpack_tpu.transform.neighborlist import NeighborListTransform
from tests.conftest import random_molecule

CUTOFF = 5.0
FLAT_SPEC = PaddingSpec(32, 256, 3)
DENSE_SPEC = PaddingSpec(32, 256, 3, n_neighbors=16)


def test_collate_dense_structure(rng, argon_crystal):
    s = NeighborListTransform(6.0)(dict(argon_crystal))
    spec = PaddingSpec(16, 256, 2, n_neighbors=24)
    b = collate([s], spec)
    nbh = b[properties.nbh_idx]
    mask = b[properties.nbh_mask]
    # counts match flat list
    flat_counts = np.bincount(
        b[properties.idx_i][b[properties.pair_mask] > 0], minlength=16
    )
    np.testing.assert_array_equal(mask.sum(1)[:8], flat_counts[:8])
    # reconstructed pairs agree (as sets with offsets)
    R = b[properties.R]
    Rij_dense = R[nbh] + b[properties.nbh_offsets] - R[:, None]
    d_dense = np.linalg.norm(Rij_dense, axis=-1)
    assert (d_dense[mask > 0] < 6.0).all()


@pytest.mark.parametrize("rep_cls", [SchNet, PaiNN])
def test_flat_vs_dense_equivalence(rep_cls, rng):
    mols = [random_molecule(rng, 6), random_molecule(rng, 4)]
    pot = NeuralNetworkPotential(
        representation=rep_cls(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=properties.energy), Forces()],
    )
    b_flat = collate(mols, FLAT_SPEC)
    b_dense = collate(mols, DENSE_SPEC)
    params = pot.init(jax.random.PRNGKey(0), b_flat)

    out_flat = pot.apply(params, b_flat)
    out_dense = pot.apply(params, b_dense)
    np.testing.assert_allclose(
        np.asarray(out_flat[properties.energy][:2]),
        np.asarray(out_dense[properties.energy][:2]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_flat[properties.forces][:10]),
        np.asarray(out_dense[properties.forces][:10]),
        rtol=1e-4, atol=1e-5,
    )


def test_so3net_flat_vs_dense(rng):
    from schnetpack_tpu.representation import SO3net

    mols = [random_molecule(rng, 6), random_molecule(rng, 4)]
    pot = NeuralNetworkPotential(
        representation=SO3net(n_atom_basis=16, n_interactions=2, lmax=2,
                              n_rbf=8, cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=properties.energy), Forces()],
    )
    b_flat = collate(mols, FLAT_SPEC)
    b_dense = collate(mols, DENSE_SPEC)
    params = pot.init(jax.random.PRNGKey(0), b_flat)
    out_flat = pot.apply(params, b_flat)
    out_dense = pot.apply(params, b_dense)
    np.testing.assert_allclose(
        np.asarray(out_flat[properties.energy][:2]),
        np.asarray(out_dense[properties.energy][:2]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_flat[properties.forces][:10]),
        np.asarray(out_dense[properties.forces][:10]),
        rtol=1e-4, atol=1e-5,
    )


def test_stress_flat_vs_dense(argon_crystal):
    """Stress via strain reparameterization must agree between layouts
    (the Strain module also transforms the dense nbh_offsets)."""
    import jax

    with jax.enable_x64():
        s = NeighborListTransform(6.0)(dict(argon_crystal))
        pot = NeuralNetworkPotential(
            representation=SchNet(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=6.0),
            input_modules=[PairwiseDistances()],
            output_modules=[
                Atomwise(output_key=properties.energy),
                Forces(calc_forces=True, calc_stress=True),
            ],
        )
        flat_spec = PaddingSpec(16, 512, 2)
        dense_spec = PaddingSpec(16, 512, 2, n_neighbors=32)
        b_flat = collate([s], flat_spec, float_dtype=np.float64)
        b_dense = collate([s], dense_spec, float_dtype=np.float64)
        params = pot.init(jax.random.PRNGKey(0), b_flat)
        import jax.numpy as jnp

        params = jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params,
        )
        out_flat = pot.apply(params, {k: jnp.asarray(v) for k, v in b_flat.items()})
        out_dense = pot.apply(params, {k: jnp.asarray(v) for k, v in b_dense.items()})
        np.testing.assert_allclose(
            np.asarray(out_flat[properties.stress][0]),
            np.asarray(out_dense[properties.stress][0]),
            rtol=1e-8, atol=1e-12,
        )
        assert np.abs(np.asarray(out_dense[properties.stress][0])).max() > 1e-8


def test_train_grads_flat_vs_dense(rng):
    """Training on dense [A, K] batches (AtomsDataModule(dense_layout=True))
    gives the same parameter gradients as the flat pair-list layout."""
    import jax

    from schnetpack_tpu.train import AtomisticTask, ModelOutput

    mols = []
    for n in (6, 7):
        m = random_molecule(rng, n)
        m[properties.energy] = np.array([float((m[properties.R] ** 2).sum())])
        m[properties.forces] = -2.0 * m[properties.R]
        mols.append(m)
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=16, n_interactions=2, n_rbf=8,
                             cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=properties.energy), Forces()],
    )
    task = AtomisticTask(
        pot,
        outputs=[ModelOutput(properties.energy, loss_fn="mse", loss_weight=0.1),
                 ModelOutput(properties.forces, loss_fn="mse", loss_weight=0.9)],
        learning_rate=1e-3,
    )
    b_flat = {k: np.asarray(v) for k, v in collate(mols, FLAT_SPEC).items()}
    b_dense = {k: np.asarray(v) for k, v in collate(mols, DENSE_SPEC).items()}
    state = task.create_state(jax.random.PRNGKey(0), b_flat)

    def gradtree(batch):
        def loss_fn(p):
            out = pot.apply(p, dict(batch))
            l_e = ((out[properties.energy][:2].ravel()
                    - np.concatenate([m[properties.energy] for m in mols])) ** 2).mean()
            return l_e
        return jax.grad(loss_fn)(state.params)

    g_flat = gradtree(b_flat)
    g_dense = gradtree(b_dense)
    flat_leaves = jax.tree_util.tree_leaves(g_flat)
    dense_leaves = jax.tree_util.tree_leaves(g_dense)
    for a, b in zip(flat_leaves, dense_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_static_padding_dense_layout(rng, tmp_path):
    """static_padding_for_dataset(dense_layout=True) sizes n_neighbors so
    the loader emits dense batches for training (datamodule knob)."""
    from schnetpack_tpu.data.loader import static_padding_for_dataset

    mols = [NeighborListTransform(CUTOFF)(random_molecule(rng, n))
            for n in (5, 9, 4)]
    spec = static_padding_for_dataset(mols, batch_size=2, dense_layout=True)
    assert spec.n_neighbors >= max(
        int(np.bincount(m[properties.idx_i]).max()) for m in mols)
    b = collate(mols[:2], spec)
    assert properties.nbh_idx in b and b[properties.nbh_idx].shape[1] == spec.n_neighbors
