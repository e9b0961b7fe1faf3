"""Training-layer extras: constraints, unsupervised outputs, sampler, metrics."""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.train import ConsiderOnlySelectedAtoms, ModelOutput, UnsupervisedModelOutput
from schnetpack_tpu.train.lr_scheduler import ReduceLROnPlateau
from schnetpack_tpu.train.metrics import tensor_diagonal_mae_sum


def _fake_batch(A=6, M=2):
    return {
        P.Z: jnp.ones(A, jnp.int32),
        P.n_atoms: jnp.array([3, 3]),
        P.atom_mask: jnp.ones(A),
        P.mol_mask: jnp.ones(M),
        "forces": jnp.zeros((A, 3)),
        "selected": jnp.array([1.0, 0, 0, 1, 0, 0]),
    }


def test_consider_only_selected_atoms():
    batch = _fake_batch()
    pred = {"forces": jnp.ones((6, 3))}
    out = ModelOutput(
        "forces", loss_fn="mae",
        constraints=[ConsiderOnlySelectedAtoms("selected")],
    )
    loss = float(out.loss(pred, batch))
    # MAE over selected atoms only: |1-0| = 1 everywhere selected
    assert loss == pytest.approx(1.0)
    sums = out.metric_sums(pred, batch, "val")
    s, c = sums["val_forces_mae"]
    assert float(c) == 2 * 3  # 2 selected atoms x 3 components


def test_unsupervised_output():
    batch = _fake_batch()
    pred = {"reg": jnp.full((2,), 3.0)}
    out = UnsupervisedModelOutput("reg", loss_fn="mse", loss_weight=2.0)
    # target is implicit zero
    assert float(out.loss(pred, batch)) == pytest.approx(2.0 * 9.0)


def test_tensor_diagonal_metric():
    pred = jnp.broadcast_to(jnp.eye(3) * 2.0, (2, 3, 3))
    target = jnp.zeros((2, 3, 3))
    mask = jnp.ones(2)
    s, c = tensor_diagonal_mae_sum(pred, target, mask, diagonal=True)
    assert float(s) / float(c) == pytest.approx(2.0)
    s, c = tensor_diagonal_mae_sum(pred, target, mask, diagonal=False)
    assert float(s) == pytest.approx(0.0)


def test_plateau_scheduler_reduces():
    sched = ReduceLROnPlateau(factor=0.5, patience=2, smoothing_factor=0.0)
    scale = 1.0
    for v in [1.0, 1.0, 1.0, 1.0, 1.0]:
        scale = sched.step(v)
    assert scale == pytest.approx(0.5)
    # smoothing path
    sched2 = ReduceLROnPlateau(factor=0.5, patience=100, smoothing_factor=0.9)
    sched2.step(1.0)
    sched2.step(0.0)
    assert sched2.smoothed == pytest.approx(0.9)


def test_stratified_sampler(tmp_path, rng):
    from schnetpack_tpu.data import ASEAtomsData, NumberOfAtomsCriterion, StratifiedSampler

    path = str(tmp_path / "strat.db")
    ds = ASEAtomsData.create(path, property_unit_dict={"energy": "eV"})
    # imbalanced sizes: 18 small + 2 large
    systems = [dict(numbers=np.ones(2, int), positions=np.zeros((2, 3)),
                    energy=np.array([0.0])) for _ in range(18)]
    systems += [dict(numbers=np.ones(20, int), positions=np.zeros((20, 3)),
                     energy=np.array([0.0])) for _ in range(2)]
    ds.add_systems(systems)
    ds = ASEAtomsData(path)
    sampler = StratifiedSampler(ds, NumberOfAtomsCriterion(), num_samples=400,
                                num_bins=2, seed=0)
    idx = list(sampler)
    large_frac = np.mean([i >= 18 for i in idx])
    # inverse-frequency weighting lifts the rare class toward parity
    assert large_frac > 0.3
