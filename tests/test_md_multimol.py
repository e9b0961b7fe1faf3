"""Multi-molecule (batched gas-phase) MD on the column fast path.

The reference's NeighborListMD builds per-molecule neighborhoods and
merges them (``md/neighborlist_md.py:55-98``).  The TPU column layout
supports the same batching by giving every molecule its own x-slab of one
virtual domain (see CellBlockNeighborListMD.build).  The molecules here
share overlapping RAW coordinates on purpose — the slab translation, not
the input geometry, must keep them apart.
"""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.md import (
    MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules,
)
from schnetpack_tpu.md.calculators import SchNetPackCalculator
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import PaiNN
from schnetpack_tpu.transform.neighborlist import NeighborListTransform

CUTOFF = 4.0


def _mols(n_mols=3, seed=0):
    rng = np.random.RandomState(seed)
    mols = []
    for m in range(n_mols):
        n = 14 + 4 * m
        R = rng.uniform(0.0, 6.0, (n, 3))
        # enforce a loose minimum separation so forces stay moderate
        for _ in range(40):
            d = np.linalg.norm(R[:, None] - R[None], axis=-1)
            np.fill_diagonal(d, 10.0)
            i, j = np.unravel_index(np.argmin(d), d.shape)
            if d[i, j] > 1.6:
                break
            R[i] += 0.5 * (R[i] - R[j]) / max(d[i, j], 1e-3)
        mols.append({
            P.Z: np.full(n, 18, dtype=np.int64), P.R: R,
            P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool),
        })
    return mols


def _potential():
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=32, n_interactions=2, n_rbf=8,
                             cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    probe = NeighborListTransform(CUTOFF)(
        {P.Z: np.full(8, 18, np.int64),
         P.R: np.random.RandomState(1).uniform(0, 4, (8, 3)),
         P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool)})
    params = pot.init(jax.random.PRNGKey(0),
                      collate([probe], PaddingSpec(16, 256, 2)))
    return pot, params


def test_multimol_column_forces_match_all_pairs():
    pot, params = _potential()
    mols = _mols()
    sys_col = load_molecules(mols)
    sys_ref = load_molecules(mols)

    calc_col = SchNetPackCalculator(pot, params, cutoff=CUTOFF,
                                    cutoff_shell=0.5,
                                    neighbor_list="cellblock")
    calc_ref = SchNetPackCalculator(pot, params, cutoff=CUTOFF)

    cs = calc_col.init_state(sys_col)
    out_col = calc_col.calculate(sys_col, cs)
    out_ref = calc_ref.calculate(sys_ref)

    f_col = np.asarray(out_col.forces[0])
    f_ref = np.asarray(out_ref.forces[0])
    assert np.isfinite(f_col).all()
    np.testing.assert_allclose(f_col, f_ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_col.energy), np.asarray(out_ref.energy),
        rtol=1e-4, atol=1e-5)


def test_multimol_column_md_runs():
    pot, params = _potential()
    mols = _mols(seed=3)
    system = load_molecules(mols)
    system = MaxwellBoltzmannInit(50.0).initialize_system(
        system, jax.random.PRNGKey(2))
    calc = SchNetPackCalculator(pot, params, cutoff=CUTOFF, cutoff_shell=0.5,
                                neighbor_list="cellblock")
    sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False,
                    log_keys=("energy", "temperature"), seed=0)
    sim.simulate(40, chunk_size=20)
    R = np.asarray(sim.system.positions)
    assert np.isfinite(R).all()
    assert np.isfinite(np.asarray(sim.system.forces)).all()


def test_multimol_periodic_rejected():
    pot, params = _potential()
    mols = _mols(n_mols=2, seed=5)
    for m in mols:
        m[P.cell] = np.eye(3) * 20.0
        m[P.pbc] = np.ones(3, bool)
    system = load_molecules(mols)
    calc = SchNetPackCalculator(pot, params, cutoff=CUTOFF,
                                neighbor_list="cellblock")
    with pytest.raises(NotImplementedError):
        calc.init_state(system)
