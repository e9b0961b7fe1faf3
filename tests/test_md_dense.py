"""Dense-NBL MD path: consistency with all-pairs and skin rebuilds."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
from schnetpack_tpu.data.loader import PaddingSpec, collate
from schnetpack_tpu.md import MaxwellBoltzmannInit, Simulator, VelocityVerlet, load_molecules
from schnetpack_tpu.md.calculators import SchNetPackCalculator
from schnetpack_tpu.model import NeuralNetworkPotential
from schnetpack_tpu.representation import SchNet
from schnetpack_tpu.transform.neighborlist import NeighborListTransform


def _argon(n_side=2, a=3.9, jitter=0.05, seed=0):
    rng = np.random.RandomState(seed)
    pos = np.array(
        [[i * a, j * a, k * a]
         for i in range(n_side) for j in range(n_side) for k in range(n_side)]
    ) + rng.rand(n_side**3, 3) * jitter
    return {
        P.Z: np.full(len(pos), 18),
        P.R: pos,
        P.cell: np.zeros((3, 3)),
        P.pbc: np.zeros(3, bool),
    }


@pytest.fixture(scope="module")
def potential():
    pot = NeuralNetworkPotential(
        representation=SchNet(n_atom_basis=16, n_interactions=2, n_rbf=8, cutoff=5.0),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key="energy"), Forces()],
    )
    mol = _argon()
    s = NeighborListTransform(5.0)(dict(mol))
    params = pot.init(jax.random.PRNGKey(0), collate([s], PaddingSpec(16, 128, 2)))
    return pot, params


def _run(pot, params, nbl_mode, n_steps=30):
    system = load_molecules([_argon()], dtype=jnp.float64)
    system = MaxwellBoltzmannInit(30.0).initialize_system(system, jax.random.PRNGKey(1))
    calc = SchNetPackCalculator(
        pot, params, cutoff=5.0, cutoff_shell=1.0, neighbor_list=nbl_mode,
    )
    sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False)
    sim.simulate(n_steps, chunk_size=10)
    return sim


def test_dense_matches_all_pairs(potential):
    with jax.enable_x64():
        pot, params = potential
        params64 = jax.tree.map(
            lambda x: x.astype(jnp.float64) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
        sim_d = _run(pot, params64, "dense")
        sim_a = _run(pot, params64, "all_pairs")
        np.testing.assert_allclose(
            np.asarray(sim_d.state.system.positions),
            np.asarray(sim_a.state.system.positions),
            rtol=1e-9, atol=1e-11,
        )
        np.testing.assert_allclose(
            np.asarray(sim_d.state.system.energy),
            np.asarray(sim_a.state.system.energy),
            rtol=1e-9, atol=1e-12,
        )


def test_skin_rebuild_triggers(potential):
    with jax.enable_x64():
        pot, params = potential
        params64 = jax.tree.map(
            lambda x: x.astype(jnp.float64) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
        system = load_molecules([_argon()], dtype=jnp.float64)
        system = MaxwellBoltzmannInit(400.0).initialize_system(
            system, jax.random.PRNGKey(2)
        )
        calc = SchNetPackCalculator(
            pot, params64, cutoff=5.0, cutoff_shell=0.3, neighbor_list="dense",
        )
        sim = Simulator(system, VelocityVerlet(1.0), calc, progress=False)
        _ = sim.state  # triggers the initial NBL build
        build0 = calc.dense_nbl._build_positions.copy()
        sim.simulate(60, chunk_size=10)
        # hot system must have moved far enough to trigger at least one rebuild
        assert not np.allclose(calc.dense_nbl._build_positions, build0)
        assert np.isfinite(np.asarray(sim.state.system.positions)).all()
