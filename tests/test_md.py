"""MD engine: NVE conservation, thermostats, RPMD, logging, restart."""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu import units
from schnetpack_tpu.md import (
    MaxwellBoltzmannInit,
    RingPolymer,
    Simulator,
    System,
    VelocityVerlet,
    load_molecules,
)
from schnetpack_tpu.md.calculators import LJCalculator
from schnetpack_tpu.md.simulation_hooks import (
    Checkpoint,
    FileLogger,
    LangevinThermostat,
    NHCThermostat,
)

# argon LJ parameters (eV / Angstrom)
EPS = 0.0103
R_EQ = 3.82
CUTOFF = 8.0


def argon_cluster(n=8, seed=0):
    rng = np.random.RandomState(seed)
    # loose cubic cluster with jitter, well separated
    grid = np.array(
        [[i, j, k] for i in range(2) for j in range(2) for k in range(2)], float
    )
    pos = grid * 3.9 + rng.rand(8, 3) * 0.05
    return {
        P.Z: np.full(n, 18),
        P.R: pos[:n],
        P.cell: np.zeros((3, 3)),
        P.pbc: np.zeros(3, bool),
    }


def make_sim(hooks=(), n_replicas=1, integrator=None, dtype=jnp.float64, temp=40.0):
    system = load_molecules([argon_cluster()], n_replicas=n_replicas, dtype=dtype)
    system = MaxwellBoltzmannInit(
        temp, remove_translation=True, remove_rotation=True
    ).initialize_system(system, jax.random.PRNGKey(1))
    calc = LJCalculator(
        r_equilibrium=R_EQ, well_depth=EPS, cutoff=CUTOFF,
        energy_unit="eV", position_unit="Ang",
    )
    integrator = integrator or VelocityVerlet(0.5)  # 0.5 fs
    return Simulator(system, integrator, calc, simulator_hooks=list(hooks), progress=False)


@pytest.fixture(scope="module", autouse=True)
def _x64():
    with jax.enable_x64():
        yield


class TestNVE:
    def test_energy_conservation(self):
        sim = make_sim()
        state0 = sim.state
        e0 = float(jnp.sum(state0.system.energy) + jnp.sum(state0.system.kinetic_energy))
        sim.simulate(400, chunk_size=200)
        s = sim.state.system
        e1 = float(jnp.sum(s.energy) + jnp.sum(s.kinetic_energy))
        # relative drift of total energy must be tiny
        scale = abs(float(jnp.sum(state0.system.kinetic_energy))) + abs(e0) + 1e-12
        assert abs(e1 - e0) / scale < 1e-4

    def test_momentum_conserved(self):
        sim = make_sim()
        sim.simulate(200, chunk_size=200)
        p = np.asarray(sim.state.system.momenta).sum(axis=1)
        np.testing.assert_allclose(p, 0.0, atol=1e-9)


class TestThermostats:
    def test_langevin_equilibrates(self):
        target = 40.0
        sim = make_sim(
            hooks=[LangevinThermostat(target, time_constant=20.0)], temp=10.0
        )
        sim.simulate(1500, chunk_size=500)
        logs_T = []
        # re-run a stretch and average the logged temperature
        sim2_state, logs = sim._scan(sim.state, 500)
        T_mean = float(np.mean(np.asarray(logs["temperature"])[200:]))
        assert 0.5 * target < T_mean < 1.6 * target

    def test_nhc_equilibrates(self):
        target = 40.0
        sim = make_sim(
            hooks=[NHCThermostat(target, time_constant=25.0)], temp=25.0
        )
        sim.simulate(1500, chunk_size=500)
        _, logs = sim._scan(sim.state, 500)
        T_mean = float(np.mean(np.asarray(logs["temperature"])[200:]))
        assert 0.5 * target < T_mean < 1.6 * target


class TestRPMD:
    def test_ring_polymer_runs_and_conserves_centroid(self):
        n_beads = 8
        integ = RingPolymer(0.25, n_beads=n_beads, temperature=40.0)
        sim = make_sim(n_replicas=n_beads, integrator=integ)
        state0 = sim.state
        p0 = np.asarray(state0.system.centroid_momenta).sum(axis=1)
        sim.simulate(100, chunk_size=100)
        s = sim.state.system
        assert np.isfinite(np.asarray(s.positions)).all()
        p1 = np.asarray(s.centroid_momenta).sum(axis=1)
        np.testing.assert_allclose(p1, p0, atol=1e-8)
        # beads should have spread out (finite temperature ring polymer)
        spread = np.asarray(s.positions).std(axis=0).mean()
        assert spread > 1e-5

    def test_normal_mode_roundtrip(self):
        from schnetpack_tpu.md.utils import NormalModeTransformer

        nm = NormalModeTransformer(16)
        x = jnp.asarray(np.random.RandomState(0).rand(16, 5, 3))
        np.testing.assert_allclose(
            np.asarray(nm.normal2beads(nm.beads2normal(x))), np.asarray(x), atol=1e-12
        )


class TestLoggingAndRestart:
    def test_hdf5_logging(self, tmp_path):
        h5file = str(tmp_path / "traj.h5")
        sim = make_sim(hooks=[FileLogger(h5file)])
        sim.simulate(50, chunk_size=25)
        import h5py

        with h5py.File(h5file, "r") as f:
            assert f["molecules/positions"].shape == (50, 1, 8, 3)
            assert f["properties/temperature"].shape[0] == 50
            assert f["molecules"].attrs["n_replicas"] == 1
            T = f["properties/temperature"][:]
            assert np.isfinite(T).all()

    def test_checkpoint_restart(self, tmp_path):
        ckpt = str(tmp_path / "ckpt.pkl")
        sim = make_sim(hooks=[Checkpoint(ckpt, every_n_steps=20)])
        sim.simulate(40, chunk_size=20)
        pos_end = np.asarray(sim.state.system.positions)

        with open(ckpt, "rb") as f:
            payload = pickle.load(f)
        sim2 = make_sim()
        sim2.restart_simulation(payload)
        np.testing.assert_allclose(
            np.asarray(sim2.state.system.positions), pos_end, atol=1e-12
        )
        assert sim2.n_simulated == 40


def test_ensemble_uncertainty_logged():
    """Ensemble uncertainties flow through the scan as System properties
    and land in the chunk logs (VERDICT r2 weak #7)."""
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.md.calculators.schnetpack_calculator import (
        EnsembleCalculator, stack_ensemble_params,
    )
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    mol = argon_cluster()
    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=8, n_interactions=1, n_rbf=6,
                             cutoff=CUTOFF),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    probe = NeighborListTransform(CUTOFF)(dict(mol))
    batch = collate([probe], PaddingSpec(16, 128, 2))
    p1 = pot.init(jax.random.PRNGKey(0), batch)
    p2 = pot.init(jax.random.PRNGKey(1), batch)
    calc = EnsembleCalculator(pot, stack_ensemble_params([p1, p2]),
                              cutoff=CUTOFF)
    system = load_molecules([mol])
    system = MaxwellBoltzmannInit(40.0).initialize_system(
        system, jax.random.PRNGKey(2))

    grabbed = {}

    class Grab:
        def on_simulation_start(self, sim):
            pass

        def on_simulation_end(self, sim):
            pass

        def process_chunk(self, sim, logs, start):
            grabbed.update(logs)

    sim = Simulator(system, VelocityVerlet(0.5), calc, progress=False,
                    log_keys=("energy", "energy_uncertainty",
                              "forces_uncertainty"))
    sim.host_hooks.append(Grab())
    sim.simulate(4, chunk_size=2)
    assert "energy_uncertainty" in grabbed
    assert "forces_uncertainty" in grabbed
    assert np.asarray(grabbed["forces_uncertainty"]).shape[-2:] == (8, 3)
    assert float(np.abs(grabbed["energy_uncertainty"]).max()) > 0
