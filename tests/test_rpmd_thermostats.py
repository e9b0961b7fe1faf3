"""RPMD thermostats: PIGLET per-normal-mode GLE, NHC-RP local/global,
multi-section GLE matrix parsing.

Parity targets: reference ``md/simulation_hooks/thermostats_rpmd.py`` —
PIGLET applies a DISTINCT drift/diffusion pair per ring-polymer normal mode
(ref :299-372); NHCRingPolymerThermostat uses NM-frequency thermostat
masses and a global centroid-chain option (ref :373-501).
"""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.md import (
    MaxwellBoltzmannInit,
    RingPolymer,
    Simulator,
    VelocityVerlet,
    load_molecules,
)
from schnetpack_tpu.md.calculators import LJCalculator
from schnetpack_tpu.md.simulation_hooks import (
    NHCRingPolymerThermostat,
    PIGLETThermostat,
    RPMDGLEThermostat,
)
from schnetpack_tpu.md.utils import NormalModeTransformer
from schnetpack_tpu.md.utils.thermostat_utils import load_gle_matrices
from schnetpack_tpu.units import md_units

EPS = 0.0103
R_EQ = 3.82


@pytest.fixture(scope="module", autouse=True)
def _x64():
    with jax.enable_x64():
        yield


def argon_cluster():
    rng = np.random.RandomState(0)
    grid = np.array(
        [[i, j, k] for i in range(2) for j in range(2) for k in range(2)], float
    )
    return {
        P.Z: np.full(8, 18),
        P.R: grid * 3.9 + rng.rand(8, 3) * 0.05,
        P.cell: np.zeros((3, 3)),
        P.pbc: np.zeros(3, bool),
    }


def _lj():
    return LJCalculator(r_equilibrium=R_EQ, well_depth=EPS, cutoff=8.0,
                        energy_unit="eV", position_unit="Ang")


def piglet_file(tmp_path, temps_K, gamma_fs=0.2):
    """PIGLET-format file: one (A, C) section per normal mode, s=1
    (pure Langevin per mode) with per-mode target temperatures."""
    lines = ["# PIGLET parameters", "# A MATRIX (femtoseconds^-1):"]
    for k, _ in enumerate(temps_K):
        lines.append(f"# Matrix for normal mode {k}")
        lines.append(f"  {gamma_fs}")
    lines.append("# C MATRIX (K):")
    for k, T in enumerate(temps_K):
        lines.append(f"# Matrix for normal mode {k}")
        lines.append(f"  {T}")
    f = tmp_path / "piglet.txt"
    f.write_text("\n".join(lines) + "\n")
    return str(f)


class TestGLEParser:
    def test_multi_section(self, tmp_path):
        path = piglet_file(tmp_path, [20.0, 160.0, 160.0, 160.0])
        a, c = load_gle_matrices(path)
        assert a.shape == (4, 1, 1)
        assert c.shape == (4, 1, 1)
        # A in internal inverse time; C in internal energy (K * kB)
        md = md_units()
        fs = 1e-3 * md.time  # 1 fs in internal time... via units parse
        from schnetpack_tpu.units import _parse_unit

        fs = _parse_unit("fs") * md.time
        np.testing.assert_allclose(a[0, 0, 0], 0.2 / fs, rtol=1e-10)
        np.testing.assert_allclose(c[0, 0, 0], 20.0 * md.kB, rtol=1e-10)
        np.testing.assert_allclose(c[1, 0, 0], 160.0 * md.kB, rtol=1e-10)

    def test_single_section_back_compat(self, tmp_path):
        f = tmp_path / "gle.txt"
        f.write_text("# A MATRIX (femtoseconds^-1):\n#  0.05\n")
        a, c = load_gle_matrices(str(f))
        assert a.shape == (1, 1, 1)
        assert c is None


class TestPIGLET:
    def test_bead_count_mismatch_raises(self, tmp_path):
        path = piglet_file(tmp_path, [20.0, 160.0])
        system = load_molecules([argon_cluster()], n_replicas=4,
                                dtype=jnp.float64)
        th = PIGLETThermostat(40.0, path)
        with pytest.raises(ValueError, match="normal-mode"):
            th.init_state(system, 0.5)

    def test_rpmdgle_rejects_piglet_file(self, tmp_path):
        path = piglet_file(tmp_path, [20.0, 160.0])
        system = load_molecules([argon_cluster()], n_replicas=2,
                                dtype=jnp.float64)
        th = RPMDGLEThermostat(40.0, path)
        with pytest.raises(ValueError, match="PIGLET"):
            th.init_state(system, 0.5)

    def test_per_mode_temperatures(self, tmp_path):
        """Each normal mode must equilibrate to ITS OWN C-matrix target —
        the distinguishing feature of PIGLET vs plain RPMD-GLE."""
        n_beads = 2
        t_centroid, t_internal = 25.0, 200.0
        path = piglet_file(tmp_path, [t_centroid, t_internal], gamma_fs=0.5)

        system = load_molecules([argon_cluster()], n_replicas=n_beads,
                                dtype=jnp.float64)
        system = MaxwellBoltzmannInit(25.0).initialize_system(
            system, jax.random.PRNGKey(2))
        integ = RingPolymer(0.5, n_beads=n_beads, temperature=25.0)
        th = PIGLETThermostat(40.0, path)
        sim = Simulator(system, integ, _lj(), simulator_hooks=[th],
                        progress=False)
        sim.simulate(2000, chunk_size=1000)

        # sample mode kinetic temperatures over a further window
        nm = NormalModeTransformer(n_beads)
        md = md_units()
        temps = []
        for _ in range(6):
            sim.simulate(200, chunk_size=200)
            s = sim.state.system
            pn = nm.beads2normal(s.momenta)  # [P, A, 3]
            ke2 = np.asarray(pn**2 / s.masses[None, :, None])
            temps.append(ke2.mean(axis=(1, 2)) / md.kB)
        t_modes = np.mean(temps, axis=0)

        assert 0.5 * t_centroid < t_modes[0] < 1.7 * t_centroid, t_modes
        assert 0.5 * t_internal < t_modes[1] < 1.7 * t_internal, t_modes
        # and the two modes are clearly distinct
        assert t_modes[1] > 3.0 * t_modes[0], t_modes


class TestNHCRingPolymer:
    def test_global_mass_scaling(self):
        """local=False scales the centroid's first chain link mass and dof
        by 3N (reference thermostats_rpmd.py:446-456)."""
        system = load_molecules([argon_cluster()], n_replicas=4,
                                dtype=jnp.float64)
        loc = NHCRingPolymerThermostat(40.0, time_constant=25.0, local=True)
        glob = NHCRingPolymerThermostat(40.0, time_constant=25.0, local=False)
        sl = loc.init_state(system, 0.5)
        sg = glob.init_state(system, 0.5)
        n3 = 3.0 * 8
        np.testing.assert_allclose(
            np.asarray(sg["q"][0, :, :, 0]),
            np.asarray(sl["q"][0, :, :, 0]) * n3, rtol=1e-12)
        # higher links and other modes unchanged
        np.testing.assert_allclose(np.asarray(sg["q"][0, :, :, 1]),
                                   np.asarray(sl["q"][0, :, :, 1]), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(sg["q"][1]),
                                   np.asarray(sl["q"][1]), rtol=1e-12)
        # per-mode masses follow kBT_P / omega_k^2: internal modes differ
        assert not np.allclose(np.asarray(sl["q"][1, 0, 0, 0]),
                               np.asarray(sl["q"][2, 0, 0, 0]))

    @pytest.mark.parametrize("local", [True, False])
    def test_equilibrates_to_bead_temperature(self, local):
        n_beads = 4
        target = 30.0
        system = load_molecules([argon_cluster()], n_replicas=n_beads,
                                dtype=jnp.float64)
        system = MaxwellBoltzmannInit(target).initialize_system(
            system, jax.random.PRNGKey(3))
        integ = RingPolymer(0.5, n_beads=n_beads, temperature=target)
        th = NHCRingPolymerThermostat(target, time_constant=25.0, local=local)
        sim = Simulator(system, integ, _lj(), simulator_hooks=[th],
                        progress=False)
        sim.simulate(1500, chunk_size=500)
        _, logs = sim._scan(sim.state, 500)
        T_mean = float(np.mean(np.asarray(logs["temperature"])[200:]))
        # ring-polymer convention: bead temperature -> n_beads * T
        assert 0.5 * n_beads * target < T_mean < 1.7 * n_beads * target
