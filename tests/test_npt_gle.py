"""NPT barostat and GLE thermostat."""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu import properties as P
from schnetpack_tpu.md import (
    MaxwellBoltzmannInit,
    NPTVelocityVerlet,
    Simulator,
    VelocityVerlet,
    load_molecules,
)
from schnetpack_tpu.md.calculators import LJCalculator
from schnetpack_tpu.md.simulation_hooks import GLEThermostat, NHCBarostatIsotropic


def argon_fcc(reps=2, a=5.26):
    base = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
    pos = np.concatenate(
        [(base + [i, j, k]) * a for i in range(reps) for j in range(reps) for k in range(reps)]
    )
    return {
        P.Z: np.full(len(pos), 18),
        P.R: pos,
        P.cell: np.eye(3) * a * reps,
        P.pbc: np.ones(3, bool),
    }


@pytest.fixture(scope="module", autouse=True)
def _x64():
    with jax.enable_x64():
        yield


def _lj():
    return LJCalculator(
        r_equilibrium=3.82, well_depth=0.0103, cutoff=5.0,
        energy_unit="eV", position_unit="Ang", calc_stress=True,
    )


def test_npt_compresses_under_pressure():
    system = load_molecules([argon_fcc()], dtype=jnp.float64)
    system = MaxwellBoltzmannInit(20.0).initialize_system(system, jax.random.PRNGKey(0))
    v0 = float(system.volume[0, 0])

    barostat = NHCBarostatIsotropic(
        target_pressure=20000.0,  # bar — strongly compressive
        temperature_bath=20.0,
        time_constant=20.0,
        time_constant_barostat=50.0,
    )
    integ = NPTVelocityVerlet(1.0, barostat)
    sim = Simulator(system, integ, _lj(), simulator_hooks=[barostat], progress=False)
    sim.simulate(300, chunk_size=100)
    s = sim.state.system
    v1 = float(s.volume[0, 0])
    assert np.isfinite(np.asarray(s.positions)).all()
    assert v1 < v0 * 0.995  # compressed
    assert v1 > v0 * 0.5    # but not collapsed


def test_gle_thermostat_equilibrates(tmp_path):
    # single-variable GLE == Langevin with friction 1/20 fs^-1
    gle_file = tmp_path / "gle.txt"
    gle_file.write_text(
        "# GLE parameters\n"
        "# A MATRIX (femtoseconds^-1):\n"
        "#   0.05\n"
    )
    target = 40.0
    mol = {
        P.Z: np.full(8, 18),
        P.R: (np.array([[i, j, k] for i in range(2) for j in range(2) for k in range(2)],
                       float) * 3.9),
        P.cell: np.zeros((3, 3)),
        P.pbc: np.zeros(3, bool),
    }
    system = load_molecules([mol], dtype=jnp.float64)
    system = MaxwellBoltzmannInit(10.0).initialize_system(system, jax.random.PRNGKey(1))
    calc = LJCalculator(r_equilibrium=3.82, well_depth=0.0103, cutoff=8.0,
                        energy_unit="eV", position_unit="Ang")
    thermostat = GLEThermostat(target, str(gle_file))
    sim = Simulator(system, VelocityVerlet(0.5), calc,
                    simulator_hooks=[thermostat], progress=False)
    sim.simulate(1500, chunk_size=500)
    _, logs = sim._scan(sim.state, 500)
    T_mean = float(np.mean(np.asarray(logs["temperature"])[200:]))
    assert 0.5 * target < T_mean < 1.6 * target


def test_npt_anisotropic_stable():
    from schnetpack_tpu.md.simulation_hooks import NHCBarostatAnisotropic

    system = load_molecules([argon_fcc()], dtype=jnp.float64)
    system = MaxwellBoltzmannInit(20.0).initialize_system(system, jax.random.PRNGKey(0))
    v0 = float(system.volume[0, 0])

    barostat = NHCBarostatAnisotropic(
        target_pressure=20000.0, temperature_bath=20.0,
        time_constant=20.0, time_constant_barostat=50.0,
    )
    integ = NPTVelocityVerlet(1.0, barostat)
    sim = Simulator(system, integ, _lj(), simulator_hooks=[barostat], progress=False)
    sim.simulate(200, chunk_size=100)
    s = sim.state.system
    assert np.isfinite(np.asarray(s.positions)).all()
    assert np.isfinite(np.asarray(s.cells)).all()
    v1 = float(s.volume[0, 0])
    assert v1 < v0  # compresses under 20 kbar
    assert v1 > 0.5 * v0
    # cell stays roughly symmetric-positive (no inversion)
    cell = np.asarray(s.cells[0, 0])
    assert np.linalg.det(cell) > 0
