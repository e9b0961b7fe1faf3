"""Parity gate 5 (BASELINE.md): NVT liquid water with a Nose-Hoover
thermostat, then 16-bead ring-polymer PIMD — both driven end-to-end
through the ``spkmd`` CLI on the flexible SPC/Fw water calculator.

Asserts temperature statistics against the bath and structural integrity
(no OH dissociation) — the full MD stack: config composition, system
loading, NHC/PILE thermostats, lax.scan step loop, HDF5 logging.
"""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import os

import numpy as np

from schnetpack_tpu.md.cli import main as spkmd_main

KB_KCAL = 0.0019872043  # kcal/mol/K (only for sanity math in comments)


def _water_box_xyz(path, n_side=2, a=3.105):
    """n_side^3 waters on a cubic lattice at ~1 g/cc (a=3.105 A)."""
    rng = np.random.RandomState(2)
    lines = []
    n_w = n_side ** 3
    L = n_side * a
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                O = np.array([i, j, k], float) * a + a / 2
                O += rng.rand(3) * 0.05
                # bent water: OH bonds ~1.012 A, HOH ~113 deg
                h1 = O + np.array([0.76, 0.67, 0.0])
                h2 = O + np.array([-0.76, 0.67, 0.0])
                lines.append(("O", O))
                lines.append(("H", h1))
                lines.append(("H", h2))
    txt = [str(3 * n_w),
           f'Lattice="{L} 0 0 0 {L} 0 0 0 {L}" pbc="T T T"']
    for el, p in lines:
        txt.append(f"{el} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    path.write_text("\n".join(txt) + "\n")
    return L


def _mean_temperature(sim_dir, skip_frac=0.5):
    from schnetpack_tpu.md.data import HDF5Loader

    data = HDF5Loader(os.path.join(sim_dir, "simulation.hdf5"))
    T = np.asarray(data.get_temperature())
    n = len(T)
    return float(T[int(n * skip_frac):].mean())


def test_gate5_nvt_water_nhc(tmp_path):
    xyz = tmp_path / "water.xyz"
    _water_box_xyz(xyz)
    sim_dir = tmp_path / "nvt"
    spkmd_main([
        f"system.molecule_file={xyz}",
        f"simulation_dir={sim_dir}",
        "calculator=spcfw",
        "dynamics=nvt",
        "dynamics.thermostat._target_="
        "schnetpack_tpu.md.simulation_hooks.NHCThermostat",
        "dynamics.thermostat.temperature_bath=300.0",
        "dynamics.thermostat.time_constant=20.0",
        "dynamics.n_steps=600",
        "dynamics.chunk_size=100",
        "dynamics.integrator.time_step=0.5",
        "system.initializer.temperature=300.0",
    ])
    assert os.path.exists(os.path.join(sim_dir, "simulation.hdf5"))
    T_mean = _mean_temperature(str(sim_dir))
    # NHC must hold the box near the bath (8 waters: ~25% sigma_T, loose)
    assert 180.0 < T_mean < 420.0, f"NVT mean T {T_mean}"

    # structural integrity: no OH dissociation at the end of the run
    from schnetpack_tpu import properties as P
    from schnetpack_tpu.md.data import HDF5Loader

    data = HDF5Loader(os.path.join(sim_dir, "simulation.hdf5"))
    R_last = np.asarray(data.convert_to_atoms(-1)[P.R])
    for w in range(len(R_last) // 3):
        O, H1, H2 = R_last[3 * w], R_last[3 * w + 1], R_last[3 * w + 2]
        for H in (H1, H2):
            d = np.linalg.norm(H - O)
            assert d < 1.6, f"water {w} dissociated (OH={d:.2f} A)"


def test_gate5_pimd_16_beads(tmp_path):
    xyz = tmp_path / "water.xyz"
    _water_box_xyz(xyz)
    sim_dir = tmp_path / "pimd"
    spkmd_main([
        f"system.molecule_file={xyz}",
        f"simulation_dir={sim_dir}",
        "calculator=spcfw",
        "dynamics=rpmd",
        "dynamics.integrator.n_beads=16",
        "dynamics.integrator.time_step=0.2",
        "dynamics.integrator.temperature=300.0",
        "dynamics.thermostat.temperature_bath=300.0",
        "dynamics.thermostat.time_constant=20.0",
        "dynamics.n_steps=300",
        "dynamics.chunk_size=100",
        "system.initializer.temperature=300.0",
    ])
    assert os.path.exists(os.path.join(sim_dir, "simulation.hdf5"))
    # PIMD: the PILE thermostat drives every normal mode to the bath.
    # Ring-polymer convention (cf. test_rpmd_thermostats): the logged
    # bead-kinetic temperature equilibrates to n_beads * T_bath.
    T_mean = _mean_temperature(str(sim_dir))
    assert 0.5 * 16 * 300.0 < T_mean < 1.7 * 16 * 300.0, \
        f"PIMD bead-kinetic mean T {T_mean}"
