"""spkmd CLI end-to-end (LJ argon) + HDF5 analysis + spectra."""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import os

import numpy as np
import pytest

from schnetpack_tpu.md.cli import main as spkmd_main


@pytest.fixture(scope="module")
def md_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mdcli")
    xyz = tmp / "argon.xyz"
    rng = np.random.RandomState(0)
    pos = np.array(
        [[i * 3.9, j * 3.9, k * 3.9] for i in range(2) for j in range(2) for k in range(2)]
    ) + rng.rand(8, 3) * 0.05
    lines = ["8", "argon cluster"]
    for p in pos:
        lines.append(f"Ar {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    xyz.write_text("\n".join(lines) + "\n")

    sim_dir = tmp / "sim"
    spkmd_main([
        f"system.molecule_file={xyz}",
        f"simulation_dir={sim_dir}",
        "calculator=lj",
        "dynamics=nvt",
        "dynamics.n_steps=60",
        "dynamics.chunk_size=30",
        "dynamics.thermostat.temperature_bath=40.0",
        "dynamics.thermostat.time_constant=20.0",
        "system.initializer.temperature=40.0",
    ])
    return str(sim_dir)


def test_spkmd_outputs(md_run):
    assert os.path.exists(os.path.join(md_run, "simulation.hdf5"))
    assert os.path.exists(os.path.join(md_run, "config.yaml"))


def test_hdf5_loader_and_power_spectrum(md_run):
    from schnetpack_tpu.md.data import HDF5Loader, PowerSpectrum

    data = HDF5Loader(os.path.join(md_run, "simulation.hdf5"))
    assert data.entries == 60
    assert data.n_replicas == 1
    T = data.get_temperature()
    assert T.shape[0] == 60
    assert np.isfinite(T).all()
    v = data.get("velocities")
    assert v.shape == (60, 8, 3)
    frame = data.convert_to_atoms(10)
    assert frame["_positions"].shape == (8, 3)

    spec = PowerSpectrum(data, resolution=32)
    spec.compute_spectrum(0)
    (freq, inten), = spec.get_spectrum()
    assert freq.shape == inten.shape
    assert np.isfinite(inten).all()
    assert freq[1] > 0  # cm^-1 axis
    data.close()


def test_spkmd_rpmd_dynamics(tmp_path):
    """dynamics=rpmd: bead count drives n_replicas, PILE thermostat wired."""
    xyz = tmp_path / "dimer.xyz"
    xyz.write_text("2\nargon dimer\nAr 0 0 0\nAr 3.8 0.2 0.1\n")
    sim_dir = tmp_path / "rpmd_sim"
    spkmd_main([
        f"system.molecule_file={xyz}",
        f"simulation_dir={sim_dir}",
        "calculator=lj",
        "dynamics=rpmd",
        "dynamics.integrator.n_beads=4",
        "dynamics.integrator.time_step=0.2",
        "dynamics.n_steps=20",
        "dynamics.chunk_size=10",
        "dynamics.thermostat.temperature_bath=30.0",
        "system.initializer.temperature=30.0",
        "system.initializer.remove_rotation=false",
    ])
    import h5py

    with h5py.File(os.path.join(sim_dir, "simulation.hdf5"), "r") as f:
        assert f["molecules"].attrs["n_replicas"] == 4
        pos = f["molecules/positions"][:]
        assert pos.shape == (20, 4, 2, 3)
        assert np.isfinite(pos).all()


def test_thermostat_group_override(tmp_path):
    """spkmd thermostat=<name> (config group) replaces the dynamics preset
    (parity: reference md_configs/dynamics/thermostat/*.yaml)."""
    xyz = tmp_path / "ar.xyz"
    rng = np.random.RandomState(1)
    pos = np.array(
        [[i * 3.9, j * 3.9, k * 3.9]
         for i in range(2) for j in range(2) for k in range(2)]
    ) + rng.rand(8, 3) * 0.05
    lines = ["8", "argon"] + [
        f"Ar {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}" for p in pos
    ]
    xyz.write_text("\n".join(lines) + "\n")
    sim_dir = tmp_path / "sim"
    spkmd_main([
        f"system.molecule_file={xyz}",
        f"simulation_dir={sim_dir}",
        "calculator=lj",
        "dynamics=nvt",
        "thermostat=langevin",
        "thermostat.temperature_bath=40.0",
        "thermostat.time_constant=20.0",
        "initializer=uniform",
        "initializer.temperature=40.0",
        "dynamics.n_steps=20",
        "dynamics.chunk_size=10",
    ])
    assert os.path.exists(os.path.join(sim_dir, "simulation.hdf5"))
    import yaml

    cfg = yaml.safe_load(open(os.path.join(sim_dir, "config.yaml")))
    assert cfg["thermostat"]["_target_"].endswith("LangevinThermostat")


def test_build_calculator_ensemble(monkeypatch, tmp_path):
    """calculator=ensemble wires EnsembleCalculator: N model dirs are
    loaded, params stacked on a leading ensemble axis (config-group
    parity: reference md_configs/calculator/spk_ensemble.yaml)."""
    import jax.numpy as jnp

    from schnetpack_tpu import properties as P
    from schnetpack_tpu.atomistic import Atomwise, Forces, PairwiseDistances
    from schnetpack_tpu.md.calculators import EnsembleCalculator
    from schnetpack_tpu.md import cli as md_cli
    from schnetpack_tpu.model import NeuralNetworkPotential
    from schnetpack_tpu.representation import PaiNN

    pot = NeuralNetworkPotential(
        representation=PaiNN(n_atom_basis=8, n_interactions=1, n_rbf=4,
                             cutoff=4.0),
        input_modules=[PairwiseDistances()],
        output_modules=[Atomwise(output_key=P.energy), Forces()],
    )
    import jax
    import numpy as np

    from schnetpack_tpu.data.loader import PaddingSpec, collate
    from schnetpack_tpu.transform.neighborlist import NeighborListTransform

    s = NeighborListTransform(4.0)({
        P.Z: np.array([18, 18]), P.R: np.array([[0.0, 0, 0], [3.0, 0, 0]]),
        P.cell: np.zeros((3, 3)), P.pbc: np.zeros(3, bool)})
    batch = collate([s], PaddingSpec(4, 16, 2))
    seeds = iter([0, 1])

    def fake_load_model(d):
        return pot, pot.init(jax.random.PRNGKey(next(seeds)),
                             {k: jnp.asarray(v) for k, v in batch.items()})

    monkeypatch.setattr("schnetpack_tpu.cli.load_model", fake_load_model)
    calc = md_cli.build_calculator({
        "_target_": "schnetpack_tpu.md.calculators.EnsembleCalculator",
        "model_dirs": "[a,b]", "cutoff": 4.0, "cutoff_shell": 0.5,
    })
    assert isinstance(calc, EnsembleCalculator)
    leaf = jax.tree_util.tree_leaves(calc.params)[0]
    assert leaf.shape[0] == 2
