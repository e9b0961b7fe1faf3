"""spkdeploy round-trip and user-config search path."""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import os
import pickle

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """A tiny trained run directory (reused across tests)."""
    import jax

    from schnetpack_tpu.cli import default_composer, train
    from tests.test_cli import make_md17_npz

    tmp = tmp_path_factory.mktemp("deploy")
    raw = tmp / "raw"
    raw.mkdir()
    make_md17_npz(raw / "md17_aspirin.npz", n_frames=16, n_atoms=5)
    overrides = [
        "experiment=md17",
        f"run.path={tmp}/runs", "run.id=dep",
        f"run.data_dir={tmp}/data", f"data.raw_dir={raw}",
        "data.num_train=10", "data.num_val=3", "data.num_test=3",
        "data.batch_size=5", "trainer.max_epochs=1", "trainer.progress=false",
        "model.representation.n_atom_basis=16",
        "model.representation.n_interactions=1",
        "model.representation.n_rbf=8",
    ]
    cfg = default_composer().compose("train", overrides)
    train(cfg)
    return str(tmp / "runs" / "dep")


def test_deploy_and_reload(trained_run, tmp_path):
    from schnetpack_tpu.deploy import deploy, load_deployed
    from schnetpack_tpu.interfaces import SpkCalculator

    out = str(tmp_path / "model.spk")
    deploy(trained_run, out, per_atom_energy=True)
    model, params, meta = load_deployed(out)
    assert meta["cutoff"] == 5.0
    assert "energy" in model.model_outputs

    water = {
        "_atomic_numbers": np.array([8, 1, 1]),
        "_positions": np.array([[0.0, 0, 0], [0.76, 0.59, 0], [-0.76, 0.59, 0]]),
        "_cell": np.zeros((3, 3)),
        "_pbc": np.zeros(3, bool),
    }
    calc = SpkCalculator(model, params, cutoff=meta["cutoff"])
    res = calc.calculate(water)
    assert np.isfinite(res["energy"])
    # per-atom energies were enabled for spatial-decomposition consumers
    assert "energy_per_atom" in model.model_outputs

    # utils.load_model also accepts deployed artifacts
    from schnetpack_tpu.utils import load_model

    model2, params2 = load_model(out)
    res2 = SpkCalculator(model2, params2, cutoff=meta["cutoff"]).calculate(water)
    assert res2["energy"] == pytest.approx(res["energy"], rel=1e-6)


def test_user_config_searchpath(tmp_path, monkeypatch):
    """A user experiment yaml in CWD/configs overrides like in hydra
    (parity: reference tests/user_config + searchpath train.yaml:29-31)."""
    from schnetpack_tpu.cli import default_composer

    cfgdir = tmp_path / "configs" / "experiment"
    cfgdir.mkdir(parents=True)
    (cfgdir / "user_exp.yaml").write_text(
        "globals:\n  cutoff: 7.5\n  lr: 0.123\n"
        "model:\n  representation:\n    n_interactions: 6\n"
    )
    monkeypatch.chdir(tmp_path)
    cfg = default_composer().compose("train", ["experiment=user_exp"])
    assert cfg["globals"]["cutoff"] == 7.5
    assert cfg["globals"]["lr"] == 0.123
    assert cfg["model"]["representation"]["n_interactions"] == 6
