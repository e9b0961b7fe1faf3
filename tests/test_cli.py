"""Config composition + CLI train on a synthetic MD17-format dataset."""
import pytest

pytestmark = pytest.mark.slow  # heavy: excluded from the smoke tier

import os

import numpy as np
import pytest
import yaml

from schnetpack_tpu.cli import default_composer, main, train
from schnetpack_tpu.config.compose import Composer, instantiate


def make_md17_npz(path, n_frames=20, n_atoms=5, seed=0):
    rng = np.random.RandomState(seed)
    Z = rng.randint(1, 9, n_atoms)
    R = rng.rand(n_frames, n_atoms, 3) * 3
    E = rng.randn(n_frames)
    F = rng.randn(n_frames, n_atoms, 3) * 0.1
    np.savez(path, z=Z, R=R, E=E, F=F)


class TestCompose:
    def test_compose_defaults(self):
        cfg = default_composer().compose("train", [])
        assert "run" in cfg and "globals" in cfg and "trainer" in cfg
        assert cfg["globals"]["cutoff"] == 5.0

    def test_experiment_overlay_and_overrides(self):
        cfg = default_composer().compose(
            "train",
            ["experiment=md17", "data.molecule=ethanol", "globals.lr=0.01",
             "trainer.max_epochs=3", "+extra.flag=7"],
        )
        assert cfg["data"]["molecule"] == "ethanol"
        assert cfg["model"]["representation"]["_target_"].endswith("SchNet")
        # interpolation resolved
        assert cfg["model"]["representation"]["cutoff"] == 5.0
        assert cfg["globals"]["lr"] == 0.01
        assert cfg["trainer"]["max_epochs"] == 3
        assert cfg["extra"]["flag"] == 7
        # md17 task has two outputs with the reference loss weights
        weights = [o["loss_weight"] for o in cfg["task"]["outputs"]]
        assert weights == [0.01, 0.99]

    def test_instantiate(self):
        cfg = {
            "_target_": "schnetpack_tpu.representation.SchNet",
            "n_atom_basis": 16, "n_interactions": 1, "cutoff": 4.0,
        }
        rep = instantiate(cfg)
        assert rep.n_atom_basis == 16


class TestTrainCLI:
    @pytest.mark.slow
    def test_end_to_end_md17_train(self, tmp_path):
        raw_dir = tmp_path / "raw"
        raw_dir.mkdir()
        make_md17_npz(raw_dir / "md17_aspirin.npz")

        overrides = [
            "experiment=md17",
            f"run.path={tmp_path}/runs",
            "run.id=testrun",
            f"run.data_dir={tmp_path}/data",
            f"data.raw_dir={raw_dir}",
            "data.num_train=12",
            "data.num_val=4",
            "data.num_test=4",
            "data.batch_size=4",
            "trainer.max_epochs=2",
            "trainer.progress=false",
            "model.representation.n_atom_basis=16",
            "model.representation.n_interactions=1",
            "model.representation.n_rbf=8",
        ]
        cfg = default_composer().compose("train", overrides)
        metrics = train(cfg)
        assert "test_loss" in metrics
        run_dir = f"{tmp_path}/runs/testrun"
        assert os.path.exists(os.path.join(run_dir, "config.yaml"))
        assert os.path.exists(os.path.join(run_dir, "best_model"))
        assert os.path.exists(os.path.join(run_dir, "checkpoints", "last.ckpt"))
        assert os.path.exists(os.path.join(run_dir, "model_config.pkl"))

        # predict CLI over the same data
        main(["predict", f"model_dir={run_dir}"])
        pred_dir = os.path.join(run_dir, "predictions")
        assert os.listdir(pred_dir)


class TestDataParallelCLI:
    @pytest.mark.slow
    def test_train_with_devices(self, tmp_path):
        """trainer.devices=8: data-parallel fit through the CLI path
        (parity: reference trainer=ddp_trainer)."""
        import jax

        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        raw_dir = tmp_path / "raw"
        raw_dir.mkdir()
        make_md17_npz(raw_dir / "md17_aspirin.npz", n_frames=40, n_atoms=5)
        overrides = [
            "experiment=md17",
            f"run.path={tmp_path}/runs", "run.id=dp",
            f"run.data_dir={tmp_path}/data", f"data.raw_dir={raw_dir}",
            "data.num_train=32", "data.num_val=4", "data.num_test=4",
            "data.batch_size=4",
            "trainer.max_epochs=1", "trainer.progress=false",
            "+trainer.devices=8",
            "model.representation.n_atom_basis=16",
            "model.representation.n_interactions=1",
            "model.representation.n_rbf=8",
        ]
        cfg = default_composer().compose("train", overrides)
        metrics = train(cfg)
        assert "test_loss" in metrics
        import numpy as np

        assert np.isfinite(metrics["test_loss"])


class TestConfigBreadth:
    """Round-2 additions: rmd17/response experiments + logger group."""

    def test_rmd17_experiment_composes(self):
        cfg = default_composer().compose("train", ["experiment=rmd17"])
        assert cfg["model"]["representation"]["_target_"].endswith("PaiNN")
        assert cfg["data"]["_target_"].endswith("rMD17")
        pot = instantiate(cfg["model"])
        assert pot.response_specs  # Forces spec present

    def test_response_experiment_composes(self):
        cfg = default_composer().compose("train", ["experiment=response"])
        assert cfg["model"]["representation"]["_target_"].endswith(
            "FieldSchNet")
        names = [o["name"] for o in cfg["task"]["outputs"]]
        assert {"dipole_moment", "polarizability", "shielding_1"} <= set(names)
        pot = instantiate(cfg["model"])
        props = set()
        for s in pot.response_specs:
            props.update(s.response_properties)
        assert "polarizability" in props

    def test_logger_group_overrides(self):
        cfg = default_composer().compose("train", [])
        assert set(cfg["logger"]) == {"csv", "tensorboard"}
        cfg = default_composer().compose("train", ["logger=aim"])
        assert set(cfg["logger"]) == {"aim"}

    def test_wandb_aim_fallback(self, tmp_path):
        from schnetpack_tpu.train.loggers import build_logger

        for name in ("wandb", "aim"):
            lg = build_logger(name, str(tmp_path))
            lg.log({"loss": 1.0}, step=0)
            lg.log({"loss": 0.5}, step=1)
        import json
        import os
        files = [f for f in os.listdir(tmp_path) if f.endswith(".jsonl")]
        assert len(files) == 2
        rows = [json.loads(l) for l in open(tmp_path / files[0])]
        assert rows[1]["loss"] == 0.5
