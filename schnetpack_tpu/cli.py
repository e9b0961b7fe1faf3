"""Training / prediction CLIs.

Parity: ``src/schnetpack/cli.py`` — ``spktrain`` composes the config tree
(with ``experiment=...`` overlays and dotted overrides), handles resume
(config persisted to the run dir, auto ``checkpoints/last.ckpt``), seeds,
instantiates datamodule/model/task/trainer, fits, tests on the best model
and exports the deployable inference model.  ``spkpredict`` runs a saved
model over a dataset and writes predictions.

Usage:
    python -m schnetpack_tpu.cli train experiment=md17 data.datapath=...
    python -m schnetpack_tpu.cli predict model_dir=<run dir> data.datapath=...
"""
from __future__ import annotations

import os
import pickle
import random
import sys
from typing import Dict, List, Optional

import numpy as np

from .config.compose import Composer, instantiate, save_config

_PKG_CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


def default_composer() -> Composer:
    # search path: CWD, CWD/configs, package configs (parity: train.yaml:29-31)
    return Composer([os.getcwd(), os.path.join(os.getcwd(), "configs"), _PKG_CONFIG_DIR])


def _seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def build_task(config: Dict, model):
    from .train import AtomisticTask, ReduceLROnPlateau

    task_cfg = dict(config.get("task", {}))
    scheduler_cfg = task_cfg.pop("scheduler", None)
    outputs = instantiate(task_cfg.pop("outputs", []))
    # callbacks/ema config group (parity: reference callbacks/ema.yaml) —
    # EMA is a task option here (donated-buffer weight copy)
    cb = config.get("callbacks", {}) or {}
    if isinstance(cb.get("ema"), dict) and task_cfg.get("ema_decay") is None:
        task_cfg["ema_decay"] = cb["ema"].get("decay", 0.995)
    task = AtomisticTask(model, outputs=outputs, **{
        k: v for k, v in task_cfg.items()
        if not isinstance(v, dict) or k == "optimizer_args"
    })
    scheduler = ReduceLROnPlateau(**scheduler_cfg) if scheduler_cfg else None
    return task, scheduler


def train(config: Dict) -> Dict[str, float]:
    import jax

    from .train import CSVLogger, ModelCheckpoint, TensorBoardLogger, Trainer

    run = config.get("run", {})
    run_dir = os.path.join(run.get("path", "runs"), str(run.get("id", "run")))
    os.makedirs(run_dir, exist_ok=True)

    # resume logic (parity: cli.py:67-89)
    cfg_path = os.path.join(run_dir, "config.yaml")
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    resume = os.path.exists(cfg_path) and os.path.exists(
        os.path.join(ckpt_dir, "last.ckpt")
    )
    save_config(config, cfg_path)

    seed = int(config.get("globals", {}).get("seed", 42))
    _seed_everything(seed)

    dm = instantiate(config["data"])
    dm.setup()

    model = instantiate(config["model"])
    # initialize transforms that need dataset statistics
    for t in list(dm.train_transforms):
        if hasattr(t, "datamodule"):
            t.datamodule(dm)

    task, scheduler = build_task(config, model)

    example = next(iter(dm.train_dataloader()))
    state = task.create_state(jax.random.PRNGKey(seed), example)

    trainer_cfg = dict(config.get("trainer", {}))
    trainer_cfg.pop("_target_", None)
    cb = config.get("callbacks", {}) or {}
    monitor = (cb.get("checkpoint") or {}).get("monitor", "val_loss")
    # callbacks/earlystopping group -> trainer early_stopping_patience
    if isinstance(cb.get("early_stopping"), dict):
        trainer_cfg.setdefault(
            "early_stopping_patience", cb["early_stopping"].get("patience")
        )
    from .train.loggers import build_logger

    loggers = []
    logger_cfg = config.get("logger")
    if isinstance(logger_cfg, dict) and logger_cfg:
        # logger config group (configs/logger/): {name: kwargs}
        for name, lcfg in logger_cfg.items():
            loggers.append(build_logger(name, run_dir, lcfg))
    else:
        for name in cb.get("loggers", ["csv"]):
            loggers.append(build_logger(name, run_dir))
    trainer = Trainer(
        log_dir=run_dir,
        scheduler=scheduler,
        scheduler_monitor=monitor,
        checkpoint=ModelCheckpoint(
            ckpt_dir, monitor=monitor,
            model_path=os.path.join(run_dir, config.get("globals", {}).get("model_path", "best_model")),
        ),
        loggers=loggers,
        **{k: v for k, v in trainer_cfg.items() if k in (
            "max_epochs", "log_every_n_steps", "val_every_n_epochs",
            "early_stopping_patience", "progress",
        )},
    )

    # data-parallel training over the local device mesh when requested
    # (parity: reference trainer/ddp_trainer.yaml)
    n_devices = int(trainer_cfg.get("devices", 1) or 1)
    if n_devices == -1:
        n_devices = jax.device_count()
    fit_task, train_loader = task, dm.train_dataloader()
    if n_devices > 1:
        from .parallel import make_mesh
        from .parallel.data_parallel import DataParallelTask, GroupedLoader

        mesh = make_mesh(n_devices, axis_names=("data",))
        fit_task = DataParallelTask(task, mesh)
        train_loader = GroupedLoader(dm.train_dataloader(), n_devices)

    state = trainer.fit(fit_task, state, train_loader, dm.val_dataloader(), resume=resume)
    metrics = trainer.test(task, state, dm.test_dataloader())
    print({k: round(v, 6) for k, v in metrics.items()})

    # persist the model definition for spkpredict / calculators
    with open(os.path.join(run_dir, "model_config.pkl"), "wb") as f:
        pickle.dump(config["model"], f)
    return metrics


def predict(config: Dict):
    import jax
    import jax.numpy as jnp

    from .train import PredictionWriter, load_pytree

    model_dir = config["model_dir"]
    with open(os.path.join(model_dir, "model_config.pkl"), "rb") as f:
        model_cfg = pickle.load(f)
    model = instantiate(model_cfg)
    params = load_pytree(os.path.join(model_dir, "best_model"))

    dm = instantiate(config["data"])
    dm.setup()
    writer = PredictionWriter(os.path.join(model_dir, "predictions"))
    apply = jax.jit(lambda p, b: model.apply(p, b))
    loader = dm.test_dataloader()
    for i, batch in enumerate(loader):
        out = apply(params, {k: jnp.asarray(v) for k, v in batch.items()})
        keep = {k: out[k] for k in model.model_outputs if k in out}
        keep["_idx"] = batch.get("_idx")
        writer.write_batch(keep, i)
    print(f"predictions written to {os.path.join(model_dir, 'predictions')}")


def load_model(model_dir: str):
    """Load a trained (model, params) pair from a run directory — the
    analog of the reference's ``load_model`` with version shims
    (``utils/compatibility.py:9-52``)."""
    from .train import load_pytree

    with open(os.path.join(model_dir, "model_config.pkl"), "rb") as f:
        model_cfg = pickle.load(f)
    model = instantiate(model_cfg)
    params = load_pytree(os.path.join(model_dir, "best_model"))
    return model, params


def main(argv: Optional[List[str]] = None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # console-script entry points encode the command in the program name
    prog = os.path.basename(sys.argv[0]) if sys.argv else ""
    implied = {"spktrain": "train", "spkpredict": "predict"}.get(prog)
    if implied:
        argv = [implied] + argv
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return
    command = argv[0]
    overrides = argv[1:]
    composer = default_composer()
    if command == "train":
        config = composer.compose("train", overrides)
        if config.get("print_config"):
            import yaml

            print(yaml.safe_dump(config, sort_keys=False))
        train(config)
    elif command == "predict":
        kv = dict(o.split("=", 1) for o in overrides)
        model_dir = kv.pop("model_dir")
        run_cfg_path = os.path.join(model_dir, "config.yaml")
        import yaml

        with open(run_cfg_path) as f:
            config = yaml.safe_load(f)
        for k, v in kv.items():
            from .config.compose import _parse_value, _set_dotted

            _set_dotted(config, k, _parse_value(v))
        config["model_dir"] = model_dir
        predict(config)
    else:
        raise SystemExit(f"unknown command {command!r}; use train|predict")


if __name__ == "__main__":
    main()
