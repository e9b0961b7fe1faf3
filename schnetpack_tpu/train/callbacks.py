"""Training callbacks: checkpointing, best-model export, prediction writer.

Parity: ``src/schnetpack/train/callbacks.py`` (ModelCheckpoint saving the
deployable inference model, PredictionWriter; the EMA callback lives inside
``AtomisticTask`` as part of TrainState).  Checkpoints are orbax when
available, with a msgpack/pickle fallback.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    host = jax.tree.map(lambda x: np.asarray(x), tree)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


class ModelCheckpoint:
    """Track a monitored metric; keep last + best params, and export the
    inference model (params + model config) at every improvement
    (parity: train/callbacks.py:85-155)."""

    def __init__(
        self,
        dirpath: str,
        monitor: str = "val_loss",
        mode: str = "min",
        model_path: Optional[str] = None,
        save_last: bool = True,
    ):
        self.dirpath = dirpath
        self.monitor = monitor
        self.mode = mode
        self.model_path = model_path or os.path.join(dirpath, "best_inference_model")
        self.save_last = save_last
        self.best: Optional[float] = None
        os.makedirs(dirpath, exist_ok=True)

    def _is_better(self, v: float) -> bool:
        if self.best is None:
            return True
        return v < self.best if self.mode == "min" else v > self.best

    def on_validation_end(self, task, state, metrics: Dict[str, float], extra: Optional[Dict] = None):
        if self.save_last:
            self.save_checkpoint(task, state, "last.ckpt", extra)
        v = metrics.get(self.monitor)
        if v is not None and self._is_better(v):
            self.best = v
            self.save_checkpoint(task, state, "best.ckpt", extra)
            # deployable inference model: eval params (EMA when active)
            save_pytree(self.model_path, task.eval_params(state))
        return self.best

    def save_checkpoint(self, task, state, name: str, extra: Optional[Dict] = None):
        payload = {"state": state, "best": self.best}
        if extra:
            payload.update(extra)
        save_pytree(os.path.join(self.dirpath, name), payload)

    def load_checkpoint(self, name: str = "last.ckpt"):
        path = os.path.join(self.dirpath, name)
        if not os.path.exists(path):
            return None
        return load_pytree(path)


class PredictionWriter:
    """Write model predictions per batch to disk
    (parity: train/callbacks.py:21-82)."""

    def __init__(self, output_dir: str, write_interval: str = "batch"):
        self.output_dir = output_dir
        self.write_interval = write_interval
        self._epoch_buffer = []
        os.makedirs(output_dir, exist_ok=True)

    def write_batch(self, predictions: Dict, batch_idx: int):
        host = jax.tree.map(lambda x: np.asarray(x), predictions)
        if self.write_interval == "batch":
            with open(os.path.join(self.output_dir, f"batch_{batch_idx}.pkl"), "wb") as f:
                pickle.dump(host, f)
        else:
            self._epoch_buffer.append(host)

    def write_epoch(self, epoch: int):
        if self._epoch_buffer:
            with open(os.path.join(self.output_dir, f"epoch_{epoch}.pkl"), "wb") as f:
                pickle.dump(self._epoch_buffer, f)
            self._epoch_buffer = []
