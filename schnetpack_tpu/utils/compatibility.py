"""Model loading with version-migration shims.

Parity: ``src/schnetpack/utils/compatibility.py:9-52`` — ``load_model``
applies registered migrations so artifacts written by older versions of
the framework keep loading.
"""
from __future__ import annotations

import os
import pickle
from typing import Callable, Dict, List, Tuple

#: (from_version, migration) pairs applied in order to model configs
_MIGRATIONS: List[Tuple[str, Callable[[Dict], Dict]]] = []


def register_migration(from_version: str):
    def deco(fn):
        _MIGRATIONS.append((from_version, fn))
        return fn
    return deco


def migrate_config(model_cfg: Dict) -> Dict:
    version = model_cfg.pop("_version", "0.1.0")
    for from_version, fn in _MIGRATIONS:
        if version <= from_version:
            model_cfg = fn(model_cfg)
    return model_cfg


def load_model(model_dir: str):
    """Load (model, params) from a run directory or a deployed artifact."""
    from ..config.compose import instantiate
    from ..train import load_pytree

    if os.path.isfile(model_dir):
        from ..deploy import load_deployed

        model, params, _ = load_deployed(model_dir)
        return model, params
    with open(os.path.join(model_dir, "model_config.pkl"), "rb") as f:
        model_cfg = migrate_config(pickle.load(f))
    model = instantiate(model_cfg)
    params = load_pytree(os.path.join(model_dir, "best_model"))
    return model, params
