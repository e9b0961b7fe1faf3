"""Device mesh helpers.

The reference's only distributed mechanism is Lightning DDP over NCCL
(SURVEY §2.12; ``configs/trainer/ddp_trainer.yaml``).  The TPU-native
equivalent is a ``jax.sharding.Mesh`` with a ``data`` axis (ICI within a
slice, DCN across slices) — XLA emits the collectives; there is no
NCCL/MPI analog to manage.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))
