"""Mask-aware metrics over padded batches.

The reference uses torchmetrics with ``dist_reduce_fx="sum"``
(``src/schnetpack/train/metrics.py``).  Here each metric returns
``(error_sum, count)`` so epoch aggregation — and cross-device ``psum`` in
the sharded path — is exact.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _broadcast_mask(mask: jax.Array, x: jax.Array) -> jax.Array:
    return mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))


def masked_counts(pred: jax.Array, mask: jax.Array) -> jax.Array:
    """Number of real scalar elements covered by the mask."""
    extra = 1.0
    for d in pred.shape[mask.ndim:]:
        extra *= d
    return jnp.sum(mask) * extra


def mae_sum(pred, target, mask) -> Tuple[jax.Array, jax.Array]:
    m = _broadcast_mask(mask, pred)
    return jnp.sum(jnp.abs(pred - target) * m), masked_counts(pred, mask)


def mse_sum(pred, target, mask) -> Tuple[jax.Array, jax.Array]:
    m = _broadcast_mask(mask, pred)
    return jnp.sum(jnp.square(pred - target) * m), masked_counts(pred, mask)


def tensor_diagonal_mae_sum(pred, target, mask, diagonal: bool = True):
    """MAE over diagonal (or off-diagonal) elements of [..., 3, 3] tensors
    (parity: TensorDiagonalMeanAbsoluteError, train/metrics.py:13-119)."""
    eye = jnp.eye(pred.shape[-1], dtype=pred.dtype)
    sel = eye if diagonal else 1.0 - eye
    m = _broadcast_mask(mask, pred) * sel
    err = jnp.sum(jnp.abs(pred - target) * m)
    count = jnp.sum(mask) * jnp.sum(sel)
    return err, count


METRICS = {
    "mae": mae_sum,
    "mse": mse_sum,
    "rmse": mse_sum,  # sqrt applied at aggregation time
    "tensor_diag_mae": lambda p, t, m: tensor_diagonal_mae_sum(p, t, m, True),
    "tensor_offdiag_mae": lambda p, t, m: tensor_diagonal_mae_sum(p, t, m, False),
}


def finalize_metric(name: str, total: float, count: float) -> float:
    v = total / max(count, 1.0)
    if name == "rmse":
        v = v ** 0.5
    return v
