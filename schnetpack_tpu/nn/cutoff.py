"""Cutoff modules (parity: ``src/schnetpack/nn/cutoff.py:36-158``)."""
from __future__ import annotations

import flax.linen as nn
import jax

from ..ops import cutoff as cutoff_ops


class CosineCutoff(nn.Module):
    cutoff: float

    def __call__(self, d: jax.Array) -> jax.Array:
        return cutoff_ops.cosine_cutoff(d, self.cutoff)


class MollifierCutoff(nn.Module):
    cutoff: float
    eps: float = 1e-7

    def __call__(self, d: jax.Array) -> jax.Array:
        return cutoff_ops.mollifier_cutoff(d, self.cutoff, self.eps)


class SwitchFunction(nn.Module):
    switch_on: float
    switch_off: float

    def __call__(self, d: jax.Array) -> jax.Array:
        return cutoff_ops.switch_function(d, self.switch_on, self.switch_off)
