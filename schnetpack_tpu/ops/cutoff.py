"""Smooth cutoff envelopes (pure functions of pair distance).

Behavioral parity with the reference cutoff modules
(``src/schnetpack/nn/cutoff.py:36-158``): Behler cosine cutoff, mollifier
cutoff, and the smooth switch used by damped Coulomb / ZBL terms.  All are
written mask-safe: inputs beyond the cutoff produce exactly 0 with finite
gradients, so padded pairs (placed at d >= cutoff by the collate) contribute
nothing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cosine_cutoff(d: jax.Array, cutoff: float) -> jax.Array:
    """Behler-style cosine cutoff: 0.5*(cos(pi d/rc)+1) for d<rc else 0."""
    f = 0.5 * (jnp.cos(d * (jnp.pi / cutoff)) + 1.0)
    return jnp.where(d < cutoff, f, 0.0)


def mollifier_cutoff(d: jax.Array, cutoff: float, eps: float = 1e-7) -> jax.Array:
    """exp(1 - 1/(1-(d/rc)^2)) inside the cutoff, 0 outside."""
    mask = (d + eps) < cutoff
    ratio = jnp.where(mask, d / cutoff, 0.0)
    exponent = 1.0 - 1.0 / jnp.clip(1.0 - ratio**2, min=eps)
    return jnp.where(mask, jnp.exp(exponent), 0.0)


def _switch_component(x: jax.Array) -> jax.Array:
    """exp(-1/x) for x > 0, else 0 — building block of the smooth switch."""
    x_safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.exp(-1.0 / x_safe), 0.0)


def switch_function(d: jax.Array, switch_on: float, switch_off: float) -> jax.Array:
    """Smooth 1 -> 0 transition between ``switch_on`` and ``switch_off``.

    Equals 1 for d <= switch_on and 0 for d >= switch_off, with all
    derivatives continuous (exponential bump construction).
    """
    x = (d - switch_on) / (switch_off - switch_on)
    fp = _switch_component(x)
    fm = _switch_component(1.0 - x)
    out = jnp.where(x <= 0, 1.0, jnp.where(x >= 1, 0.0, fm / (fp + fm + 1e-30)))
    return out
