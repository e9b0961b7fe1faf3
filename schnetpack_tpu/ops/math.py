"""Small math helpers used across the framework."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_norm(x: jax.Array, axis: int = -1, keepdims: bool = False, eps: float = 1e-15) -> jax.Array:
    """L2 norm with finite gradient at 0 (grad -> 0 instead of NaN)."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps))


def safe_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-15) -> jax.Array:
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)


def binom(n: jax.Array, k: jax.Array) -> jax.Array:
    """Binomial coefficient via lgamma (parity: nn/ops/math.py)."""
    return jnp.exp(
        jax.lax.lgamma(n + 1.0) - jax.lax.lgamma(k + 1.0) - jax.lax.lgamma(n - k + 1.0)
    )


def stable_sinh_div(x: jax.Array, eps: float = 1e-4) -> jax.Array:
    """sinh(x)/x with the x->0 limit handled (parity: md/utils StableSinhDiv)."""
    x_safe = jnp.where(jnp.abs(x) < eps, 1.0, x)
    return jnp.where(jnp.abs(x) < eps, 1.0 + x * x / 6.0, jnp.sinh(x_safe) / x_safe)
