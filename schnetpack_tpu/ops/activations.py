"""Activation functions (parity: ``src/schnetpack/nn/activations.py``)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG2 = math.log(2.0)


def shifted_softplus(x: jax.Array) -> jax.Array:
    """softplus(x) - ln(2); zero-centered at x=0 (SchNet's ssp)."""
    return jax.nn.softplus(x) - _LOG2


def softplus_inverse(x: jax.Array) -> jax.Array:
    """Inverse of softplus: x + log(-expm1(-x))."""
    return x + jnp.log(-jnp.expm1(-x))


def parametric_shifted_softplus(
    x: jax.Array, alpha: jax.Array, beta: jax.Array
) -> jax.Array:
    """Learnable shifted softplus: alpha * (softplus(beta x) - ln 2).

    Reduces to ``alpha * x/2`` in the beta -> 0 limit (handled explicitly so
    gradients stay finite).
    """
    eps = 1e-8
    beta_safe = jnp.where(jnp.abs(beta) < eps, 1.0, beta)
    y = alpha * (jax.nn.softplus(beta_safe * x) - _LOG2) / beta_safe
    lin = alpha * x / 2.0
    return jnp.where(jnp.abs(beta) < eps, lin, y)
