"""Radial basis expansions (pure functions).

Parity targets: ``GaussianRBF`` / ``GaussianRBFCentered`` / ``BesselRBF``
(``src/schnetpack/nn/radial.py:18-110``).  Functions take precomputed
center/width parameters so the flax modules can make them trainable.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_rbf(d: jax.Array, centers: jax.Array, widths: jax.Array) -> jax.Array:
    """exp(-0.5 * ((d - mu)/sigma)^2) — d: [...], out: [..., n_rbf]."""
    coeff = -0.5 / jnp.square(widths)
    diff = d[..., None] - centers
    return jnp.exp(coeff * jnp.square(diff))


def gaussian_rbf_params(
    n_rbf: int, cutoff: float, start: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Evenly spaced centers on [start, cutoff]; width = center spacing."""
    centers = np.linspace(start, cutoff, n_rbf, dtype=np.float32)
    widths = np.full(
        n_rbf, np.abs(cutoff - start) / max(n_rbf - 1, 1), dtype=np.float32
    )
    return centers, widths


def gaussian_rbf_centered_params(
    n_rbf: int, cutoff: float, start: float = 1.0
) -> Tuple[np.ndarray, np.ndarray]:
    """All gaussians centered at zero with widths spanning [start, cutoff]."""
    widths = np.linspace(start, cutoff, n_rbf, dtype=np.float32)
    centers = np.zeros(n_rbf, dtype=np.float32)
    return centers, widths


def bessel_rbf(d: jax.Array, freqs: jax.Array) -> jax.Array:
    """DimeNet-style 0th-order spherical Bessel basis sin(n pi d/rc)/d.

    ``freqs`` = n*pi/rc for n = 1..n_rbf.  Safe at d == 0.
    """
    ax = d[..., None] * freqs
    sinax = jnp.sin(ax)
    norm = jnp.where(d == 0.0, 1.0, d)
    return sinax / norm[..., None]


def bessel_rbf_params(n_rbf: int, cutoff: float) -> np.ndarray:
    return (np.arange(1, n_rbf + 1, dtype=np.float32) * np.pi / cutoff)
