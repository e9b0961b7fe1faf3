"""Radial basis modules (parity: ``src/schnetpack/nn/radial.py:18-110``)."""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import radial as radial_ops


class GaussianRBF(nn.Module):
    n_rbf: int
    cutoff: float
    start: float = 0.0
    trainable: bool = False

    @nn.compact
    def __call__(self, d: jax.Array, return_params: bool = False):
        """Expand distances; with ``return_params`` return the
        (centers, widths) arrays instead (same flax params, same scope)
        — used by the column fast path, which evaluates the RBF inside
        its fused geometry rather than on a distance tensor."""
        centers0, widths0 = radial_ops.gaussian_rbf_params(self.n_rbf, self.cutoff, self.start)
        if self.trainable:
            centers = self.param("centers", lambda rng: jnp.asarray(centers0))
            widths = self.param("widths", lambda rng: jnp.asarray(widths0))
        else:
            centers, widths = jnp.asarray(centers0), jnp.asarray(widths0)
        if return_params:
            return centers, widths
        return radial_ops.gaussian_rbf(d, centers, widths)


class GaussianRBFCentered(nn.Module):
    n_rbf: int
    cutoff: float
    start: float = 1.0
    trainable: bool = False

    @nn.compact
    def __call__(self, d: jax.Array) -> jax.Array:
        centers0, widths0 = radial_ops.gaussian_rbf_centered_params(
            self.n_rbf, self.cutoff, self.start
        )
        if self.trainable:
            centers = self.param("centers", lambda rng: jnp.asarray(centers0))
            widths = self.param("widths", lambda rng: jnp.asarray(widths0))
        else:
            centers, widths = jnp.asarray(centers0), jnp.asarray(widths0)
        return radial_ops.gaussian_rbf(d, centers, widths)


class BesselRBF(nn.Module):
    n_rbf: int
    cutoff: float

    @nn.compact
    def __call__(self, d: jax.Array) -> jax.Array:
        freqs = jnp.asarray(radial_ops.bessel_rbf_params(self.n_rbf, self.cutoff))
        return radial_ops.bessel_rbf(d, freqs)


_RADIAL = {"gaussian": GaussianRBF, "gaussian_centered": GaussianRBFCentered, "bessel": BesselRBF}


def make_radial_basis(kind: str, n_rbf: int, cutoff: float, **kwargs) -> nn.Module:
    return _RADIAL[kind](n_rbf=n_rbf, cutoff=cutoff, **kwargs)
