"""SO(3)-equivariant NN layers.

Parity: ``src/schnetpack/nn/so3.py`` — RealSphericalHarmonics, SO3TensorProduct,
SO3Convolution, SO3ParametricGatedNonlinearity, SO3GatedNonlinearity.

Feature layout: ``[A, (lmax+1)^2, F]``; the CG coupling is a dense einsum
with the precomputed real-basis tensor (small, fully fused by XLA).
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import so3 as so3_ops
from ..ops.activations import shifted_softplus
from ..ops.scatter import segment_sum
from .base import Dense


class RealSphericalHarmonics(nn.Module):
    lmax: int

    def __call__(self, directions: jax.Array) -> jax.Array:
        return so3_ops.real_spherical_harmonics(directions, self.lmax)


class SO3TensorProduct(nn.Module):
    """y = CG(x1, x2) elementwise over atoms/features (so3.py:177-219)."""

    lmax: int

    def __call__(self, x1: jax.Array, x2: jax.Array) -> jax.Array:
        cg = so3_ops.cg_dense(self.lmax, x1.dtype)
        return so3_ops.so3_tensor_product(x1, x2, cg)


class SO3Convolution(nn.Module):
    """Pairwise CG convolution (so3.py:221-307).

    msg_p = W_l(d_p) * CG( x[idx_j_p], Y(dir_p) );  x'_i = sum_p msg_p.
    Radial filters are per output degree l, broadcast over m.
    """

    lmax: int
    n_atom_basis: int
    n_radial: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,        # [A, n_lm, F]
        radial_ij: jax.Array,  # [P, n_radial] or dense [A, K, n_radial]
        dir_ij: jax.Array,     # [P, 3] or [A, K, 3]
        cutoff_ij: jax.Array,  # [P] / [A, K] (mask folded in)
        idx_i: jax.Array = None,
        idx_j: jax.Array = None,
        nbh_idx: jax.Array = None,
        nbh_rev: jax.Array = None,
        nbh_mask: jax.Array = None,
        col_refs=None,
    ) -> jax.Array:
        A = x.shape[0]
        F = self.n_atom_basis
        n_lm = (self.lmax + 1) ** 2

        ylm = so3_ops.real_spherical_harmonics(dir_ij, self.lmax)  # [.., n_lm]
        cg = so3_ops.cg_dense(self.lmax, x.dtype)

        # radial filter indexed by the FILTER degree l(s1) — the Ylm slot of
        # the CG product, exactly the reference's Widx = lidx[idx_in_1]
        # (so3.py:229,250-251): y_s = sum C[s1,s2,s] (W_l(s1) Y_s1) x_s2
        Wl = Dense((self.lmax + 1) * F, name="filternet")(radial_ij)
        Wl = Wl.reshape(Wl.shape[:-1] + (self.lmax + 1, F)) * cutoff_ij[..., None, None]
        deg = jnp.asarray(so3_ops.degree_index(self.lmax))
        WY = jnp.take(Wl, deg, axis=-2) * ylm[..., None]  # [.., n_lm, F]

        if col_refs is not None:
            # column layout: one-hot MXU gather/fold over the flattened
            # [A, n_lm*F] table; CG contraction stays per-edge XLA
            from ..ops.colblock import column_fold, column_gather

            nx, ny, Ktot = WY.shape[:3]
            xj = column_gather(x.reshape(A, n_lm * F), col_refs)
            xj = xj.reshape(nx, ny, Ktot, n_lm, F)
            msg = jnp.einsum("pqr,xykpf,xykqf->xykrf", cg, WY, xj)
            out = column_fold(msg.reshape(nx, ny, Ktot, n_lm * F), col_refs)
            return out.reshape(A, n_lm, F)

        if nbh_idx is not None:
            from ..ops.neighbor_gather import neighbor_gather

            if nbh_rev is not None:
                xj = neighbor_gather(x, nbh_idx, nbh_rev, nbh_mask)  # [A,K,n_lm,F]
            else:
                xj = jnp.take(x, nbh_idx, axis=0)
            msg = jnp.einsum("pqr,akpf,akqf->akrf", cg, WY, xj)
            return jnp.sum(msg, axis=1)

        xj = jnp.take(x, idx_j, axis=0)  # [P, n_lm, F]
        msg = jnp.einsum("pqr,apf,aqf->arf", cg, WY, xj)
        return segment_sum(msg, idx_i, A)


class SO3ParametricGatedNonlinearity(nn.Module):
    """x_lm <- x_lm * sigmoid(W x_00) (so3.py:310-334)."""

    n_in: int
    lmax: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s0 = x[:, 0, :]
        h = Dense((self.lmax + 1) * self.n_in, name="scaling")(s0)
        h = h.reshape(-1, self.lmax + 1, self.n_in)
        deg = jnp.asarray(so3_ops.degree_index(self.lmax))
        gate = jax.nn.sigmoid(jnp.take(h, deg, axis=1))
        return x * gate


class SO3GatedNonlinearity(nn.Module):
    """Non-parametric gate by the scalar channel (so3.py:337-357)."""

    lmax: int

    def __call__(self, x: jax.Array) -> jax.Array:
        s0 = x[:, 0:1, :]
        return x * jax.nn.sigmoid(s0)
