"""SO(3) machinery: real spherical harmonics and Clebsch-Gordan coupling.

Parity: ``src/schnetpack/nn/so3.py`` + ``src/schnetpack/nn/ops/so3.py`` —
the reference generates Ylm coefficients and sparsified CG tables with
sympy at module construction.  Here the same symbolic generation happens
once on the host (cached per lmax); evaluation on device is a dense
polynomial contraction / small einsum, which XLA fuses cleanly (no sparse
gather/scatter in the hot path).

Conventions: real spherical harmonics in the (racah) normalization used by
the reference, flattened index ``lm = l^2 + l + m``; CG tensor entries are
the real-basis coupling coefficients.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def real_spherical_harmonics(directions: jax.Array, lmax: int) -> jax.Array:
    """Y_lm of unit vectors: [..., 3] -> [..., (lmax+1)^2].

    Built from the standard stable recurrences: sectoral sin/cos multiples
    c_m = Re[(x+iy)^m], s_m = Im[(x+iy)^m] and the associated-Legendre
    recurrence with the sin(theta)^m factor absorbed — all as a static
    Python loop over l,m, so XLA sees a flat chain of fused elementwise ops.
    """
    from math import factorial, pi, sqrt

    x = directions[..., 0]
    y = directions[..., 1]
    z = directions[..., 2]

    # sectoral factors: c[m] = sin^m(theta) cos(m phi), s[m] = ... sin(m phi)
    c = [jnp.ones_like(x)]
    s = [jnp.zeros_like(x)]
    for m in range(1, lmax + 1):
        c.append(x * c[m - 1] - y * s[m - 1])
        s.append(x * s[m - 1] + y * c[m - 1])

    # Pbar[l][m]: associated Legendre P_l^m(cos t) / sin^m t  (no C-S phase)
    pbar = [[None] * (lmax + 1) for _ in range(lmax + 1)]
    for m in range(lmax + 1):
        # double factorial (2m-1)!!
        dfac = 1.0
        for k in range(1, 2 * m, 2):
            dfac *= k
        pbar[m][m] = jnp.full_like(z, dfac)
        if m + 1 <= lmax:
            pbar[m + 1][m] = (2 * m + 1) * z * pbar[m][m]
        for l in range(m + 2, lmax + 1):
            pbar[l][m] = (
                (2 * l - 1) * z * pbar[l - 1][m] - (l + m - 1) * pbar[l - 2][m]
            ) / (l - m)

    out = []
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            K = sqrt((2 * l + 1) / (4.0 * pi) * factorial(l - am) / factorial(l + am))
            if m == 0:
                out.append(K * pbar[l][0])
            elif m > 0:
                out.append(sqrt(2.0) * K * pbar[l][am] * c[am])
            else:
                out.append(sqrt(2.0) * K * pbar[l][am] * s[am])
    return jnp.stack(out, axis=-1)


@functools.lru_cache(maxsize=8)
def _cg_dense_np(lmax: int, parity_invariance: bool = True) -> np.ndarray:
    """Dense real-basis CG tensor [n_lm, n_lm, n_lm]
    (parity: nn/ops/so3.py:10-137 generate_clebsch_gordan + sparsify).

    ``parity_invariance`` zeroes couplings with odd l1+l2+l3 (pseudotensor
    channels), matching the reference's default
    (``generate_clebsch_gordan_rsh(parity_invariance=True)``); the
    remaining blocks agree with the reference elementwise (verified in
    tests/test_so3_import.py), and the parity-even real CG is symmetric
    in its two input slots."""
    from sympy.physics.quantum.cg import CG as _CG

    n = (lmax + 1) ** 2

    # complex->real change of basis per l
    def u_matrix(l):
        dim = 2 * l + 1
        U = np.zeros((dim, dim), complex)  # rows: real m index, cols: complex m
        for m in range(-l, l + 1):
            i = m + l
            if m < 0:
                U[i, m + l] = 1j / np.sqrt(2)
                U[i, -m + l] = -1j * (-1) ** m / np.sqrt(2)
            elif m == 0:
                U[i, l] = 1.0
            else:
                U[i, -m + l] = 1 / np.sqrt(2)
                U[i, m + l] = (-1) ** m / np.sqrt(2)
        return U

    cg = np.zeros((n, n, n))
    for l1 in range(lmax + 1):
        for l2 in range(lmax + 1):
            for l3 in range(abs(l1 - l2), min(l1 + l2, lmax) + 1):
                # complex CG block
                blk = np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1))
                for m1 in range(-l1, l1 + 1):
                    for m2 in range(-l2, l2 + 1):
                        m3 = m1 + m2
                        if abs(m3) > l3:
                            continue
                        blk[m1 + l1, m2 + l2, m3 + l3] = float(
                            _CG(l1, m1, l2, m2, l3, m3).doit()
                        )
                U1, U2, U3 = u_matrix(l1), u_matrix(l2), u_matrix(l3)
                cplx = np.einsum(
                    "ai,bj,ck,ijk->abc", U1, U2, np.conj(U3), blk
                )
                # in the real basis the block is purely real (even l1+l2+l3)
                # or purely imaginary (odd); either part is the real-rep
                # intertwiner, the other vanishes.
                if np.abs(cplx.imag).max() > np.abs(cplx.real).max():
                    real_blk = cplx.imag
                else:
                    real_blk = cplx.real
                if parity_invariance and (l1 + l2 + l3) % 2 == 1:
                    continue
                o1, o2, o3 = l1 * l1, l2 * l2, l3 * l3
                cg[
                    o1: o1 + 2 * l1 + 1,
                    o2: o2 + 2 * l2 + 1,
                    o3: o3 + 2 * l3 + 1,
                ] += real_blk
    return cg


def cg_dense(lmax: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_cg_dense_np(lmax), dtype)


def scalar2rsh(x: jax.Array, lmax: int) -> jax.Array:
    """Pad scalar features [A, F] (or [A, 1, F]) to [A, (lmax+1)^2, F] with
    zeros in the l>0 channels (parity: nn/so3.py:152-174)."""
    if x.ndim == 2:
        x = x[:, None, :]
    n_lm = (lmax + 1) ** 2
    pad = n_lm - x.shape[1]
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


def so3_tensor_product(
    x1: jax.Array, x2: jax.Array, cg: jax.Array
) -> jax.Array:
    """Elementwise CG contraction of two [..., n_lm, F] feature fields."""
    return jnp.einsum("pqr,...pf,...qf->...rf", cg, x1, x2)


def degree_index(lmax: int) -> np.ndarray:
    """[(lmax+1)^2] array mapping lm -> l (for per-degree weights)."""
    out = []
    for l in range(lmax + 1):
        out += [l] * (2 * l + 1)
    return np.asarray(out, np.int32)
