"""Scatter-free neighbor gather (custom VJP over symmetric pair lists).

The VJP of ``x[nbh]`` is a scatter-add — the slowest memory op on TPU.
For *full* (bidirectional) neighbor lists every directed edge (i -> j) has
a reverse edge (j -> i), so the cotangent accumulation

    dx[j] = sum over edges (i,k) with nbh[i,k] == j of g[i,k]

can be rewritten as a **gather over the reverse-edge map**:

    dx[j] = sum_k g_flat[rev_flat[j, k]]          (masked)

where ``rev_flat[j,k]`` is the flattened dense index of the reverse of
j's k-th edge.  Both forward and backward become pure gathers + K-axis
reductions; no scatter appears anywhere in the training/MD hot path.

``build_reverse_map`` constructs ``rev_flat`` on the host at collate time.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def neighbor_gather(x: jax.Array, nbh: jax.Array, rev_flat: jax.Array, mask: jax.Array):
    """y[a, k, ...] = x[nbh[a, k], ...].

    ``rev_flat`` [A, K] int32: flat index (a*K + slot) of each edge's
    reverse edge; ``mask`` [A, K]: 1 for real edges.
    """
    return jnp.take(x, nbh, axis=0)


def _fwd(x, nbh, rev_flat, mask):
    return neighbor_gather(x, nbh, rev_flat, mask), (rev_flat, mask, x.shape)


def _bwd(res, g):
    rev_flat, mask, x_shape = res
    A, K = rev_flat.shape
    g_flat = g.reshape((A * K,) + g.shape[2:])
    picked = jnp.take(g_flat, rev_flat.reshape(-1), axis=0)
    picked = picked.reshape((A, K) + g.shape[2:])
    m = mask.reshape((A, K) + (1,) * (g.ndim - 2))
    dx = jnp.sum(picked * m, axis=1)
    return dx, None, None, None


neighbor_gather.defvjp(_fwd, _bwd)


def build_reverse_map(
    idx_i: np.ndarray,
    idx_j: np.ndarray,
    offsets: np.ndarray,
    slots: np.ndarray,
    n_atoms: int,
    n_neighbors: int,
) -> np.ndarray:
    """Host-side reverse-edge map for a full (symmetric) pair list.

    Arguments describe the *valid* edges: center ``idx_i``, neighbor
    ``idx_j``, Cartesian ``offsets`` and the dense slot of each edge.
    Returns rev_flat [A, K] int32 (padded slots point to edge 0 — their
    mask is 0 so the contribution vanishes).
    """
    E = len(idx_i)
    rev_flat = np.zeros((n_atoms, n_neighbors), dtype=np.int32)
    if E == 0:
        return rev_flat
    off_q = np.round(np.asarray(offsets, np.float64), 5)
    key_self = np.stack(
        [idx_i, idx_j, off_q[:, 0], off_q[:, 1], off_q[:, 2]], axis=1
    )
    key_rev = np.stack(
        [idx_j, idx_i, -off_q[:, 0], -off_q[:, 1], -off_q[:, 2]], axis=1
    )
    order_self = np.lexsort(key_self.T[::-1])
    order_rev = np.lexsort(key_rev.T[::-1])
    if not np.allclose(key_self[order_self], key_rev[order_rev]):
        raise ValueError("pair list is not symmetric; cannot build reverse map")
    rev = np.empty(E, dtype=np.int64)
    rev[order_rev] = order_self  # rev[e] = e' with key_self[e'] == key_rev[e]
    dense_pos = idx_i.astype(np.int64) * n_neighbors + slots
    rev_flat[idx_i, slots] = dense_pos[rev].astype(np.int32)
    return rev_flat
