"""Ring-polymer normal-mode transformation.

Parity: ``src/schnetpack/md/utils/normal_model_transformation.py:8-98``.
The bead <-> normal-mode transform is an orthogonal [P, P] matrix applied
along the replica axis — one matmul on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normal_mode_matrix(n_beads: int) -> np.ndarray:
    """Orthogonal C with (C x)_k = normal mode k of bead vector x."""
    P = n_beads
    C = np.zeros((P, P))
    j = np.arange(P)
    C[0, :] = np.sqrt(1.0 / P)
    for k in range(1, P // 2 + 1):
        if 2 * k == P:
            C[k, :] = np.sqrt(1.0 / P) * (-1.0) ** j
        else:
            C[k, :] = np.sqrt(2.0 / P) * np.cos(2 * np.pi * k * j / P)
    for k in range(P // 2 + 1, P):
        C[k, :] = np.sqrt(2.0 / P) * np.sin(2 * np.pi * (P - k) * j / P)
    return C


def normal_mode_frequencies(n_beads: int, omega_P: float) -> np.ndarray:
    """omega_k = 2 omega_P sin(k pi / P) in the standard NM ordering."""
    P = n_beads
    k = np.arange(P)
    # map row index of normal_mode_matrix to its mode number
    mode = np.where(k <= P // 2, k, P - k)
    return 2.0 * omega_P * np.sin(mode * np.pi / P)


class NormalModeTransformer:
    def __init__(self, n_beads: int):
        self.n_beads = n_beads
        self.c = jnp.asarray(normal_mode_matrix(n_beads))

    def beads2normal(self, x):
        """[P, A, 3] -> [P, A, 3] in normal-mode space."""
        return jnp.einsum("kp,p...->k...", self.c, x)

    def normal2beads(self, x):
        return jnp.einsum("pk,k...->p...", self.c.T, x)
