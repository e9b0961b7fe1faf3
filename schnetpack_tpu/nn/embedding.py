"""Nuclear and electronic embeddings.

Parity targets: ``NuclearEmbedding`` / ``ElectronicEmbedding``
(``src/schnetpack/nn/embedding.py:158-349``, SpookyNet-style).  Instead of a
hard-coded electron-configuration table, the ground-state configurations are
generated programmatically by Aufbau filling (with the standard d/s-exchange
exceptions), which covers Z = 0..118.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import shifted_softplus
from ..ops.scatter import segment_sum
from .base import Dense, ResidualMLP

# Madelung (n+l, n) ordering of subshells up to 7p — enough for Z <= 118.
_SUBSHELLS = [
    (1, "s"), (2, "s"), (2, "p"), (3, "s"), (3, "p"), (4, "s"), (3, "d"),
    (4, "p"), (5, "s"), (4, "d"), (5, "p"), (6, "s"), (4, "f"), (5, "d"),
    (6, "p"), (7, "s"), (5, "f"), (6, "d"), (7, "p"),
]
_L_CAP = {"s": 2, "p": 6, "d": 10, "f": 14}

# standard deviations from Aufbau: Z -> {(n, l): occupancy delta}
_AUFBAU_EXCEPTIONS: Dict[int, Dict[tuple, int]] = {
    24: {(4, "s"): -1, (3, "d"): +1},   # Cr
    29: {(4, "s"): -1, (3, "d"): +1},   # Cu
    41: {(5, "s"): -1, (4, "d"): +1},   # Nb
    42: {(5, "s"): -1, (4, "d"): +1},   # Mo
    44: {(5, "s"): -1, (4, "d"): +1},   # Ru
    45: {(5, "s"): -1, (4, "d"): +1},   # Rh
    46: {(5, "s"): -2, (4, "d"): +2},   # Pd
    47: {(5, "s"): -1, (4, "d"): +1},   # Ag
    57: {(4, "f"): -1, (5, "d"): +1},   # La
    58: {(4, "f"): -1, (5, "d"): +1},   # Ce
    64: {(4, "f"): -1, (5, "d"): +1},   # Gd
    78: {(6, "s"): -1, (5, "d"): +1},   # Pt
    79: {(6, "s"): -1, (5, "d"): +1},   # Au
    89: {(5, "f"): -1, (6, "d"): +1},   # Ac
    90: {(5, "f"): -2, (6, "d"): +2},   # Th
    91: {(5, "f"): -1, (6, "d"): +1},   # Pa
    92: {(5, "f"): -1, (6, "d"): +1},   # U
    93: {(5, "f"): -1, (6, "d"): +1},   # Np
    96: {(5, "f"): -1, (6, "d"): +1},   # Cm
}


def electron_config_matrix(max_z: int = 100) -> np.ndarray:
    """[max_z+1, 24] matrix: Z, subshell occupancies (19), valence s/p/d/f.

    Row 0 (padding atoms, Z=0) is all zeros.  Columns are normalized to
    [0, 1] by their maxima so the linear map sees O(1) features.
    """
    n_sub = len(_SUBSHELLS)
    mat = np.zeros((max_z + 1, 1 + n_sub + 4), dtype=np.float64)
    for z in range(1, max_z + 1):
        occ = {}
        remaining = z
        for (n, l) in _SUBSHELLS:
            fill = min(remaining, _L_CAP[l])
            occ[(n, l)] = fill
            remaining -= fill
            if remaining == 0:
                break
        for key, delta in _AUFBAU_EXCEPTIONS.get(z, {}).items():
            occ[key] = occ.get(key, 0) + delta
        mat[z, 0] = z
        for i, (n, l) in enumerate(_SUBSHELLS):
            mat[z, 1 + i] = occ.get((n, l), 0)
        # valence = electrons in the highest occupied principal shell (s, p)
        # plus the open d/f subshells below it
        n_max = max((n for (n, l), o in occ.items() if o > 0), default=0)
        vs = occ.get((n_max, "s"), 0)
        vp = occ.get((n_max, "p"), 0)
        vd = occ.get((n_max - 1, "d"), 0) if (occ.get((n_max - 1, "d"), 0) < 10) else 0
        vf = occ.get((n_max - 2, "f"), 0) if (occ.get((n_max - 2, "f"), 0) < 14) else 0
        mat[z, 1 + n_sub: 1 + n_sub + 4] = [vs, vp, vd, vf]
    col_max = mat.max(axis=0)
    col_max[col_max == 0] = 1.0
    return (mat / col_max).astype(np.float32)


class NuclearEmbedding(nn.Module):
    """Element embedding: learnable per-Z vector + linear map of the
    (frozen) electron-configuration descriptor."""

    n_features: int
    max_z: int = 100
    zero_init: bool = True

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        element_emb = self.param(
            "element_embedding",
            nn.initializers.zeros if self.zero_init else nn.initializers.normal(1.0),
            (self.max_z + 1, self.n_features),
        )
        config = jnp.asarray(electron_config_matrix(self.max_z))
        config_emb = Dense(self.n_features, use_bias=False, name="config_linear")(config)
        table = element_emb + config_emb
        return jnp.take(table, z, axis=0)


class ElectronicEmbedding(nn.Module):
    """Attention-style conditioning on total charge or spin multiplicity.

    Each atom receives a share of the molecular electronic attribute
    proportional to a nonnegative attention weight; positive and negative
    attributes use separate key/value parameters (``is_charged=True``) —
    parity with ``nn/embedding.py:239-349``.
    """

    n_features: int
    num_residual: int = 1
    is_charged: bool = True
    activation: Callable = shifted_softplus

    @nn.compact
    def __call__(
        self,
        x: jax.Array,          # [A, F] atom features
        attribute: jax.Array,  # [M] per-molecule charge / (multiplicity - 1)
        idx_m: jax.Array,      # [A]
        num_mol: int,
    ) -> jax.Array:
        F = self.n_features
        q = Dense(F, use_bias=False, name="query")(x)  # [A, F]
        k_pos = self.param("k_plus", nn.initializers.zeros, (F,))
        v_pos = self.param("v_plus", nn.initializers.zeros, (F,))
        if self.is_charged:
            k_neg = self.param("k_minus", nn.initializers.zeros, (F,))
            v_neg = self.param("v_minus", nn.initializers.zeros, (F,))
        else:
            k_neg, v_neg = k_pos, v_pos

        attr_atom = jnp.take(attribute, idx_m, axis=0)  # [A]
        pos = (attr_atom >= 0)[:, None]
        k = jnp.where(pos, k_pos, k_neg)
        v = jnp.where(pos, v_pos, v_neg)

        logits = jnp.sum(q * k, axis=-1) / jnp.sqrt(float(F))
        weights = jax.nn.softplus(logits)  # nonnegative attention
        denom = segment_sum(weights, idx_m, num_mol) + 1e-8
        share = weights / jnp.take(denom, idx_m, axis=0) * jnp.abs(attr_atom)
        e = share[:, None] * v
        return ResidualMLP(
            F, F, n_residual=self.num_residual, activation=self.activation,
            last_zero_init=True, name="resmlp",
        )(e)
