"""Ziegler-Biersack-Littmark screened nuclear repulsion.

Parity: ``src/schnetpack/atomistic/nuclear_repulsion.py:13-108`` — trainable
softplus-parameterized screening coefficients/exponents, pairwise
exponential screening times Z_i Z_j / d, smoothly cut off.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import properties
from ..nn.cutoff import CosineCutoff
from ..ops.activations import softplus_inverse
from ..ops.math import safe_norm
from ..ops.scatter import segment_sum
from ..units import Bohr
from ..units import ke as KE_ASE

# universal ZBL parameters (Ziegler–Biersack–Littmark 1985)
_ZBL_COEFFS = np.array([0.18175, 0.50986, 0.28022, 0.02817])
_ZBL_EXPONENTS = np.array([3.19980, 0.94229, 0.40290, 0.20162])
_ZBL_APOW = 0.23
_ZBL_ADIV = 1.0 / (0.8854 * Bohr)  # a = 0.8854 a0 / (Zi^0.23 + Zj^0.23)


class ZBLRepulsionEnergy(nn.Module):
    """Trainable ZBL repulsion (parity: nuclear_repulsion.py:13-108)."""

    energy_unit: float = 1.0
    output_key: str = "energy_zbl"
    trainable: bool = True
    cutoff_fn: nn.Module = None
    cutoff: float = 5.0

    @nn.compact
    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        Z = inputs[properties.Z].astype(jnp.float32)
        idx_i = inputs[properties.idx_i]
        idx_j = inputs[properties.idx_j]
        Rij = inputs[properties.Rij]
        pair_mask = inputs[properties.pair_mask]
        idx_m = inputs[properties.idx_m]
        M = inputs[properties.n_atoms].shape[0]
        A = Z.shape[0]

        def make(name, init_vals):
            raw0 = softplus_inverse(jnp.asarray(init_vals, jnp.float32))
            if self.trainable:
                raw = self.param(name, lambda rng: raw0)
            else:
                raw = raw0
            return jax.nn.softplus(raw)

        coeffs = make("coefficients", _ZBL_COEFFS)
        coeffs = coeffs / jnp.sum(coeffs)  # keep sum = 1 (exact 1/r at d->0)
        expons = make("exponents", _ZBL_EXPONENTS)
        apow = make("a_pow", jnp.array([_ZBL_APOW]))[0]
        adiv = make("a_div", jnp.array([_ZBL_ADIV]))[0]

        d = safe_norm(Rij, axis=-1)
        zi = jnp.take(Z, idx_i, axis=0)
        zj = jnp.take(Z, idx_j, axis=0)
        a = (zi**apow + zj**apow) * adiv  # inverse screening length [1/Ang]
        x = d * a
        phi = jnp.sum(
            coeffs[None, :] * jnp.exp(-x[:, None] * expons[None, :]), axis=-1
        )

        cutoff_fn = self.cutoff_fn or CosineCutoff(cutoff=self.cutoff)
        fcut = cutoff_fn(d) * pair_mask
        # factor 1/2: full bidirectional pair list
        e_pair = 0.5 * KE_ASE * self.energy_unit * zi * zj / jnp.maximum(d, 1e-10)
        e_pair = e_pair * phi * fcut
        e_atom = segment_sum(e_pair, idx_i, A)
        inputs[self.output_key] = segment_sum(e_atom, idx_m, M)
        return inputs
