"""Output heads predicting atomwise contributions and tensorial moments.

Parity: ``src/schnetpack/atomistic/atomwise.py`` (Atomwise, DipoleMoment,
Polarizability).  All heads are mask-aware: padded atoms contribute exactly
zero, padded molecules are aggregated into the throwaway last segment.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import properties
from ..nn.base import MLP
from ..nn.equivariant import build_gated_equivariant_mlp
from ..ops.activations import shifted_softplus
from ..ops.math import safe_norm
from ..ops.scatter import segment_sum


class Atomwise(nn.Module):
    """Per-atom MLP + masked segment aggregation -> global property
    (parity: atomwise.py:14-88)."""

    output_key: str = properties.energy
    n_out: int = 1
    n_layers: int = 2
    n_hidden: Optional[Sequence[int]] = None
    activation: Callable = shifted_softplus
    aggregation_mode: Optional[str] = "sum"  # sum | avg | None (per-atom)
    per_atom_output_key: Optional[str] = None

    @nn.compact
    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        x = inputs[properties.scalar_representation]
        idx_m = inputs[properties.idx_m]
        atom_mask = inputs[properties.atom_mask]
        M = inputs[properties.n_atoms].shape[0]

        y = MLP(
            n_out=self.n_out,
            hidden=self.n_hidden,
            n_layers=self.n_layers,
            activation=self.activation,
            name="outnet",
        )(x)
        y = y * atom_mask[:, None]
        if self.n_out == 1:
            y = jnp.squeeze(y, -1)

        if self.per_atom_output_key is not None:
            inputs[self.per_atom_output_key] = y

        if self.aggregation_mode is not None:
            agg = segment_sum(y, idx_m, M)
            if self.aggregation_mode == "avg":
                n = jnp.maximum(inputs[properties.n_atoms].astype(agg.dtype), 1.0)
                agg = agg / (n if agg.ndim == 1 else n[:, None])
            inputs[self.output_key] = agg
        else:
            inputs[self.output_key] = y
        return inputs


class DipoleMoment(nn.Module):
    """Latent-partial-charge dipole head (parity: atomwise.py:91-213).

    mu = sum_i q_i r_i (+ atomic dipoles from the vector representation).
    Charges are corrected so their per-molecule sum matches the total charge.
    """

    dipole_key: str = properties.dipole_moment
    charges_key: str = properties.partial_charges
    n_hidden: Optional[Sequence[int]] = None
    n_layers: int = 2
    activation: Callable = shifted_softplus
    predict_magnitude: bool = False
    use_vector_representation: bool = False
    correct_charges: bool = True

    @nn.compact
    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        s = inputs[properties.scalar_representation]
        R = inputs[properties.R]
        idx_m = inputs[properties.idx_m]
        atom_mask = inputs[properties.atom_mask]
        M = inputs[properties.n_atoms].shape[0]
        natoms = jnp.maximum(inputs[properties.n_atoms].astype(s.dtype), 1.0)

        atomic_dipoles = 0.0
        if self.use_vector_representation:
            v = inputs[properties.vector_representation]  # [A, 3, F]
            q, mu = build_gated_equivariant_mlp(
                n_in=s.shape[-1], n_out=1, n_layers=self.n_layers,
                activation=self.activation,
            )(s, v)
            q = jnp.squeeze(q, -1)
            atomic_dipoles = jnp.squeeze(mu, -1) * atom_mask[:, None]
        else:
            q = jnp.squeeze(
                MLP(n_out=1, hidden=self.n_hidden, n_layers=self.n_layers,
                    activation=self.activation, name="charge_net")(s),
                -1,
            )

        q = q * atom_mask
        if self.correct_charges:
            total = inputs.get(properties.total_charge, jnp.zeros(M, q.dtype))
            qsum = segment_sum(q, idx_m, M)
            correction = (total - qsum) / natoms
            q = (q + jnp.take(correction, idx_m, axis=0)) * atom_mask

        inputs[self.charges_key] = q
        y = segment_sum(q[:, None] * R + atomic_dipoles, idx_m, M)
        if self.predict_magnitude:
            y = safe_norm(y, axis=-1)
        inputs[self.dipole_key] = y
        return inputs


class Polarizability(nn.Module):
    """Tensor-rank-factorized polarizability (parity: atomwise.py:216-293).

    alpha = sum_i [ alpha_iso_i * I + mu_i r_i^T + r_i mu_i^T ].
    Requires the vector representation (PaiNN-style).
    """

    polar_key: str = properties.polarizability
    activation: Callable = shifted_softplus
    n_layers: int = 2

    @nn.compact
    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        s = inputs[properties.scalar_representation]
        v = inputs[properties.vector_representation]
        R = inputs[properties.R]
        idx_m = inputs[properties.idx_m]
        atom_mask = inputs[properties.atom_mask]
        M = inputs[properties.n_atoms].shape[0]

        alpha_iso, mu = build_gated_equivariant_mlp(
            n_in=s.shape[-1], n_out=1, n_layers=self.n_layers,
            activation=self.activation,
        )(s, v)
        alpha_iso = jnp.squeeze(alpha_iso, -1) * atom_mask      # [A]
        mu = jnp.squeeze(mu, -1) * atom_mask[:, None]           # [A, 3]

        eye = jnp.eye(3, dtype=s.dtype)
        iso = alpha_iso[:, None, None] * eye[None]
        aniso = mu[:, :, None] * R[:, None, :]
        aniso = aniso + jnp.swapaxes(aniso, 1, 2)
        inputs[self.polar_key] = segment_sum(iso + aniso, idx_m, M)
        return inputs


class Aggregation(nn.Module):
    """Sum several predicted contributions into one key
    (parity: ``atomistic/aggregation.py:9-28``)."""

    keys: Sequence[str]
    output_key: str = properties.energy

    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        total = 0.0
        for k in self.keys:
            total = total + inputs[k]
        inputs[self.output_key] = total
        return inputs
