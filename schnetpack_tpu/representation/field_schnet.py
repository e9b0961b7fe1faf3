"""FieldSchNet: SchNet augmented with external-field-coupled dipole features.

Parity: ``src/schnetpack/representation/field_schnet.py`` — per external
field (electric/magnetic) each atom carries dipole features ``mu [A,3,F]``;
per interaction block the scalar features receive (i) the usual cfconv
update (:19-70 analog), (ii) field-dipole couplings ``mu . E``
(FieldSchNetFieldInteraction, :19-70), (iii) dipole-dipole terms via the
T-tensor (DipoleInteraction, :131-223); dipole features are updated from
neighbor scalars along pair directions (DipoleUpdate, :73-130).  A
NuclearMagneticMomentEmbedding (:224-247) couples nuclear moments for
shielding calculations.

The energy thus depends on the injected external fields, which makes the
response engine's ``dE/dF`` dipoles and ``d2E/dF2`` polarizabilities
non-trivial.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import properties
from ..nn.base import Dense
from ..nn.cutoff import CosineCutoff
from ..nn.radial import GaussianRBF
from ..ops.activations import shifted_softplus
from ..ops.math import safe_norm
from ..ops.scatter import segment_sum
from .schnet import SchNetInteraction


class FieldInteraction(nn.Module):
    """Delta q = W(mu . F) summed over fields (field_schnet.py:19-70)."""

    n_atom_basis: int

    @nn.compact
    def __call__(self, mu: Dict[str, jax.Array], fields: Dict[str, jax.Array]) -> jax.Array:
        dq = 0.0
        for name, field_atom in fields.items():
            # field_atom: [A, 3]; mu[name]: [A, 3, F]
            proj = jnp.sum(mu[name] * field_atom[:, :, None], axis=1)  # [A, F]
            dq = dq + Dense(self.n_atom_basis, use_bias=False, name=f"w_{name}")(proj)
        return dq


class DipoleUpdate(nn.Module):
    """mu_i += sum_j W(f_ij) x_j dir_ij (field_schnet.py:73-130)."""

    n_atom_basis: int
    field: str

    @nn.compact
    def __call__(self, q, mu_k, f_ij, dir_ij, cutoff_ij, idx_i, idx_j,
                 nbh_idx=None):
        A = q.shape[0]
        W = Dense(self.n_atom_basis, use_bias=False, name="filter")(f_ij)
        W = W * cutoff_ij[..., None]
        if nbh_idx is not None:
            qj = jnp.take(q, nbh_idx, axis=0)               # [A, K, F]
            msg = (W * qj)[:, :, None, :] * dir_ij[..., None]  # [A, K, 3, F]
            return mu_k + jnp.sum(msg, axis=1)
        qj = jnp.take(q, idx_j, axis=0)  # [P, F]
        msg = (W * qj)[:, None, :] * dir_ij[:, :, None]  # [P, 3, F]
        return mu_k + segment_sum(msg, idx_i, A)


class DipoleInteraction(nn.Module):
    """Dipole-dipole contribution via the dipole field tensor
    T = (3 r r^T - 1 d^2)/d^5 (field_schnet.py:131-223)."""

    n_atom_basis: int
    field: str

    @nn.compact
    def __call__(self, mu_k, f_ij, d_ij, dir_ij, cutoff_ij, idx_i, idx_j,
                 nbh_idx=None):
        A = mu_k.shape[0]
        W = Dense(self.n_atom_basis, name="filter")(f_ij) * cutoff_ij[..., None]
        d3 = jnp.maximum(d_ij, 1e-6) ** 3
        if nbh_idx is not None:
            muj = jnp.take(mu_k, nbh_idx, axis=0)           # [A, K, 3, F]
            proj = jnp.sum(muj * dir_ij[..., None], axis=2)  # [A, K, F]
            field_term = (
                3.0 * proj[:, :, None, :] * dir_ij[..., None] - muj
            ) / d3[..., None, None]
            return jnp.sum(field_term * W[:, :, None, :], axis=1)
        muj = jnp.take(mu_k, idx_j, axis=0)  # [P, 3, F]
        proj = jnp.sum(muj * dir_ij[:, :, None], axis=1)  # [P, F]
        field_term = (3.0 * proj[:, None, :] * dir_ij[:, :, None] - muj) / d3[:, None, None]
        contrib = segment_sum(field_term * W[:, None, :], idx_i, A)  # [A, 3, F]
        return contrib


class NuclearMagneticMomentEmbedding(nn.Module):
    """Couples nuclear magnetic moments into the magnetic dipole features
    (field_schnet.py:224-247)."""

    n_atom_basis: int
    max_z: int = 100

    @nn.compact
    def __call__(self, Z, nmm):
        gamma = nn.Embed(self.max_z + 1, 1, name="gyromagnetic")(Z)  # [A, 1]
        delta = Dense(self.n_atom_basis, use_bias=False, name="delta")(gamma)  # [A, F]
        return delta[:, None, :] * nmm[:, :, None]  # [A, 3, F]


class FieldSchNet(nn.Module):
    """Field-coupled SchNet (field_schnet.py:249-438)."""

    n_atom_basis: int = 128
    n_interactions: int = 3
    n_rbf: int = 20
    cutoff: float = 5.0
    max_z: int = 100
    external_fields: Sequence[str] = (properties.electric_field,)
    response_properties: Optional[Sequence[str]] = None
    radial_basis: Optional[nn.Module] = None
    cutoff_fn: Optional[nn.Module] = None
    activation: Callable = shifted_softplus

    @nn.compact
    def __call__(self, inputs):
        fields = list(self.external_fields)
        if self.response_properties is not None:
            for p in self.response_properties:
                for f in properties.required_external_fields.get(p, []):
                    if f not in fields:
                        fields.append(f)

        Z = inputs[properties.Z]
        Rij = inputs[properties.Rij]
        idx_i = inputs[properties.idx_i]
        idx_j = inputs[properties.idx_j]
        idx_m = inputs[properties.idx_m]
        pair_mask = inputs[properties.pair_mask]
        F = self.n_atom_basis
        radial = self.radial_basis or GaussianRBF(n_rbf=self.n_rbf, cutoff=self.cutoff)
        cutoff_fn = self.cutoff_fn or CosineCutoff(cutoff=self.cutoff)
        nbh_idx = None
        if properties.nbh_rij in inputs and idx_i.shape[0] <= 1:
            # dense [A, K] MD layout (the flat list carries no real pairs)
            Rij = inputs[properties.nbh_rij]
            nbh_idx = inputs[properties.nbh_idx]
            nbh_mask = inputs[properties.nbh_mask]
            d_ij = safe_norm(Rij, axis=-1)                  # [A, K]
            dir_ij = Rij / d_ij[..., None]
            f_ij = radial(d_ij)
            rcut_ij = cutoff_fn(d_ij) * nbh_mask
            idx_i = idx_j = None
        else:
            d_ij = safe_norm(Rij, axis=-1)
            dir_ij = Rij / d_ij[:, None]
            f_ij = radial(d_ij)
            rcut_ij = cutoff_fn(d_ij) * pair_mask

        q = nn.Embed(self.max_z + 1, F, name="embedding")(Z)

        # per-field atomic positions of the field (expand molecule fields)
        field_atoms = {}
        M = inputs[properties.n_atoms].shape[0]
        for f in fields:
            v = inputs.get(f)
            if v is None:
                v = jnp.zeros((M, 3), q.dtype)
            field_atoms[f] = jnp.take(v, idx_m, axis=0)  # [A, 3]

        mu = {f: jnp.zeros((q.shape[0], 3, F), q.dtype) for f in fields}
        if (
            properties.magnetic_field in fields
            and properties.nuclear_magnetic_moments in inputs
        ):
            mu[properties.magnetic_field] = mu[properties.magnetic_field] + (
                NuclearMagneticMomentEmbedding(F, self.max_z, name="nmm_embedding")(
                    Z, inputs[properties.nuclear_magnetic_moments]
                )
            )

        for t in range(self.n_interactions):
            dq = SchNetInteraction(F, F, self.activation, name=f"interaction_{t}")(
                q, f_ij, rcut_ij, idx_i, idx_j, nbh_idx=nbh_idx
            )
            dq = dq + FieldInteraction(F, name=f"field_inter_{t}")(mu, field_atoms)
            for f in fields:
                tag = f.strip("_")
                dmu = DipoleInteraction(F, f, name=f"dipole_inter_{t}_{tag}")(
                    mu[f], f_ij, d_ij, dir_ij, rcut_ij, idx_i, idx_j,
                    nbh_idx=nbh_idx
                )
                # dipole-dipole feeds back into scalars via the local field
                dq = dq + Dense(F, use_bias=False, name=f"dd2q_{t}_{tag}")(
                    jnp.sum(dmu * mu[f], axis=1)
                )
                mu[f] = DipoleUpdate(F, f, name=f"dipole_update_{t}_{tag}")(
                    q, mu[f] + dmu, f_ij, dir_ij, rcut_ij, idx_i, idx_j,
                    nbh_idx=nbh_idx
                )
            q = q + dq

        inputs[properties.scalar_representation] = q
        return inputs
