"""FieldSchNet: SchNet augmented with external-field-coupled dipole features.

Elementwise parity with ``src/schnetpack/representation/field_schnet.py``:
per external field (electric/magnetic) each atom carries dipole features
``mu [A, 3, F]``.  Per interaction block the scalar features receive
(i) the usual cfconv update (field_schnet.py:305-326 via SchNetInteraction),
(ii) field-dipole couplings through an activated Dense of ``mu . E``
(FieldSchNetFieldInteraction, :19-70), (iii) dipole-dipole terms through
the classical interaction tensor weighted by a zero-initialised filter MLP
(DipoleInteraction, :131-223).  Dipole features are updated from the
*scalar update* dq along the UNNORMALISED pair vectors (DipoleUpdate,
:73-130), with one initial update from the embeddings before the block
loop (:403).  A NuclearMagneticMomentEmbedding (:224-247) couples nuclear
moments for shielding calculations.

The energy thus depends on the injected external fields, which makes the
response engine's ``dE/dF`` dipoles and ``d2E/dF2`` polarizabilities
non-trivial.

TPU notes: both the flat padded pair list and the dense [A, K] MD layout
are supported (reductions are sorted-segment sums / K-axis sums).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

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


def _tag(field: str) -> str:
    return field.strip("_")


class FieldInteraction(nn.Module):
    """dq = sum_fields Dense_act(mu . F) (reference field_schnet.py:19-70)."""

    n_atom_basis: int
    external_fields: Sequence[str]
    activation: Callable = shifted_softplus

    @nn.compact
    def __call__(self, mu: Dict[str, jax.Array],
                 fields: Dict[str, jax.Array]) -> jax.Array:
        dq = 0.0
        for f in self.external_fields:
            v = jnp.sum(mu[f] * fields[f][:, :, None], axis=1)     # [A, F]
            dq = dq + Dense(self.n_atom_basis, activation=self.activation,
                            name=f"f2out_{_tag(f)}")(v)
        return dq


class DipoleUpdate(nn.Module):
    """mu_i += sum_j transform(q)_j * rcut_ij * v_ij with UNNORMALISED
    pair vectors (reference field_schnet.py:73-130)."""

    n_atom_basis: int
    external_fields: Sequence[str]

    @nn.compact
    def __call__(self, q, mu, v_ij, rcut_ij, idx_i, idx_j, nbh_idx=None,
                 col_refs=None):
        A = q.shape[0]
        out = {}
        for f in self.external_fields:
            qi = Dense(self.n_atom_basis, use_bias=False,
                       name=f"transform_{_tag(f)}")(q)
            if col_refs is not None:
                # column layout: one-hot MXU gather/fold (VERDICT r4 #5)
                from ..ops.colblock import column_fold, column_gather

                qj = column_gather(qi, col_refs)       # [nx, ny, K, F]
                dmu_ij = (qj * rcut_ij[..., None])[..., None, :] * \
                    v_ij[..., None]                    # [nx, ny, K, 3, F]
                dmu_i = column_fold(
                    dmu_ij.reshape(*v_ij.shape[:3], -1), col_refs
                ).reshape(A, 3, -1)
            elif nbh_idx is not None:
                qj = jnp.take(qi, nbh_idx, axis=0)             # [A, K, F]
                dmu_ij = (qj * rcut_ij[..., None])[:, :, None, :] * \
                    v_ij[..., None]                            # [A, K, 3, F]
                dmu_i = jnp.sum(dmu_ij, axis=1)
            else:
                qj = jnp.take(qi, idx_j, axis=0)               # [P, F]
                dmu_ij = (qj * rcut_ij[:, None])[:, None, :] * \
                    v_ij[:, :, None]                           # [P, 3, F]
                dmu_i = segment_sum(dmu_ij, idx_i, A)
            out[f] = mu[f] + dmu_i
        return out


class DipoleInteraction(nn.Module):
    """Scalar update from dipole-dipole interactions through the classical
    interaction tensor (reference field_schnet.py:131-223)."""

    n_atom_basis: int
    external_fields: Sequence[str]
    activation: Callable = shifted_softplus

    @nn.compact
    def __call__(self, mu, f_ij, d_ij, v_ij, rcut_ij, idx_i, idx_j,
                 nbh_idx=None, col_refs=None):
        A = mu[self.external_fields[0]].shape[0]
        dq = 0.0
        for f in self.external_fields:
            t = _tag(f)
            W = Dense(self.n_atom_basis, activation=self.activation,
                      name=f"filter_{t}_0")(f_ij)
            # zero-initialised second filter layer (reference :167-170)
            W = Dense(self.n_atom_basis,
                      kernel_init=nn.initializers.zeros,
                      name=f"filter_{t}_1")(W)
            W = W * rcut_ij[..., None]
            # clamp: padded dense-layout slots sit at d ~ sqrt(eps); 1/d^5
            # would overflow there before the rcut mask zeroes the term
            d5 = jnp.maximum(d_ij, 1e-2) ** 5
            if col_refs is not None:
                from ..ops.colblock import column_fold, column_gather

                F_ = mu[f].shape[-1]
                mu_ij = column_gather(
                    mu[f].reshape(A, -1), col_refs
                ).reshape(*d_ij.shape, 3, F_)          # [nx, ny, K, 3, F]
                proj = jnp.sum(v_ij[..., None] * mu_ij, axis=-2,
                               keepdims=True)          # [nx, ny, K, 1, F]
                tensor = (mu_ij * (d_ij ** 2)[..., None, None]
                          - 3.0 * v_ij[..., None] * proj)
                tensor = tensor * W[..., None, :] / d5[..., None, None]
                tensor_i = column_fold(
                    tensor.reshape(*d_ij.shape, -1), col_refs
                ).reshape(A, 3, F_)
            elif nbh_idx is not None:
                mu_ij = jnp.take(mu[f], nbh_idx, axis=0)       # [A, K, 3, F]
                proj = jnp.sum(v_ij[..., None] * mu_ij, axis=2,
                               keepdims=True)                  # [A, K, 1, F]
                tensor = (mu_ij * (d_ij ** 2)[..., None, None]
                          - 3.0 * v_ij[..., None] * proj)
                tensor = tensor * W[:, :, None, :] / d5[..., None, None]
                tensor_i = jnp.sum(tensor, axis=1)             # [A, 3, F]
            else:
                mu_ij = jnp.take(mu[f], idx_j, axis=0)         # [P, 3, F]
                proj = jnp.sum(v_ij[:, :, None] * mu_ij, axis=1,
                               keepdims=True)                  # [P, 1, F]
                tensor = (mu_ij * (d_ij ** 2)[:, None, None]
                          - 3.0 * v_ij[:, :, None] * proj)
                tensor = tensor * W[:, None, :] / d5[:, None, None]
                tensor_i = segment_sum(tensor, idx_i, A)       # [A, 3, F]
            dq_i = jnp.sum(mu[f] * tensor_i, axis=1)           # [A, F]
            dq = dq + Dense(self.n_atom_basis, activation=self.activation,
                            name=f"transform_{t}")(dq_i)
        return dq


class NuclearMagneticMomentEmbedding(nn.Module):
    """gamma(Z) * Dense(nmm) into the magnetic dipole features
    (reference field_schnet.py:224-247)."""

    n_atom_basis: int
    max_z: int = 100

    @nn.compact
    def __call__(self, Z, nmm):
        gamma = nn.Embed(self.max_z + 1, 1, name="gyromagnetic")(Z)  # [A, 1]
        delta = Dense(self.n_atom_basis, use_bias=False, name="delta")(
            nmm[..., None])                                    # [A, 3, F]
        return gamma[:, :, None] * delta                       # [A, 3, F]


class FieldSchNet(nn.Module):
    """Field-coupled SchNet (reference field_schnet.py:249-438)."""

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
        col_refs = None
        if properties.cell_qcol in inputs:
            # column-bucketed layout (TPU fast path, VERDICT r4 #5)
            from ..ops.colblock import ColRefs

            qc = inputs[properties.cell_qcol]
            ksz = tuple(a.shape[0] for a in inputs[properties.cell_ksz])
            Pc = inputs[properties.R].shape[0] // (qc.shape[0] * qc.shape[1])
            col_refs = ColRefs(qc, inputs[properties.cell_dcol], Pc, ksz,
                               None, inputs.get(properties.cell_oh))
            Rij = inputs[properties.col_rij]          # [nx, ny, Ktot, 3]
            emask = inputs[properties.cell_emask]
            d_ij = safe_norm(Rij, axis=-1)
            f_ij = radial(d_ij)
            rcut_ij = cutoff_fn(d_ij) * emask
            idx_i = idx_j = None
        elif properties.nbh_rij in inputs and idx_i.shape[0] <= 1:
            # dense [A, K] MD layout (the flat list carries no real pairs)
            Rij = inputs[properties.nbh_rij]
            nbh_idx = inputs[properties.nbh_idx]
            nbh_mask = inputs[properties.nbh_mask]
            d_ij = safe_norm(Rij, axis=-1)                  # [A, K]
            f_ij = radial(d_ij)
            rcut_ij = cutoff_fn(d_ij) * nbh_mask
            idx_i = idx_j = None
        else:
            d_ij = safe_norm(Rij, axis=-1)
            f_ij = radial(d_ij)
            rcut_ij = cutoff_fn(d_ij) * pair_mask
        v_ij = Rij                                          # UNNORMALISED

        q = nn.Embed(self.max_z + 1, F, name="embedding")(Z)

        # per-atom external fields (expand the per-molecule inputs)
        field_atoms = {}
        M = inputs[properties.n_atoms].shape[0]
        for f in fields:
            v = inputs.get(f)
            if v is None:
                v = jnp.zeros((M, 3), q.dtype)
            # clip: padded atoms index the padding molecule, which the
            # caller may not have supplied a field row for (jnp.take's
            # default fill mode would give them NaN vectors)
            field_atoms[f] = jnp.take(v, idx_m, axis=0, mode="clip")

        mu = {f: jnp.zeros((q.shape[0], 3, F), q.dtype) for f in fields}

        # first dipole update from the embeddings (reference :403)
        mu = DipoleUpdate(F, tuple(fields), name="initial_dipole_update")(
            q, mu, v_ij, rcut_ij, idx_i, idx_j, nbh_idx=nbh_idx,
            col_refs=col_refs)

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
                q, f_ij, rcut_ij, idx_i, idx_j, nbh_idx=nbh_idx,
                col_refs=col_refs,
            )
            dq = dq + FieldInteraction(
                F, tuple(fields), self.activation, name=f"field_inter_{t}"
            )(mu, field_atoms)
            dq = dq + DipoleInteraction(
                F, tuple(fields), self.activation, name=f"dipole_inter_{t}"
            )(mu, f_ij, d_ij, v_ij, rcut_ij, idx_i, idx_j, nbh_idx=nbh_idx,
              col_refs=col_refs)
            q = q + dq
            mu = DipoleUpdate(F, tuple(fields), name=f"dipole_update_{t}")(
                dq, mu, v_ij, rcut_ij, idx_i, idx_j, nbh_idx=nbh_idx,
                col_refs=col_refs)

        inputs[properties.scalar_representation] = q
        return inputs
