"""SchNet: continuous-filter convolutional network.

Behavioral parity with ``src/schnetpack/representation/schnet.py``: nuclear
embedding (+ optional electronic embeddings), radial-basis expansion with a
smooth cutoff, N interaction blocks with residual updates, producing
``scalar_representation``.

TPU notes: the hot loop (gather x[idx_j] -> multiply by filter ->
segment-sum to centers, ``schnet.py:60-67``) runs over the fixed-shape
padded pair list; padded pairs are zeroed by the cutoff envelope (their
distance is PAD_OFFSET) *and* by pair_mask.  The dense maps dominate FLOPs
and land on the MXU; a fused Pallas cfconv kernel can be swapped in via
``ops.cfconv``.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import properties
from ..nn.base import Dense
from ..nn.cutoff import CosineCutoff
from ..nn.embedding import ElectronicEmbedding, NuclearEmbedding
from ..nn.radial import GaussianRBF
from ..ops.activations import shifted_softplus
from ..ops.math import safe_norm
from ..ops.neighbor_gather import neighbor_gather
from ..ops.scatter import segment_sum


class SchNetInteraction(nn.Module):
    """One continuous-filter convolution block (parity: schnet.py:14-70).

    Flat layout: f_ij/rcut_ij are [P, .]/[P] with idx arrays.  Dense
    layout: [A, K, .]/[A, K] with ``nbh_idx`` — aggregation is a K-axis
    reduction (no scatter; the TPU-fast path).
    """

    n_atom_basis: int
    n_filters: int
    activation: Callable = shifted_softplus

    @nn.compact
    def __call__(self, x, f_ij, rcut_ij, idx_i=None, idx_j=None, nbh_idx=None,
                 nbh_rev=None, nbh_mask=None, fused_ctx=None, col_refs=None):
        A = x.shape[0]
        # the filter Dense layers are declared without the fused activation
        # (applied explicitly below — same math, same param tree) so the
        # column-kernel path can extract their affine weights
        f0 = Dense(self.n_filters, name="filter_0")
        f1 = Dense(self.n_filters, name="filter_1")
        in2f = Dense(self.n_filters, use_bias=False, name="in2f")
        if fused_ctx is not None:
            # column layout: gather + filter MLP + message + neighbor sum
            # run as one fused kernel on raw-phi feature-major geometry
            from ..ops.schnet_columns import schnet_cfconv_columns

            geo, refs = fused_ctx
            B = geo[0].shape[2] - 4
            F = self.n_filters
            b1 = f0(jnp.zeros((1, B), x.dtype))[0]
            W1 = f0(jnp.eye(B, dtype=x.dtype)) - b1[None]
            b2 = f1(jnp.zeros((1, F), x.dtype))[0]
            W2 = f1(jnp.eye(F, dtype=x.dtype)) - b2[None]
            h = in2f(x)
            agg = schnet_cfconv_columns(h, geo, W1, b1, W2, b2, refs)
        else:
            # filter-generating network on the radial features
            W = f1(self.activation(f0(f_ij)))
            W = W * rcut_ij[..., None]

            h = in2f(x)
            agg = self._aggregate(h, W, idx_i, idx_j, nbh_idx, nbh_rev,
                                  nbh_mask, A, col_refs)

        v = Dense(self.n_atom_basis, activation=self.activation, name="f2out_0")(agg)
        v = Dense(self.n_atom_basis, name="f2out_1")(v)
        return v

    @staticmethod
    def _aggregate(h, W, idx_i, idx_j, nbh_idx, nbh_rev, nbh_mask, A,
                   col_refs=None):
        if col_refs is not None:
            # generic column-layout path (FieldSchNet etc.): one-hot MXU
            # gather/fold; W is [nx, ny, Ktot, F]
            from ..ops.colblock import column_fold, column_gather

            hj = column_gather(h, col_refs)
            return column_fold(hj * W, col_refs)
        if nbh_idx is not None:
            if nbh_rev is not None:
                hj = neighbor_gather(h, nbh_idx, nbh_rev, nbh_mask)
            else:
                hj = jnp.take(h, nbh_idx, axis=0)
            m = hj * W                                     # [A, K, F]
            agg = jnp.sum(m, axis=1)
        else:
            m = jnp.take(h, idx_j, axis=0) * W             # [P, F]
            agg = segment_sum(m, idx_i, A)
        return agg


class SchNet(nn.Module):
    """SchNet representation -> ``inputs["scalar_representation"]`` [A, F]."""

    n_atom_basis: int = 128
    n_interactions: int = 3
    n_rbf: int = 20
    cutoff: float = 5.0
    n_filters: Optional[int] = None
    shared_interactions: bool = False
    max_z: int = 100
    radial_basis: Optional[nn.Module] = None
    cutoff_fn: Optional[nn.Module] = None
    activation: Callable = shifted_softplus
    nuclear_embedding: bool = False     # SpookyNet-style embedding w/ e-configs
    electronic_embeddings: tuple = ()   # subset of {"charge", "spin"}

    @nn.compact
    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        Z = inputs[properties.Z]
        dense = properties.nbh_rij in inputs

        n_filters = self.n_filters or self.n_atom_basis
        radial = self.radial_basis or GaussianRBF(n_rbf=self.n_rbf, cutoff=self.cutoff)
        cutoff_fn = self.cutoff_fn or CosineCutoff(cutoff=self.cutoff)

        fused_ctx = None
        if properties.cell_qcol in inputs:
            # column-bucketed layout (the TPU fast path): fused raw-phi
            # geometry + fused cfconv kernels (ops/schnet_columns.py)
            from ..ops.colblock import ColRefs
            from ..ops.colblock_geo import column_geometry
            from ..ops.radial import gaussian_rbf_params

            if not (isinstance(radial, GaussianRBF)
                    and isinstance(cutoff_fn, CosineCutoff)):
                raise NotImplementedError(
                    "the SchNet column path requires a GaussianRBF and "
                    "a CosineCutoff"
                )
            qc = inputs[properties.cell_qcol]
            ksz = tuple(a.shape[0] for a in inputs[properties.cell_ksz])
            Pc = inputs[properties.R].shape[0] // (qc.shape[0] * qc.shape[1])
            refs = ColRefs(qc, inputs[properties.cell_dcol], Pc, ksz)
            if properties.cell_coff_fm in inputs:
                coff_fm = inputs[properties.cell_coff_fm]
            else:
                coff_fm = jnp.moveaxis(
                    inputs[properties.cell_coff]
                    * inputs[properties.cell_emask][..., None], 3, 2)
            if radial.trainable:
                # trainable RBF (reference nn/radial.py:18-49 with
                # trainable=True): centers/widths are flax params, so the
                # geometry must stay differentiable in them — the pallas
                # geometry kernel's VJP only emits dR (colblock_geo.py),
                # so use the XLA geometry; the fused cfconv kernels'
                # ggeo cotangent then reaches centers/widths through
                # XLA autodiff.
                from ..ops.colblock_geo import column_geometry_xla

                centers, widths = radial(None, return_params=True)
                geo = column_geometry_xla(
                    inputs[properties.R], coff_fm, refs, centers, widths,
                    cutoff_fn.cutoff, raw_phi=True)
            else:
                centers, widths = gaussian_rbf_params(
                    radial.n_rbf, radial.cutoff, radial.start)
                geo = column_geometry(
                    inputs[properties.R], coff_fm, refs, centers, widths,
                    cutoff_fn.cutoff, raw_phi=True)
            fused_ctx = (geo, refs)
            f_ij = rcut_ij = None
            idx_i = idx_j = nbh_idx = nbh_rev = nbh_mask = None
        elif dense:
            Rij = inputs[properties.nbh_rij]               # [A, K, 3]
            nbh_idx = inputs[properties.nbh_idx]
            nbh_rev = inputs.get(properties.nbh_rev)
            nbh_mask = inputs[properties.nbh_mask]
            idx_i = idx_j = None
            d_ij = safe_norm(Rij, axis=-1)
            rcut_ij = cutoff_fn(d_ij) * nbh_mask
        else:
            Rij = inputs[properties.Rij]
            idx_i = inputs[properties.idx_i]
            idx_j = inputs[properties.idx_j]
            nbh_idx = nbh_rev = nbh_mask = None
            d_ij = safe_norm(Rij, axis=-1)
            rcut_ij = cutoff_fn(d_ij) * inputs[properties.pair_mask]
        f_ij = radial(d_ij) if fused_ctx is None else None

        if self.nuclear_embedding:
            x = NuclearEmbedding(self.n_atom_basis, max_z=self.max_z, name="embedding")(Z)
        else:
            x = nn.Embed(self.max_z + 1, self.n_atom_basis, name="embedding")(Z)

        if self.electronic_embeddings:
            idx_m = inputs[properties.idx_m]
            M = inputs[properties.n_atoms].shape[0]
            if "charge" in self.electronic_embeddings:
                q = inputs.get(properties.total_charge, jnp.zeros(M, x.dtype))
                x = x + ElectronicEmbedding(self.n_atom_basis, is_charged=True, name="charge_embedding")(x, q, idx_m, M)
            if "spin" in self.electronic_embeddings:
                s = inputs.get(properties.spin_multiplicity, jnp.zeros(M, x.dtype))
                x = x + ElectronicEmbedding(self.n_atom_basis, is_charged=False, name="spin_embedding")(x, s, idx_m, M)

        if self.shared_interactions:
            block = SchNetInteraction(
                self.n_atom_basis, n_filters, self.activation, name="interaction_shared"
            )
            for _ in range(self.n_interactions):
                x = x + block(x, f_ij, rcut_ij, idx_i, idx_j, nbh_idx,
                              nbh_rev, nbh_mask, fused_ctx)
        else:
            for t in range(self.n_interactions):
                v = SchNetInteraction(
                    self.n_atom_basis, n_filters, self.activation, name=f"interaction_{t}"
                )(x, f_ij, rcut_ij, idx_i, idx_j, nbh_idx, nbh_rev, nbh_mask,
                  fused_ctx)
                x = x + v

        inputs[properties.scalar_representation] = x
        return inputs
