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
                 nbh_rev=None, nbh_mask=None):
        A = x.shape[0]
        # filter-generating network on the radial features
        W = Dense(self.n_filters, activation=self.activation, name="filter_0")(f_ij)
        W = Dense(self.n_filters, name="filter_1")(W)
        W = W * rcut_ij[..., None]

        h = Dense(self.n_filters, use_bias=False, name="in2f")(x)
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

        v = Dense(self.n_atom_basis, activation=self.activation, name="f2out_0")(agg)
        v = Dense(self.n_atom_basis, name="f2out_1")(v)
        return v


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

        if dense:
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
        f_ij = radial(d_ij)

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
                x = x + block(x, f_ij, rcut_ij, idx_i, idx_j, nbh_idx, nbh_rev, nbh_mask)
        else:
            for t in range(self.n_interactions):
                v = SchNetInteraction(
                    self.n_atom_basis, n_filters, self.activation, name=f"interaction_{t}"
                )(x, f_ij, rcut_ij, idx_i, idx_j, nbh_idx, nbh_rev, nbh_mask)
                x = x + v

        inputs[properties.scalar_representation] = x
        return inputs
