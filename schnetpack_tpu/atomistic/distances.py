"""Input modules computing pairwise displacements.

Parity: ``src/schnetpack/atomistic/distances.py:9-57``.  ``Rij`` is
recomputed *inside* the model so that force/stress gradients flow through
the positions (and through the strain reparameterization when active).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import properties


class PairwiseDistances(nn.Module):
    """Adds ``Rij = R[idx_j] - R[idx_i] + offsets`` to the inputs."""

    @nn.compact
    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        R = inputs[properties.R]
        idx_i = inputs[properties.idx_i]
        idx_j = inputs[properties.idx_j]
        offsets = inputs[properties.offsets]
        Rij = jnp.take(R, idx_j, axis=0) - jnp.take(R, idx_i, axis=0) + offsets
        inputs[properties.Rij] = Rij
        if properties.cell_qcol in inputs:
            # column-bucketed layout: per-edge displacements from two MXU
            # selection kernels (gather source rows, expand destination rows)
            from ..ops.colblock import ColRefs, column_expand, column_gather

            qc = inputs[properties.cell_qcol]
            ksizes = tuple(a.shape[0] for a in inputs[properties.cell_ksz])
            P = R.shape[0] // (qc.shape[0] * qc.shape[1])
            shard = None
            if properties.cell_shard in inputs:
                from ..ops.colblock_shard import COLS_AXIS, COLS_AXIS_Y

                shard = (
                    (COLS_AXIS, COLS_AXIS_Y)
                    if inputs[properties.cell_shard].shape[0] >= 2
                    else COLS_AXIS
                )
            refs = ColRefs(qc, inputs[properties.cell_dcol], P, ksizes,
                           shard)
            Rj = column_gather(R, refs)
            Ri = column_expand(R, refs)
            emask = inputs[properties.cell_emask][..., None]
            inputs[properties.col_rij] = (
                Rj + inputs[properties.cell_coff] * emask - Ri
            )
        elif properties.cell_qidx in inputs:
            # cell-blocked layout: MXU selection gather (scatter-free VJP)
            from ..ops.cellblock import cell_gather

            Rj = cell_gather(R, inputs[properties.cell_qidx])
            inputs[properties.nbh_rij] = (
                Rj + inputs[properties.nbh_offsets]
                - R[:, None, :] * inputs[properties.nbh_mask][..., None]
            )
        elif properties.nbh_idx in inputs:
            # dense layout: [A, K, 3] displacements
            nbh = inputs[properties.nbh_idx]
            inputs[properties.nbh_rij] = (
                jnp.take(R, nbh, axis=0)
                + inputs[properties.nbh_offsets]
                - R[:, None, :]
            )
        if properties.idx_i_lr in inputs:
            Rij_lr = (
                jnp.take(R, inputs[properties.idx_j_lr], axis=0)
                - jnp.take(R, inputs[properties.idx_i_lr], axis=0)
                + inputs[properties.offsets_lr]
            )
            inputs[properties.Rij_lr] = Rij_lr
        return inputs


class FilterShortRange(nn.Module):
    """Mask-based short/long-range split of a single full pair list.

    The reference (``distances.py:29-57``) builds two ragged index lists; on
    TPU we keep the long-range list fixed-shape and derive the short-range
    view as the same arrays with a tightened ``pair_mask`` (zero-cost, no
    dynamic shapes).  The *collate*-level split (NeighborListTransform with
    ``long_range_cutoff``) is preferred for training; this module exists for
    models that receive only one list.
    """

    short_range_cutoff: float

    @nn.compact
    def __call__(self, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        Rij = inputs[properties.Rij]
        d = jnp.linalg.norm(Rij, axis=-1)
        mask = inputs[properties.pair_mask]
        inputs[properties.idx_i_lr] = inputs[properties.idx_i]
        inputs[properties.idx_j_lr] = inputs[properties.idx_j]
        inputs[properties.Rij_lr] = Rij
        inputs[properties.pair_mask_lr] = mask
        inputs[properties.pair_mask] = mask * (d < self.short_range_cutoff)
        return inputs
