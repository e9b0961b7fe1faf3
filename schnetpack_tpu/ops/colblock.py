"""Column-bucketed neighbor ops: the second-generation TPU fast path.

The first-generation cell-blocked layout (ops/cellblock.py) assembles a
27-cell candidate tile per z-cell inside the kernel; measurement showed
the per-z tile assembly (9 VMEM slice copies per piece per z) dominates
the kernel, not the MXU selection dots.  This layout removes the tile
assembly entirely:

* atoms are packed per xy-column (static capacity P, z-sorted inside;
  no z binning at all — periodic z images are exact via per-edge
  Cartesian offsets);
* every edge is bucketed by (destination xy-column, source-column offset
  c9); the source is addressed by its row in the source column, so the
  one-hot selection contracts over the **resident whole column** [P, D]
  — no per-z windows, no z-halos;
* contraction depth drops from 27*C (~432) to P (~120) per bucket while
  the total one-hot FLOPs drop ~4x (bucket padding also beats per-atom
  K-slot padding: only real edges occupy bucket rows, not empty atom
  slots, and the atom table itself shrinks to nx*ny*P rows);
* per-destination-atom sums (the K-axis reduction of the dense layout)
  become a second one-hot fold over the in-column destination row dcol.

Ops (XLA reference here; fused Pallas kernels in colblock_pallas.py):
    column_gather(table, refs)   -> [nx, ny, Ktot, D] per-edge rows
    column_expand(table, refs)   -> [nx, ny, Ktot, D] destination rows
    column_fold(edge_vals, refs) -> [A', D] sum per destination atom
    painn_message_columns(...)   -> fused PaiNN interaction message

No reference counterpart: the torch reference gathers/scatters over flat
edge lists (src/schnetpack/representation/painn.py:45-66,
nn/scatter.py); this layout is a TPU-native redesign.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cellblock as _cb

HI = jax.lax.Precision.HIGHEST


class ColRefs(NamedTuple):
    """Static (per neighbor-list rebuild) column-layout index arrays.

    Buckets are ragged: bucket c9 occupies packed rows
    [koffs[c9], koffs[c9] + ksizes[c9]) of the Ktot edge axis.
    """

    qcol: jax.Array   # [nx, ny, Ktot] int32 in-column source row (-1 pad)
    dcol: jax.Array   # [nx, ny, Ktot] int32 in-column destination row (-1 pad)
    P: int            # per-column atom capacity (multiple of 8)
    ksizes: tuple     # 9 static bucket capacities (multiples of 8)
    #: shard_map axis name when columns are slab-sharded along x; ops then
    #: exchange x-boundary column planes via ppermute (halo exchange) and
    #: qcol/dcol/tables are the LOCAL slabs [nx_loc, ny, ...]
    shard_axis: object = None
    #: optional precomputed one-hot selection matrices (bf16) — static
    #: between rebuilds, so building them ONCE and streaming them from HBM
    #: removes the per-bucket VPU iota/compare/convert chains that were
    #: measured to serialize with the MXU dots (scripts/kb_r5.py: fwd
    #: kernel 1.21 -> 0.79 ms/pass).  Layout:
    #:   (ohj_parts 9x[nx, ny, k_c9, P], ohd_full [nx, ny, Ktot, P],
    #:    ohd_parts 9x[nx, ny, k_c9, P])
    oh: object = None

    @classmethod
    def from_layout(cls, lay, shard_axis=None) -> "ColRefs":
        nx, ny, P, ksizes = lay.dims
        return cls(jnp.asarray(lay.qcol), jnp.asarray(lay.dcol), P,
                   tuple(ksizes), shard_axis)

    def with_onehots(self) -> "ColRefs":
        """Attach the precomputed one-hot arrays (no-op when present)."""
        if self.oh is not None or self.shard_axis is not None:
            return self
        return self._replace(oh=build_onehots(
            self.qcol, self.dcol, self.P, self.ksizes))

    @property
    def koffs(self):
        out, acc = [], 0
        for k in self.ksizes:
            out.append(acc)
            acc += k
        return tuple(out) + (acc,)


def _c9_of_slot(ksizes) -> np.ndarray:
    return np.repeat(np.arange(9), np.asarray(ksizes))


def build_onehots(qcol, dcol, P: int, ksizes):
    """Precompute the kernels' one-hot selection matrices from the layout
    indices (one XLA pass per rebuild; -1 pads become zero rows)."""
    def oh_full(idx):
        iota = jnp.arange(P, dtype=idx.dtype)
        return (idx[..., None] == iota).astype(jnp.bfloat16)

    offs, acc = [], 0
    for k in ksizes:
        offs.append(acc)
        acc += k
    ohj_full = oh_full(qcol)
    ohd_full = oh_full(dcol)
    ohj_parts = tuple(
        ohj_full[:, :, o:o + k] for o, k in zip(offs, ksizes))
    ohd_parts = tuple(
        ohd_full[:, :, o:o + k] for o, k in zip(offs, ksizes))
    return (ohj_parts, ohd_full, ohd_parts)


def _decode_j(refs: ColRefs):
    """Global sorted index of each edge's source atom (+ mask)."""
    qcol = refs.qcol
    nx, ny, Ktot = qcol.shape
    valid = qcol >= 0
    q = jnp.where(valid, qcol, 0)
    x = jnp.arange(nx)[:, None, None]
    y = jnp.arange(ny)[None, :, None]
    c9 = jnp.asarray(_c9_of_slot(refs.ksizes))[None, None, :]
    dx = c9 // 3 - 1
    dy = c9 % 3 - 1
    xs = jnp.mod(x + dx, nx)
    ys = jnp.mod(y + dy, ny)
    j = (xs * ny + ys) * refs.P + q
    return j, valid


def _decode_i(refs: ColRefs):
    """Global sorted index of each edge's destination atom (+ mask)."""
    dcol = refs.dcol
    nx, ny, Ktot = dcol.shape
    valid = dcol >= 0
    d = jnp.where(valid, dcol, 0)
    x = jnp.arange(nx)[:, None, None]
    y = jnp.arange(ny)[None, :, None]
    i = (x * ny + y) * refs.P + d
    return jnp.broadcast_to(i, dcol.shape), valid


# ---------------------------------------------------------------- gather
def column_gather(table: jax.Array, refs: ColRefs) -> jax.Array:
    """Per-edge source rows [nx, ny, Ktot, D] (zeros at padded edges)."""
    if refs.shard_axis is not None:
        from .colblock_shard import column_gather_sharded

        return column_gather_sharded(table, refs)
    if _cb._impl().startswith("pallas"):
        from .colblock_pallas import column_gather_pallas

        return column_gather_pallas(table, refs)
    return _column_gather_xla(table, refs)


def _column_gather_xla(table, refs):
    j, valid = _decode_j(refs)
    out = jnp.take(table, j, axis=0)
    return out * valid[..., None].astype(table.dtype)


# ---------------------------------------------------------------- expand
def column_expand(table: jax.Array, refs: ColRefs) -> jax.Array:
    """Per-edge destination rows [nx, ny, 9, Kcol, D]."""
    if _cb._impl().startswith("pallas"):
        from .colblock_pallas import column_expand_pallas

        return column_expand_pallas(table, refs)
    return _column_expand_xla(table, refs)


def _column_expand_xla(table, refs):
    i, valid = _decode_i(refs)
    out = jnp.take(table, i, axis=0)
    return out * valid[..., None].astype(table.dtype)


# ------------------------------------------------------------------ fold
def column_fold(edge_vals: jax.Array, refs: ColRefs) -> jax.Array:
    """Sum per destination atom: [nx, ny, Ktot, D] -> [A', D]."""
    if _cb._impl().startswith("pallas"):
        from .colblock_pallas import column_fold_pallas

        return column_fold_pallas(edge_vals, refs)
    return _column_fold_xla(edge_vals, refs)


def _column_fold_xla(edge_vals, refs):
    i, valid = _decode_i(refs)
    nx, ny, Ktot = i.shape
    D = edge_vals.shape[-1]
    Ap = nx * ny * refs.P
    v = edge_vals * valid[..., None].astype(edge_vals.dtype)
    return jnp.zeros((Ap, D), edge_vals.dtype).at[i.reshape(-1)].add(
        v.reshape(-1, D)
    )


# --------------------------------------------------- fused PaiNN message
def painn_message_columns(xmu, rbf_aug, dir_e, FW_aug, refs: ColRefs):
    """PaiNN inter-atomic message over the column-bucketed layout.

    Args:
        xmu: [A', 6F] concat of ctx output x [A', 3F] and mu [A', 3F].
        rbf_aug: [nx, ny, Ktot, B+1] radial basis * fcut * mask with an
            extra fcut*mask channel (the filter bias channel).
        dir_e: [nx, ny, Ktot, 3] unit displacement vectors.
        FW_aug: [B+1, 3F] filter weights, bias as last row.
        refs: column-layout indices.

    Returns:
        dq [A', F], dmu [A', 3F] (sums over each atom's edges).
    """
    if refs.shard_axis is not None:
        from .colblock_shard import painn_message_columns_sharded

        return painn_message_columns_sharded(xmu, rbf_aug, dir_e, FW_aug, refs)
    if _cb._impl().startswith("pallas"):
        from .colblock_pallas import painn_message_columns_pallas

        return painn_message_columns_pallas(xmu, rbf_aug, dir_e, FW_aug, refs)
    return _painn_message_xla(xmu, rbf_aug, dir_e, FW_aug, refs)


def _painn_message_xla(xmu, rbf_aug, dir_e, FW_aug, refs):
    A, D6 = xmu.shape
    F = D6 // 6
    gathered = _column_gather_xla(xmu, refs)        # [nx,ny,Ktot,6F]
    xj = gathered[..., : 3 * F]
    muj = gathered[..., 3 * F:]
    W = jnp.einsum("...b,bf->...f", rbf_aug, FW_aug, precision=HI)
    xjW = xj * W
    dqe = xjW[..., :F]
    dmuR = xjW[..., F:2 * F]
    dmumu = xjW[..., 2 * F:]
    msg_mu = [
        dmuR * dir_e[..., x:x + 1] + dmumu * muj[..., x * F:(x + 1) * F]
        for x in range(3)
    ]
    msg = jnp.concatenate([dqe] + msg_mu, axis=-1)  # [nx,ny,Ktot,4F]
    folded = _column_fold_xla(msg, refs)            # [A', 4F]
    return folded[:, :F], folded[:, F:]


def painn_message_columns_fm(x, mu, geo, FW_aug, refs: ColRefs):
    """Feature-major fused message.  ``x`` [A', 3F] is the interatomic
    context (phi(q)), ``mu`` [A', 3F] the flattened vector features —
    kept as SEPARATE tables so no [A', 6F] concat (and no backward
    lane-split of its cotangent) is ever materialised.  ``geo`` is the
    9-part per-bucket tuple from :func:`colblock_geo.column_geometry` —
    geo_c9 [nx, ny, B1+3, k_c9] packs the augmented radial basis
    (B1 = n_rbf+1 channels) and the unit direction vectors (3 channels)
    with the edge axis minor — no (8,128) lane-tile padding in HBM, and
    per-bucket arrays let the kernels address shifted blocks with index
    maps instead of rolls."""
    if _cb._impl().startswith("pallas"):
        from .colblock_pallas import painn_message_columns_fm_pallas

        return painn_message_columns_fm_pallas(x, mu, geo, FW_aug, refs)
    from .colblock_geo import concat_geo

    geo_packed = concat_geo(geo)
    B1 = geo_packed.shape[2] - 3
    g = jnp.moveaxis(geo_packed, 2, 3)
    xmu = jnp.concatenate([x, mu], axis=-1)
    return _painn_message_xla(xmu, g[..., :B1], g[..., B1:], FW_aug, refs)


def painn_message_columns_fm_fused(x, mu, R, geo, FW_aug, coff_fm, cw,
                                   refs: ColRefs, rc):
    """Feature-major message whose BACKWARD also applies the geometry
    chain in-kernel, emitting dE/dR directly (no ggeo HBM round trip, no
    separate geometry-backward kernel).  Only valid when ``geo`` was
    computed by ``column_geometry`` from the same (R, coff_fm, cw, rc)
    with raw_phi=False — the caller must pass ``geo`` through
    ``jax.lax.stop_gradient`` so the R-path exists only through this op.
    """
    from .colblock_pallas import painn_message_columns_fm_fused_pallas

    return painn_message_columns_fm_fused_pallas(
        x, mu, R, geo, FW_aug, coff_fm, cw, refs, rc)


def painn_message_columns_fm_geores(x, mu, R, geo, FW_aug, coff_fm, cw,
                                    refs: ColRefs, rc):
    """Message forward on precomputed geo with a GEO-RESIDENT backward:
    the backward reads the same geo tensors as the forward and derives
    the geometry-backward chain from them (d via acos of the stored
    cutoff channel, phi by division) — no position inputs and no
    geometry recompute anywhere in the message kernels.  Pass ``geo``
    through ``jax.lax.stop_gradient``."""
    from .colblock_pallas import painn_message_columns_fm_geores_pallas

    return painn_message_columns_fm_geores_pallas(
        x, mu, R, geo, FW_aug, coff_fm, cw, refs, rc)


def painn_message_columns_full_fused(x, mu, R, FW_aug, coff_fm, cw,
                                     refs: ColRefs, rc):
    """Fully fused message (pallas only): the per-edge geometry is
    recomputed inside both the forward and backward kernels from the
    positions — no geo tensors, no geometry kernels in the step at all.
    Valid for the production MD path (non-trainable Gaussian RBF +
    cosine cutoff, raw_phi=False)."""
    from .colblock_pallas import painn_message_columns_full_fused_pallas

    return painn_message_columns_full_fused_pallas(
        x, mu, R, FW_aug, coff_fm, cw, refs, rc)
