"""Fused per-edge geometry kernel for the column-bucketed layout.

The MD-step geometry chain — gather R_j / expand R_i, Rij, d, dir,
cosine cutoff, Gaussian radial basis, feature-major packing — previously
ran as an XLA op chain over edge-major ``[nx, ny, Ktot, 3]`` / ``[..., 21]``
tensors whose (8, 128) lane-tile padding inflates HBM traffic 43x / 6x;
measurement (PERF.md) attributed ~4.5 ms of the 23 ms step to this chain
(mostly its backward).  This kernel computes the whole chain in VMEM and
emits ONE feature-major tensor

    geo [nx, ny, B1+3, Ktot]   (B1 = n_rbf + 1)

with channels [phi * fcut (n_rbf), fcut, dir (3)] — exactly the layout the
fused feature-major PaiNN message kernels consume — so nothing per-edge is
ever materialised edge-major anywhere, in HBM *or in VMEM*: every
elementwise op here runs channel-major [ch, k] with the packed edge axis
on lanes (full 128-lane utilisation; the first, edge-major version of this
kernel measured 2.5x slower than XLA because [k, 21]-shaped VPU ops use
21/128 lanes).

Positions enter pre-transposed [nx, ny, 3, P] and are selected with
transposed one-hots [P, k] in 3x-bf16 split pieces (exact float32:
8+8+8 mantissa bits; one-hot entries are exact in bf16).  This keeps the
geometry exact even when the feature kernels run the fast bf16
single-piece mode (ops/cellblock.PIECES == 1).

The hand-written VJP returns dR only (the per-edge Cartesian offsets,
basis centers/widths and cutoff are constants of the MD step): a single
destination-centric kernel recomputes the forward per bucket, chains the
geo cotangent back to g(Rij), folds -ohd^T @ gRij into the resident
destination column, and writes 9 per-source-column partials that XLA
folds with one roll each — the same scatter-free pattern as the message
kernels.

No reference counterpart: the torch reference computes these per-edge
quantities as flat gathered tensors (src/schnetpack/atomistic/distances.py,
representation/painn.py:210-231); this is a TPU-native redesign.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cellblock as _cb
from .cellblock_pallas import COL_OFFSETS, _split_f32

# bf16 split passes for the position-selection dots: 3 = exact f32
POS_PIECES = 3


def _interp():
    return _cb._impl() == "pallas_interpret"


def _koffs(ks):
    out, acc = [], 0
    for k in ks:
        out.append(acc)
        acc += k
    return tuple(out) + (acc,)


def _vmem_params():
    return pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _ohT(vec, P):
    """Transposed one-hot [P, k] (bf16) of a lane vector of row indices."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (P, vec.shape[0]), 0)
    return (vec[None, :] == iota).astype(jnp.bfloat16)


def _sel_posT(ohT, pieces_list):
    """Exact-f32 selection [3, k] = sum_p posT_p [3, P] @ ohT [P, k]."""
    acc = None
    for piece in pieces_list:
        d = jax.lax.dot_general(
            piece[0, 0], ohT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    return acc


def _fold_posT(gT_f32, ohT):
    """Exact-f32 fold [3, P] = sum_p g_piece [3, k] @ ohT^T [k, P]."""
    acc = None
    for piece in _split_f32(gT_f32, POS_PIECES):
        d = jax.lax.dot_general(
            piece, ohT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    return acc


def _recompute_geo(q_ref, d_ref, coff, cw_ref, pos_pieces, o0, k, P, rc):
    """Shared fwd chain for one bucket; everything channel-major [ch, k]."""
    q = q_ref[0, 0, 0, o0:o0 + k]
    dv = d_ref[0, 0, 0, o0:o0 + k]
    ohjT = _ohT(q, P)
    ohdT = _ohT(dv, P)
    emaskT = (q >= 0).astype(jnp.float32)[None, :]              # [1, k]
    RjT = _sel_posT(ohjT, [pos_pieces[p * 9 + 0] for p in range(POS_PIECES)])
    RiT = _sel_posT(ohdT, [pos_pieces[p * 9 + 1] for p in range(POS_PIECES)])
    rijT = (RjT + coff[:, o0:o0 + k] - RiT) * emaskT            # [3, k]
    d2 = jnp.sum(rijT * rijT, axis=0, keepdims=True)
    # padded edges have rij == 0; shift their d to 1 so divisions are safe
    d = jnp.sqrt(d2 + (1.0 - emaskT))
    inv_d = 1.0 / d
    dirsT = rijT * inv_d
    f = 0.5 * (jnp.cos(d * (np.pi / rc)) + 1.0)
    fcutT = jnp.where(d < rc, f, 0.0) * emaskT                  # [1, k]
    centers = cw_ref[:, 0:1]                                    # [B, 1]
    coeff = cw_ref[:, 1:2]                                      # -0.5/w^2
    diff = d - centers                                          # [B, k]
    phi = jnp.exp(coeff * diff * diff)
    return (ohjT, ohdT, emaskT, rijT, d, inv_d, dirsT, fcutT, phi, diff,
            coeff)


# ------------------------------------------------------------------ fwd
def _posT_specs(nx, ny, P):
    """9 modular column views per position piece, posT layout [.., 3, P]."""
    return [
        pl.BlockSpec(
            (1, 1, 3, P),
            functools.partial(
                lambda i, j, di, dj: ((i + di) % nx, (j + dj) % ny, 0, 0),
                di=di, dj=dj,
            ),
        )
        for _ in range(POS_PIECES)
        for di, dj in COL_OFFSETS
    ]


def _own_specs(nx, ny, P):
    return [
        pl.BlockSpec((1, 1, 3, P), lambda i, j: (i, j, 0, 0))
        for _ in range(POS_PIECES)
    ]


def _posT_pieces(R, nx, ny, P):
    posT = jnp.moveaxis(R.reshape(nx, ny, P, 3), 3, 2)          # [nx,ny,3,P]
    return _split_f32(posT, POS_PIECES)


def _geo_fwd_call(R, coff_fm, qcol, dcol, cw, P, ks, rc, raw_phi,
                  with_d=False, packed=False):
    nx, ny, Ktot = qcol.shape
    B = cw.shape[0]
    nch = B + 5 if with_d else B + 4
    pieces = _posT_pieces(R, nx, ny, P)
    if packed:
        out_specs = (pl.BlockSpec((1, 1, nch, Ktot),
                                  lambda i, j: (i, j, 0, 0)),)
        out_shape = (jax.ShapeDtypeStruct((nx, ny, nch, Ktot), R.dtype),)
    else:
        out_specs = tuple(
            pl.BlockSpec((1, 1, nch, k), lambda i, j: (i, j, 0, 0))
            for k in ks
        )
        out_shape = tuple(
            jax.ShapeDtypeStruct((nx, ny, nch, k), R.dtype) for k in ks
        )
    out = pl.pallas_call(
        functools.partial(_geo_fwd_kernel, P=P, B=B, ks=ks, rc=rc,
                          raw_phi=raw_phi, with_d=with_d, packed=packed),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 3, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B, 2), lambda i, j: (0, 0)),
        ] + _posT_specs(nx, ny, P) + _own_specs(nx, ny, P),
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], coff_fm, cw,
      *[p for p in pieces for _ in range(9)], *pieces)
    return out[0] if packed else out


def _bucket_pieces(args, c9):
    """pos_pieces layout for _recompute_geo: p*9+0 = src view of bucket c9
    (halo'd), p*9+1 = own column view."""
    out = [None] * (9 * POS_PIECES)
    for p in range(POS_PIECES):
        out[p * 9 + 0] = args[p * 9 + c9]
        out[p * 9 + 1] = args[POS_PIECES * 9 + p]
    return out


def _geo_fwd_kernel(q_ref, d_ref, coff_ref, cw_ref, *args, P, B, ks, rc,
                    raw_phi, with_d=False, packed=False):
    pos_args = args[: POS_PIECES * 9 + POS_PIECES]
    out_refs = args[POS_PIECES * 9 + POS_PIECES:]
    offs = _koffs(ks)
    coff = coff_ref[0, 0]
    for c9 in range(9):
        o0, k = offs[c9], ks[c9]
        (_, _, emaskT, _, d, _, dirsT, fcutT, phi, _, _) = _recompute_geo(
            q_ref, d_ref, coff, cw_ref, _bucket_pieces(pos_args, c9),
            o0, k, P, rc)
        # packed mode: one [nch, Ktot] block per cell, buckets written at
        # their static edge offsets (one operand instead of nine at every
        # consumer -> no per-bucket staging copies at the pallas calls)
        ref = out_refs[0] if packed else out_refs[c9]
        e0 = o0 if packed else 0
        ref[0, 0, 0:B, e0:e0 + k] = (
            phi * emaskT if raw_phi else phi * fcutT
        )
        ref[0, 0, B:B + 1, e0:e0 + k] = fcutT
        ref[0, 0, B + 1:B + 4, e0:e0 + k] = dirsT
        if with_d:
            # distance channel for the geo-resident message backward
            # (masked edges carry the safe d == 1 placeholder)
            ref[0, 0, B + 4:B + 5, e0:e0 + k] = d


# ------------------------------------------------------------------ bwd
def _geo_bwd_kernel(q_ref, d_ref, coff_ref, cw_ref, *args,
                    P, B, ks, rc, raw_phi):
    g_refs = args[:9]
    pos_args = args[9: 9 + POS_PIECES * 9 + POS_PIECES]
    outs = args[9 + POS_PIECES * 9 + POS_PIECES:]
    dRi_ref = outs[0]
    part_refs = outs[1:]
    offs = _koffs(ks)
    coff = coff_ref[0, 0]
    acc_i = None
    for c9 in range(9):
        o0, k = offs[c9], ks[c9]
        (ohjT, ohdT, emaskT, rijT, d, inv_d, dirsT, fcutT, phi, diff,
         coeff) = _recompute_geo(
            q_ref, d_ref, coff, cw_ref, _bucket_pieces(pos_args, c9),
            o0, k, P, rc)
        g = g_refs[c9][0, 0]                                    # [B+4, k]
        gphi = g[0:B]
        gfc = g[B:B + 1]
        gdir = g[B + 1:B + 4]
        dphi_dd = 2.0 * coeff * diff * phi                      # [B, k]
        fp = -0.5 * (np.pi / rc) * jnp.sin(d * (np.pi / rc))
        dfcut_dd = jnp.where(d < rc, fp, 0.0) * emaskT          # [1, k]
        if raw_phi:
            gd = (
                jnp.sum(gphi * dphi_dd, axis=0, keepdims=True) * emaskT
                + gfc * dfcut_dd
            )
        else:
            gd = (
                jnp.sum(gphi * dphi_dd, axis=0, keepdims=True) * fcutT
                + (jnp.sum(gphi * phi, axis=0, keepdims=True) + gfc)
                * dfcut_dd
            )
        gdr = jnp.sum(gdir * rijT, axis=0, keepdims=True)
        grijT = (gdir * inv_d - rijT * (gdr * inv_d * inv_d * inv_d)
                 + gd * dirsT) * emaskT                         # [3, k]
        di = _fold_posT(grijT, ohdT)                            # [3, P]
        acc_i = -di if acc_i is None else acc_i - di
        part_refs[c9][0, 0] = _fold_posT(grijT, ohjT)
    dRi_ref[0, 0] = acc_i


def _geo_bwd_call(g, R, coff_fm, qcol, dcol, cw, P, ks, rc, raw_phi):
    nx, ny, Ktot = qcol.shape
    B = cw.shape[0]
    A = R.shape[0]
    pieces = _posT_pieces(R, nx, ny, P)
    outs = pl.pallas_call(
        functools.partial(_geo_bwd_kernel, P=P, B=B, ks=ks, rc=rc,
                          raw_phi=raw_phi),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 3, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B, 2), lambda i, j: (0, 0)),
        ] + [
            pl.BlockSpec((1, 1, B + 4, k), lambda i, j: (i, j, 0, 0))
            for k in ks
        ] + _posT_specs(nx, ny, P) + _own_specs(nx, ny, P),
        out_specs=tuple(
            pl.BlockSpec((1, 1, 3, P), lambda i, j: (i, j, 0, 0))
            for _ in range(10)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nx, ny, 3, P), R.dtype) for _ in range(10)
        ),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], coff_fm, cw, *g,
      *[p for p in pieces for _ in range(9)], *pieces)
    dRT, partials = outs[0], outs[1:]
    for (dx, dy), p in zip(COL_OFFSETS, partials):
        dRT = dRT + jnp.roll(p, (dx, dy), axis=(0, 1))
    return jnp.moveaxis(dRT, 2, 3).reshape(A, 3)


# ------------------------------------------------------- public op + VJP
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _column_geometry_p(R, coff_fm, qcol, dcol, cw, P, ks, rc, raw_phi,
                       with_d=False, packed=False):
    return _geo_fwd_call(R, coff_fm, qcol, dcol, cw, P, ks, rc, raw_phi,
                         with_d, packed)


def _cgeo_fwd(R, coff_fm, qcol, dcol, cw, P, ks, rc, raw_phi, with_d=False,
              packed=False):
    out = _column_geometry_p(R, coff_fm, qcol, dcol, cw, P, ks, rc, raw_phi,
                             with_d, packed)
    return out, (R, coff_fm, qcol, dcol, cw)


def _cgeo_bwd(P, ks, rc, raw_phi, with_d, packed, res, g):
    if with_d or packed:
        raise NotImplementedError(
            "with_d/packed geo is for the geo-resident message backward; "
            "pass it through jax.lax.stop_gradient"
        )
    R, coff_fm, qcol, dcol, cw = res
    dR = _geo_bwd_call(g, R, coff_fm, qcol, dcol, cw, P, ks, rc, raw_phi)
    return dR, None, None, None, None


_column_geometry_p.defvjp(_cgeo_fwd, _cgeo_bwd)


def column_geometry(R, coff_fm, refs, centers, widths, cutoff,
                    raw_phi=False, with_d=False):
    """Fused per-edge geometry for the column layout.

    Args:
        R: [A', 3] float32 positions in the sorted/padded table order.
        coff_fm: [nx, ny, 3, Ktot] feature-major Cartesian periodic
            offsets (zero at padded edge slots), in the model's units.
        refs: ColRefs.
        centers, widths: Gaussian RBF parameters [B].
        cutoff: model cutoff (cosine cutoff radius).

    Returns:
        tuple of 9 per-bucket tensors geo_c9 [nx, ny, B+4, k_c9],
        feature-major with channels [phi * fcut (B), fcut, dir (3)].
        Bucket c9 of block (i, j) holds the edges destined for column
        (i, j) whose source lives in column (i+di, j+dj) — keeping the
        buckets as separate arrays lets every consumer (message kernels,
        this op's own VJP) address the shifted source/destination blocks
        with BlockSpec index maps instead of jnp.roll/concatenate
        relayouts (~0.8 ms/step of pure HBM copies at 12.8k atoms).
    """
    if not _cb._impl().startswith("pallas"):
        return column_geometry_xla(R, coff_fm, refs, centers, widths, cutoff,
                                   raw_phi, with_d)
    cw = jnp.stack([
        jnp.asarray(centers, R.dtype),
        -0.5 / jnp.square(jnp.asarray(widths, R.dtype)),
    ], axis=1)                                                  # [B, 2]
    return _column_geometry_p(R, coff_fm, refs.qcol, refs.dcol, cw,
                              refs.P, refs.ksizes, float(cutoff),
                              bool(raw_phi), bool(with_d))


def column_geometry_packed(R, coff_fm, refs, centers, widths, cutoff,
                           raw_phi=False, with_d=False):
    """Like :func:`column_geometry` but returns ONE packed tensor
    [nx, ny, nch, Ktot] (buckets at their static edge offsets).

    For the geo-resident / fully-fused message paths only: the caller
    must wrap the result in ``jax.lax.stop_gradient`` (the message
    backward emits position cotangents itself), so no VJP is defined.
    Pallas impls only; the XLA fallback packs the per-bucket tensors.
    """
    if not _cb._impl().startswith("pallas"):
        return concat_geo(column_geometry_xla(
            R, coff_fm, refs, centers, widths, cutoff, raw_phi, with_d))
    cw = jnp.stack([
        jnp.asarray(centers, R.dtype),
        -0.5 / jnp.square(jnp.asarray(widths, R.dtype)),
    ], axis=1)
    return _column_geometry_p(R, coff_fm, refs.qcol, refs.dcol, cw, refs.P,
                              refs.ksizes, float(cutoff), bool(raw_phi),
                              bool(with_d), True)


def column_geometry_xla(R, coff_fm, refs, centers, widths, cutoff,
                        raw_phi=False, with_d=False):
    """XLA reference implementation (numerics oracle for the kernel)."""
    from .colblock import _column_expand_xla, _column_gather_xla
    from .math import safe_norm
    from .radial import gaussian_rbf

    Rj = _column_gather_xla(R, refs)
    Ri = _column_expand_xla(R, refs)
    emask = (refs.qcol >= 0).astype(R.dtype)[..., None]
    rij = (Rj + jnp.moveaxis(coff_fm, 2, 3) - Ri) * emask
    d = safe_norm(rij, axis=-1)
    d = jnp.where(emask[..., 0] > 0, d, 1.0)
    dirs = rij / d[..., None]
    f = 0.5 * (jnp.cos(d * (np.pi / cutoff)) + 1.0)
    fcut = jnp.where(d < cutoff, f, 0.0) * emask[..., 0]
    phi = gaussian_rbf(d, jnp.asarray(centers, R.dtype),
                       jnp.asarray(widths, R.dtype))
    ch0 = phi * emask if raw_phi else phi * fcut[..., None]
    parts = [ch0, fcut[..., None], dirs]
    if with_d:
        parts.append(d[..., None])
    geo = jnp.concatenate(parts, axis=-1)
    return split_geo(jnp.moveaxis(geo, -1, 2), refs.ksizes)


def split_geo(geo, ks):
    """Split one packed [nx, ny, C, Ktot] tensor into the 9 per-bucket
    parts along the edge axis."""
    offs = _koffs(ks)
    return tuple(
        geo[..., offs[c9]:offs[c9] + ks[c9]] for c9 in range(9)
    )


def concat_geo(geos):
    """Inverse of :func:`split_geo` (compat shim for consumers that want
    the packed layout, e.g. the SchNet column kernels)."""
    return jnp.concatenate(geos, axis=3)
