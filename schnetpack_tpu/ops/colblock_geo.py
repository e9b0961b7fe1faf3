"""Fused per-edge geometry kernel for the column-bucketed layout.

The MD-step geometry chain — gather R_j / expand R_i, Rij, d, dir,
cosine cutoff, Gaussian radial basis, feature-major packing — previously
ran as an XLA op chain over edge-major ``[nx, ny, Ktot, 3]`` / ``[..., 21]``
tensors whose (8, 128) lane-tile padding inflates HBM traffic 43x / 6x;
measurement (PERF.md) attributed ~8 ms of the 23 ms step to this residual
chain plus ~1 ms to the position gathers.  This kernel computes the whole
chain in VMEM and emits ONE feature-major tensor

    geo [nx, ny, B1+3, Ktot]   (B1 = n_rbf + 1)

with channels [phi * fcut (n_rbf), fcut, dir (3)] — exactly the layout the
fused feature-major PaiNN message kernels consume — so nothing per-edge is
ever materialised edge-major in HBM.

Position gathers run as one-hot selection dots in 3x-bf16 split pieces
(exact float32: 8+8+8 mantissa bits; one-hot entries are exact in bf16).

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

HI = jax.lax.Precision.HIGHEST

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


def _oh_f32(idx_ref, off, k, depth):
    """One-hot [k, depth] float32 for packed rows [off, off+k)."""
    v = idx_ref[0, 0, 0, off:off + k]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, depth), 1)
    return (v[:, None] == iota).astype(jnp.float32)


def _sel_pos(oh_f32, pos_pieces):
    """Exact-f32 one-hot selection of positions [k, 3] from bf16 pieces."""
    oh = oh_f32.astype(jnp.bfloat16)
    acc = None
    for piece in pos_pieces:
        d = jax.lax.dot_general(
            oh, piece[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    return acc


def _edge_geometry(rij, emask, cw_ref, B, rc):
    """Forward chain rij [k,3] -> (d, inv_d, dirs, fcut, phi, diff, coeff)."""
    d2 = jnp.sum(rij * rij, axis=1, keepdims=True)
    # padded edges have rij == 0; shift their d to 1 so divisions are safe
    d = jnp.sqrt(d2 + (1.0 - emask))
    inv_d = 1.0 / d
    dirs = rij * inv_d
    f = 0.5 * (jnp.cos(d * (np.pi / rc)) + 1.0)
    fcut = jnp.where(d < rc, f, 0.0) * emask                   # [k, 1]
    centers = cw_ref[0:1, :]                                   # [1, B]
    coeff = cw_ref[1:2, :]                                     # [1, B] = -0.5/w^2
    diff = d - centers                                         # [k, B]
    phi = jnp.exp(coeff * diff * diff)
    return d, inv_d, dirs, fcut, phi, diff, coeff


# ------------------------------------------------------------------ fwd
def _geo_fwd_kernel(q_ref, d_ref, coff_ref, cw_ref, *args,
                    P, B, ks, rc):
    pos_pieces = args[: 9 * POS_PIECES]
    out_ref, scratch = args[9 * POS_PIECES], args[9 * POS_PIECES + 1]
    offs = _koffs(ks)
    coff = coff_ref[0, 0]                                      # [3, Ktot]
    for c9 in range(9):
        o0, k = offs[c9], ks[c9]
        ohj = _oh_f32(q_ref, o0, k, P)
        ohd = _oh_f32(d_ref, o0, k, P)
        emask = (q_ref[0, 0, 0, o0:o0 + k] >= 0).astype(
            jnp.float32)[:, None]
        Rj = _sel_pos(ohj, [pos_pieces[p * 9 + c9]
                            for p in range(POS_PIECES)])
        Ri = _sel_pos(ohd, [pos_pieces[p * 9 + 4]
                            for p in range(POS_PIECES)])
        rij = (Rj + coff[:, o0:o0 + k].T - Ri) * emask
        _, _, dirs, fcut, phi, _, _ = _edge_geometry(
            rij, emask, cw_ref, B, rc)
        # accumulate edge-major rows in scratch; one transpose at the end
        scratch[o0:o0 + k, :] = jnp.concatenate(
            [phi * fcut, fcut, dirs], axis=1)
    out_ref[0, 0] = scratch[:].T                               # [B+4, Ktot]


def _col_pos_specs(nx, ny, P):
    return [
        pl.BlockSpec(
            (1, 1, P, 3),
            functools.partial(
                lambda i, j, di, dj: ((i + di) % nx, (j + dj) % ny, 0, 0),
                di=di, dj=dj,
            ),
        )
        for _ in range(POS_PIECES)
        for di, dj in COL_OFFSETS
    ]


def _geo_fwd_call(R, coff_fm, qcol, dcol, cw, P, ks, rc):
    nx, ny, Ktot = qcol.shape
    B = cw.shape[1]
    pos = [p.reshape(nx, ny, P, 3) for p in _split_f32(R, POS_PIECES)]
    return pl.pallas_call(
        functools.partial(_geo_fwd_kernel, P=P, B=B, ks=ks, rc=rc),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 3, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((2, B), lambda i, j: (0, 0)),
        ] + _col_pos_specs(nx, ny, P),
        out_specs=pl.BlockSpec((1, 1, B + 4, Ktot), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, B + 4, Ktot), R.dtype),
        scratch_shapes=[pltpu.VMEM((Ktot, B + 4), jnp.float32)],
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], coff_fm, cw,
      *[p for p in pos for _ in range(9)])


# ------------------------------------------------------------------ bwd
def _geo_bwd_kernel(q_ref, d_ref, coff_ref, cw_ref, g_ref, *args,
                    P, B, ks, rc):
    pos_pieces = args[: 9 * POS_PIECES]
    outs = args[9 * POS_PIECES:]
    dRi_ref = outs[0]
    part_refs = outs[1:]
    offs = _koffs(ks)
    coff = coff_ref[0, 0]
    gT = g_ref[0, 0].T                                         # [Ktot, B+4]
    acc_i = None
    for c9 in range(9):
        o0, k = offs[c9], ks[c9]
        ohj = _oh_f32(q_ref, o0, k, P)
        ohd = _oh_f32(d_ref, o0, k, P)
        emask = (q_ref[0, 0, 0, o0:o0 + k] >= 0).astype(
            jnp.float32)[:, None]
        Rj = _sel_pos(ohj, [pos_pieces[p * 9 + c9]
                            for p in range(POS_PIECES)])
        Ri = _sel_pos(ohd, [pos_pieces[p * 9 + 4]
                            for p in range(POS_PIECES)])
        rij = (Rj + coff[:, o0:o0 + k].T - Ri) * emask
        d, inv_d, dirs, fcut, phi, diff, coeff = _edge_geometry(
            rij, emask, cw_ref, B, rc)

        g = gT[o0:o0 + k, :]                                   # [k, B+4]
        gphi = g[:, :B]
        gfc = g[:, B:B + 1]
        gdir = g[:, B + 1:B + 4]
        dphi_dd = 2.0 * coeff * diff * phi                     # [k, B]
        fp = -0.5 * (np.pi / rc) * jnp.sin(d * (np.pi / rc))
        dfcut_dd = jnp.where(d < rc, fp, 0.0) * emask          # [k, 1]
        gd = (
            jnp.sum(gphi * dphi_dd, axis=1, keepdims=True) * fcut
            + (jnp.sum(gphi * phi, axis=1, keepdims=True) + gfc) * dfcut_dd
        )
        gdr = jnp.sum(gdir * rij, axis=1, keepdims=True)
        grij = (gdir * inv_d - rij * (gdr * inv_d * inv_d * inv_d)
                + gd * dirs) * emask                           # [k, 3]
        di = jax.lax.dot_general(
            ohd, grij, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        acc_i = -di if acc_i is None else acc_i - di
        part_refs[c9][0, 0] = jax.lax.dot_general(
            ohj, grij, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
    dRi_ref[0, 0] = acc_i


def _geo_bwd_call(g, R, coff_fm, qcol, dcol, cw, P, ks, rc):
    nx, ny, Ktot = qcol.shape
    B = cw.shape[1]
    A = R.shape[0]
    pos = [p.reshape(nx, ny, P, 3) for p in _split_f32(R, POS_PIECES)]
    outs = pl.pallas_call(
        functools.partial(_geo_bwd_kernel, P=P, B=B, ks=ks, rc=rc),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 3, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((2, B), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1, B + 4, Ktot), lambda i, j: (i, j, 0, 0)),
        ] + _col_pos_specs(nx, ny, P),
        out_specs=tuple(
            pl.BlockSpec((1, 1, P, 3), lambda i, j: (i, j, 0, 0))
            for _ in range(10)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nx, ny, P, 3), R.dtype) for _ in range(10)
        ),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], coff_fm, cw, g,
      *[p for p in pos for _ in range(9)])
    dRi, partials = outs[0], outs[1:]
    dR = dRi
    for (dx, dy), p in zip(COL_OFFSETS, partials):
        dR = dR + jnp.roll(p, (dx, dy), axis=(0, 1))
    return dR.reshape(A, 3)


# ------------------------------------------------------- public op + VJP
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _column_geometry_p(R, coff_fm, qcol, dcol, cw, P, ks, rc):
    return _geo_fwd_call(R, coff_fm, qcol, dcol, cw, P, ks, rc)


def _cgeo_fwd(R, coff_fm, qcol, dcol, cw, P, ks, rc):
    out = _column_geometry_p(R, coff_fm, qcol, dcol, cw, P, ks, rc)
    return out, (R, coff_fm, qcol, dcol, cw)


def _cgeo_bwd(P, ks, rc, res, g):
    R, coff_fm, qcol, dcol, cw = res
    dR = _geo_bwd_call(g, R, coff_fm, qcol, dcol, cw, P, ks, rc)
    return dR, None, None, None, None


_column_geometry_p.defvjp(_cgeo_fwd, _cgeo_bwd)


def column_geometry(R, coff_fm, refs, centers, widths, cutoff):
    """Fused per-edge geometry for the column layout.

    Args:
        R: [A', 3] float32 positions in the sorted/padded table order.
        coff_fm: [nx, ny, 3, Ktot] feature-major Cartesian periodic
            offsets (zero at padded edge slots), in the model's units.
        refs: ColRefs.
        centers, widths: Gaussian RBF parameters [B].
        cutoff: model cutoff (cosine cutoff radius).

    Returns:
        geo [nx, ny, B+4, Ktot] feature-major with channels
        [phi * fcut (B), fcut, dir (3)].
    """
    if not _cb._impl().startswith("pallas"):
        return column_geometry_xla(R, coff_fm, refs, centers, widths, cutoff)
    cw = jnp.stack([
        jnp.asarray(centers, R.dtype),
        -0.5 / jnp.square(jnp.asarray(widths, R.dtype)),
    ])
    return _column_geometry_p(R, coff_fm, refs.qcol, refs.dcol, cw,
                              refs.P, refs.ksizes, float(cutoff))


def column_geometry_xla(R, coff_fm, refs, centers, widths, cutoff):
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
    geo = jnp.concatenate([
        phi * fcut[..., None], fcut[..., None], dirs], axis=-1)
    return jnp.moveaxis(geo, -1, 2)
