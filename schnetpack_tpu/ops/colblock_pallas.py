"""Fused Pallas kernels for the column-bucketed neighbor layout.

Kernel shape (grid = (nx, ny), everything per destination xy-column):

* the 9 source columns (whole xy-columns of the packed table, capacity
  P) arrive as windowed block views (modular index_map) and stay
  **resident** — the one-hot selection contracts over the whole column
  [P, D]; no z binning, no z-halos, no candidate-tile assembly (the
  measured bottleneck of the 27-cell kernels);
* buckets are ragged (static per-c9 capacities, packed edge axis); the
  kernel slices bucket c9 at the static offset koffs[c9], so every slice
  start is compile-time constant and sublane-aligned;
* bf16 split pieces make the selection exact to ``pieces`` terms
  (one-hot entries are exact in bf16);
* per-destination-atom sums run as a second one-hot fold over the
  in-column destination row dcol (depth P);
* backward writes 9 per-source-column partials that XLA folds with one
  roll each — scatter-free end to end.
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


def _w_precision(pieces: int):
    """Precision of the in-kernel filter matmuls (rbf @ FW and its
    transposes).  In the bf16 single-piece mode the feature data is
    already bf16, so burning 6 MXU passes on an exact-f32 filter matmul
    is wasted work — one bf16 pass matches the data precision."""
    return jax.lax.Precision.DEFAULT if pieces == 1 else HI


# Resident-table kernels: with a constant-index block spec the whole
# feature table is DMA'd into VMEM once per kernel launch and every grid
# step slices its 9 source columns out of the resident copy — instead of
# re-fetching 9 windowed views per destination column (a 9x HBM traffic
# amplification, ~0.2-0.5 ms per kernel pass at MD scales).  Only used
# when everything fits under this VMEM budget.
RESIDENT_BUDGET_BYTES = 72 * 1024 * 1024


def _resident_ok(*arrays_bytes):
    return sum(arrays_bytes) <= RESIDENT_BUDGET_BYTES


def _interp():
    return _cb._impl() == "pallas_interpret"


def _koffs(ksizes):
    out, acc = [], 0
    for k in ksizes:
        out.append(acc)
        acc += k
    return tuple(out) + (acc,)


def _vmem_params():
    return pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _cols(table, nx, ny, P):
    """[nx, ny, P, D] column view of the packed table (pure reshape)."""
    return table.reshape(nx, ny, P, table.shape[-1])


def _col_view_specs(nx, ny, rows, D, pieces):
    return [
        pl.BlockSpec(
            (1, 1, rows, D),
            functools.partial(
                lambda i, j, di, dj: ((i + di) % nx, (j + dj) % ny, 0, 0),
                di=di, dj=dj,
            ),
        )
        for _ in range(pieces)
        for di, dj in COL_OFFSETS
    ]


def _fold_partials(partials, nx, ny, P, D):
    """Fold 9 per-source-column partials back onto the table (rolls only)."""
    dT = None
    for (dx, dy), p in zip(COL_OFFSETS, partials):
        r = jnp.roll(p, (dx, dy), axis=(0, 1))
        dT = r if dT is None else dT + r
    return dT.reshape(nx * ny * P, D)


def _oh(idx_ref, off, k, depth):
    """One-hot [k, depth] for packed rows [off, off+k) (-1 -> zero row)."""
    v = idx_ref[0, 0, 0, off:off + k]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, depth), 1)
    return (v[:, None] == iota).astype(jnp.bfloat16)


def _gather_bucket(cols, oh, c9, pieces):
    """[k, D] selection of source rows from the resident halo'd column."""
    acc = None
    for piece in range(pieces):
        d = jax.lax.dot_general(
            oh, cols[piece * 9 + c9][0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    return acc


# ---------------------------------------------------------------- gather
def _gather_fwd_kernel(q_ref, *args, P, ks, pieces):
    cols, out_ref = args[:9 * pieces], args[9 * pieces]
    offs = _koffs(ks)
    for c9 in range(9):
        oh = _oh(q_ref, offs[c9], ks[c9], P)
        out_ref[0, 0, offs[c9]:offs[c9] + ks[c9]] = _gather_bucket(
            cols, oh, c9, pieces)


def _gather_fwd_call(table, qcol, P, ks, pieces):
    nx, ny, Ktot = qcol.shape
    D = table.shape[-1]
    rows = P
    halos = [_cols(p, nx, ny, P) for p in _split_f32(table, pieces)]
    return pl.pallas_call(
        functools.partial(_gather_fwd_kernel, P=P, ks=ks,
                          pieces=pieces),
        grid=(nx, ny),
        in_specs=[pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0))]
        + _col_view_specs(nx, ny, rows, D, pieces),
        out_specs=pl.BlockSpec((1, 1, Ktot, D), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, Ktot, D), table.dtype),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], *[h for h in halos for _ in range(9)])


def _gather_bwd_kernel(q_ref, g_ref, *out_refs, P, ks, pieces):
    offs = _koffs(ks)
    for c9 in range(9):
        oh = _oh(q_ref, offs[c9], ks[c9], P)
        acc = None
        for piece in _split_f32(g_ref[0, 0, offs[c9]:offs[c9] + ks[c9]],
                                pieces):
            d = jax.lax.dot_general(
                oh, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        out_refs[c9][0, 0] = acc


def _gather_bwd_call(g, qcol, P, ks, pieces):
    nx, ny, Ktot = qcol.shape
    D = g.shape[-1]
    rows = P
    partials = pl.pallas_call(
        functools.partial(_gather_bwd_kernel, P=P, ks=ks,
                          pieces=pieces),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, D), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 1, rows, D), lambda i, j: (i, j, 0, 0))
            for _ in range(9)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nx, ny, rows, D), g.dtype) for _ in range(9)
        ),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], g)
    return _fold_partials(partials, nx, ny, P, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _column_gather_p(table, qcol, P, ks):
    return _gather_fwd_call(table, qcol, P, ks, _cb.PIECES)


def _cg_fwd(table, qcol, P, ks):
    return _column_gather_p(table, qcol, P, ks), (table.shape, qcol)


def _cg_bwd(P, ks, res, g):
    table_shape, qcol = res
    dT = _gather_bwd_call(g, qcol, P, ks, _cb.PIECES)
    return dT.reshape(table_shape), None


_column_gather_p.defvjp(_cg_fwd, _cg_bwd)


def column_gather_pallas(table, refs):
    return _column_gather_p(table, refs.qcol, refs.P, refs.ksizes)


# --------------------------------------------------------- expand / fold
def _expand_fwd_kernel(d_ref, *args, P, ks, pieces):
    tbls, out_ref = args[:pieces], args[pieces]
    offs = _koffs(ks)
    for c9 in range(9):
        oh = _oh(d_ref, offs[c9], ks[c9], P)
        acc = None
        for piece in range(pieces):
            d = jax.lax.dot_general(
                oh, tbls[piece][0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        out_ref[0, 0, offs[c9]:offs[c9] + ks[c9]] = acc


def _expand_call(table, dcol, P, ks, pieces):
    nx, ny, Ktot = dcol.shape
    D = table.shape[-1]
    tcols = [p.reshape(nx, ny, P, D) for p in _split_f32(table, pieces)]
    return pl.pallas_call(
        functools.partial(_expand_fwd_kernel, P=P, ks=ks,
                          pieces=pieces),
        grid=(nx, ny),
        in_specs=[pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0))]
        + [pl.BlockSpec((1, 1, P, D), lambda i, j: (i, j, 0, 0))
           for _ in range(pieces)],
        out_specs=pl.BlockSpec((1, 1, Ktot, D), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, Ktot, D), table.dtype),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(dcol[:, :, None, :], *tcols)


def _fold_fwd_kernel(d_ref, g_ref, out_ref, *, P, ks, pieces):
    offs = _koffs(ks)
    acc = None
    for c9 in range(9):
        oh = _oh(d_ref, offs[c9], ks[c9], P)
        for piece in _split_f32(g_ref[0, 0, offs[c9]:offs[c9] + ks[c9]],
                                pieces):
            d = jax.lax.dot_general(
                oh, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
    out_ref[0, 0] = acc


def _fold_call(edge_vals, dcol, P, ks, pieces):
    nx, ny, Ktot = dcol.shape
    D = edge_vals.shape[-1]
    out = pl.pallas_call(
        functools.partial(_fold_fwd_kernel, P=P, ks=ks, pieces=pieces),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, D), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, P, D), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, P, D), edge_vals.dtype),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(dcol[:, :, None, :], edge_vals)
    return out.reshape(nx * ny * P, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _column_expand_p(table, dcol, P, ks):
    return _expand_call(table, dcol, P, ks, _cb.PIECES)


def _ce_fwd(table, dcol, P, ks):
    return _column_expand_p(table, dcol, P, ks), (table.shape, dcol)


def _ce_bwd(P, ks, res, g):
    table_shape, dcol = res
    dT = _fold_call(g, dcol, P, ks, _cb.PIECES)
    return dT.reshape(table_shape), None


_column_expand_p.defvjp(_ce_fwd, _ce_bwd)


def column_expand_pallas(table, refs):
    return _column_expand_p(table, refs.dcol, refs.P, refs.ksizes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _column_fold_p(edge_vals, dcol, P, ks):
    return _fold_call(edge_vals, dcol, P, ks, _cb.PIECES)


def _cf_fwd(edge_vals, dcol, P, ks):
    return _column_fold_p(edge_vals, dcol, P, ks), (edge_vals.shape, dcol)


def _cf_bwd(P, ks, res, g):
    ev_shape, dcol = res
    dE = _expand_call(g, dcol, P, ks, _cb.PIECES)
    return dE.reshape(ev_shape), None


_column_fold_p.defvjp(_cf_fwd, _cf_bwd)


def column_fold_pallas(edge_vals, refs):
    return _column_fold_p(edge_vals, refs.dcol, refs.P, refs.ksizes)


# --------------------------------------------------- fused PaiNN message
def _msg_fwd_kernel(q_ref, d_ref, rbf_ref, dir_ref, FW_ref, *args,
                    P, F, ks, pieces):
    cols = args[:9 * pieces]
    dq_ref, dmu_ref = args[9 * pieces:]
    offs = _koffs(ks)
    acc = None
    for c9 in range(9):
        o0, k = offs[c9], ks[c9]
        ohj = _oh(q_ref, o0, k, P)
        xmu_j = _gather_bucket(cols, ohj, c9, pieces)     # [k, 6F]
        xj = xmu_j[:, : 3 * F]
        W = jax.lax.dot_general(
            rbf_ref[0, 0, o0:o0 + k], FW_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        xjW = xj * W
        dqe = xjW[:, :F]
        dmuR = xjW[:, F:2 * F]
        dmumu = xjW[:, 2 * F:]
        dirs = dir_ref[0, 0, o0:o0 + k]                   # [k, 3]
        parts = [dqe]
        for x in range(3):
            mujx = xmu_j[:, (3 + x) * F:(4 + x) * F]
            parts.append(dmuR * dirs[:, x:x + 1] + dmumu * mujx)
        msg = jnp.concatenate(parts, axis=-1)             # [k, 4F]
        ohd = _oh(d_ref, o0, k, P)
        for piece in _split_f32(msg, pieces):
            d = jax.lax.dot_general(
                ohd, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d           # [P, 4F]
    dq_ref[0, 0] = acc[:, :F]
    dmu_ref[0, 0] = acc[:, F:]


def _msg_fwd_call(xmu, rbf_aug, dir_e, FW_aug, qcol, dcol, P, ks, pieces):
    nx, ny, Ktot = qcol.shape
    A, D6 = xmu.shape
    F = D6 // 6
    B1 = rbf_aug.shape[-1]
    rows = P
    halos = [_cols(p, nx, ny, P) for p in _split_f32(xmu, pieces)]
    dq, dmu = pl.pallas_call(
        functools.partial(_msg_fwd_kernel, P=P, F=F, ks=ks,
                          pieces=pieces),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, B1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, 3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
        ] + _col_view_specs(nx, ny, rows, D6, pieces),
        out_specs=(
            pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, P, 3 * F), lambda i, j: (i, j, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nx, ny, P, F), xmu.dtype),
            jax.ShapeDtypeStruct((nx, ny, P, 3 * F), xmu.dtype),
        ),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], rbf_aug, dir_e, FW_aug,
      *[h for h in halos for _ in range(9)])
    return dq.reshape(A, F), dmu.reshape(A, 3 * F)


def _msg_bwd_kernel(q_ref, d_ref, rbf_ref, dir_ref, FW_ref, gq_ref, gmu_ref,
                    *args, P, F, ks, pieces):
    cols = args[:9 * pieces]
    outs = args[9 * pieces:]
    part_refs = outs[:9]
    grbf_ref, gdir_ref, gFW_ref = outs[9:]
    offs = _koffs(ks)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        gFW_ref[...] = jnp.zeros_like(gFW_ref)

    gcat = jnp.concatenate([gq_ref[0, 0], gmu_ref[0, 0]], axis=-1)  # [nzC,4F]
    gcat_pieces = _split_f32(gcat, pieces)
    for c9 in range(9):
        o0, k = offs[c9], ks[c9]
        ohj = _oh(q_ref, o0, k, P)
        ohd = _oh(d_ref, o0, k, P)
        # --- recompute forward intermediates --------------------------
        xmu_j = _gather_bucket(cols, ohj, c9, pieces)
        xj = xmu_j[:, : 3 * F]
        rbf = rbf_ref[0, 0, o0:o0 + k]
        W = jax.lax.dot_general(
            rbf, FW_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        xjW = xj * W
        dmuR = xjW[:, F:2 * F]
        dmumu = xjW[:, 2 * F:]
        dirs = dir_ref[0, 0, o0:o0 + k]
        # --- per-edge cotangents (expand over dcol) -------------------
        gmsg = None
        for piece in gcat_pieces:
            d = jax.lax.dot_general(
                ohd, piece, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gmsg = d if gmsg is None else gmsg + d         # [k, 4F]
        gqe = gmsg[:, :F]
        gdmuR = None
        gdmumu = None
        gdir_parts = []
        gmuj_parts = []
        for x in range(3):
            gmux = gmsg[:, (1 + x) * F:(2 + x) * F]
            mujx = xmu_j[:, (3 + x) * F:(4 + x) * F]
            t = gmux * dirs[:, x:x + 1]
            gdmuR = t if gdmuR is None else gdmuR + t
            t2 = gmux * mujx
            gdmumu = t2 if gdmumu is None else gdmumu + t2
            gmuj_parts.append(gmux * dmumu)
            gdir_parts.append(jnp.sum(gmux * dmuR, axis=-1, keepdims=True))
        gxjW = jnp.concatenate([gqe, gdmuR, gdmumu], axis=-1)  # [k, 3F]
        gxj = gxjW * W
        gW = gxjW * xj
        grbf_ref[0, 0, o0:o0 + k] = jax.lax.dot_general(
            gW, FW_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        gdir_ref[0, 0, o0:o0 + k] = jnp.concatenate(gdir_parts, axis=-1)
        gFW_ref[...] += jax.lax.dot_general(
            rbf, gW, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        gxmu_e = jnp.concatenate([gxj] + gmuj_parts, axis=-1)  # [k, 6F]
        acc = None
        for piece in _split_f32(gxmu_e, pieces):
            d = jax.lax.dot_general(
                ohj, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d             # [rows, 6F]
        part_refs[c9][0, 0] = acc


def _msg_bwd_call(xmu, rbf_aug, dir_e, FW_aug, qcol, dcol, cots,
                  P, ks, pieces):
    g_dq, g_dmu = cots
    nx, ny, Ktot = qcol.shape
    A, D6 = xmu.shape
    F = D6 // 6
    B1 = rbf_aug.shape[-1]
    rows = P
    halos = [_cols(p, nx, ny, P) for p in _split_f32(xmu, pieces)]
    gq5 = g_dq.reshape(nx, ny, P, F)
    gmu5 = g_dmu.reshape(nx, ny, P, 3 * F)

    outs = pl.pallas_call(
        functools.partial(_msg_bwd_kernel, P=P, F=F, ks=ks,
                          pieces=pieces),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, B1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, 3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, P, 3 * F), lambda i, j: (i, j, 0, 0)),
        ] + _col_view_specs(nx, ny, rows, D6, pieces),
        out_specs=tuple(
            pl.BlockSpec((1, 1, rows, D6), lambda i, j: (i, j, 0, 0))
            for _ in range(9)
        ) + (
            pl.BlockSpec((1, 1, Ktot, B1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, 3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nx, ny, rows, D6), xmu.dtype)
            for _ in range(9)
        ) + (
            jax.ShapeDtypeStruct((nx, ny, Ktot, B1), xmu.dtype),
            jax.ShapeDtypeStruct((nx, ny, Ktot, 3), xmu.dtype),
            jax.ShapeDtypeStruct((B1, 3 * F), xmu.dtype),
        ),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], rbf_aug, dir_e, FW_aug, gq5, gmu5,
      *[h for h in halos for _ in range(9)])
    partials, grbf, gdir, gFW = outs[:9], outs[9], outs[10], outs[11]
    dxmu = _fold_partials(partials, nx, ny, P, D6)
    return dxmu.reshape(A, D6), grbf, gdir, gFW


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _painn_message_p(xmu, rbf_aug, dir_e, FW_aug, qcol, dcol, P, ks):
    return _msg_fwd_call(xmu, rbf_aug, dir_e, FW_aug, qcol, dcol,
                         P, ks, _cb.PIECES)


def _pm_fwd(xmu, rbf_aug, dir_e, FW_aug, qcol, dcol, P, ks):
    out = _painn_message_p(xmu, rbf_aug, dir_e, FW_aug, qcol, dcol, P, ks)
    return out, (xmu, rbf_aug, dir_e, FW_aug, qcol, dcol)


def _pm_bwd(P, ks, res, cots):
    xmu, rbf_aug, dir_e, FW_aug, qcol, dcol = res
    dxmu, grbf, gdir, gFW = _msg_bwd_call(
        xmu, rbf_aug, dir_e, FW_aug, qcol, dcol, cots, P, ks, _cb.PIECES)
    return dxmu, grbf, gdir, gFW, None, None


_painn_message_p.defvjp(_pm_fwd, _pm_bwd)


def painn_message_columns_pallas(xmu, rbf_aug, dir_e, FW_aug, refs):
    return _painn_message_p(xmu, rbf_aug, dir_e, FW_aug,
                            refs.qcol, refs.dcol, refs.P, refs.ksizes)


# ------------------------------- feature-major fused PaiNN message
# The per-edge geometry (rbf_aug 21ch + dir 3ch) arrives as ONE
# feature-major tensor geo [nx, ny, 24, Ktot]: with the edge axis minor
# there is no (8,128)-tile lane padding (the edge-major [.., Ktot, 21] and
# [.., Ktot, 3] layouts inflate 6x/43x in HBM).  The kernel transposes the
# resident [24, Ktot] block once per grid step (VPU shuffle, ~200 KB) and
# slices buckets along sublanes.

def _msg_edge(xj, mu_j, rbf, dirs, FW_ref, F, wprec):
    """Shared per-bucket message math: [k, 3F]+[k, 3F] sources -> [k, 4F]
    messages."""
    W = jax.lax.dot_general(
        rbf, FW_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=wprec,
    )
    xjW = xj * W
    dqe = xjW[:, :F]
    dmuR = xjW[:, F:2 * F]
    dmumu = xjW[:, 2 * F:]
    parts = [dqe]
    for x in range(3):
        mujx = mu_j[:, x * F:(x + 1) * F]
        parts.append(dmuR * dirs[:, x:x + 1] + dmumu * mujx)
    return jnp.concatenate(parts, axis=-1)             # [k, 4F]


def _msg_fm_fwd_kernel(q_ref, d_ref, FW_ref, *args,
                       P, F, B1, ks, pieces, gpk=False):
    ngeo = 1 if gpk else 9
    geo_refs = args[:ngeo]
    xcols = args[ngeo:ngeo + 9 * pieces]
    mucols = args[ngeo + 9 * pieces:ngeo + 18 * pieces]
    dq_ref, dmu_ref = args[ngeo + 18 * pieces:]
    offs = _koffs(ks)
    acc = None
    wprec = _w_precision(pieces)
    for c9 in range(9):
        o0, k = offs[c9], ks[c9]
        ohj = _oh(q_ref, o0, k, P)
        xj = _gather_bucket(xcols, ohj, c9, pieces)    # [k, 3F]
        mu_j = _gather_bucket(mucols, ohj, c9, pieces)  # [k, 3F]
        geo = (geo_refs[0][0, 0, :, o0:o0 + k] if gpk
               else geo_refs[c9][0, 0]).T              # [k, B1+3(+1)]
        rbf = geo[:, :B1]
        dirs = geo[:, B1:B1 + 3]
        msg = _msg_edge(xj, mu_j, rbf, dirs, FW_ref, F, wprec)
        ohd = _oh(d_ref, o0, k, P)
        for piece in _split_f32(msg, pieces):
            d = jax.lax.dot_general(
                ohd, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d        # [P, 4F]
    dq_ref[0, 0] = acc[:, :F]
    dmu_ref[0, 0] = acc[:, F:]


def _msg_fm_fwd_res_kernel(q_ref, d_ref, FW_ref, *args,
                           nx, ny, P, F, B1, ks, pieces, gpk=False):
    """Resident-table forward: the whole (bf16-piece) feature table sits
    in VMEM; each grid step slices its 9 source columns from it."""
    ngeo = 1 if gpk else 9
    geo_refs = args[:ngeo]
    xcols = args[ngeo:ngeo + pieces]                   # [nx, ny, P, 3F]
    mucols = args[ngeo + pieces:ngeo + 2 * pieces]     # [nx, ny, P, 3F]
    dq_ref, dmu_ref = args[ngeo + 2 * pieces:]
    offs = _koffs(ks)
    i = pl.program_id(0)
    j = pl.program_id(1)
    acc = None
    wprec = _w_precision(pieces)

    def _sel(cols, ohj, xi, yj):
        acc_s = None
        for p in range(pieces):
            d = jax.lax.dot_general(
                ohj, cols[p][xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_s = d if acc_s is None else acc_s + d
        return acc_s

    # per-bucket messages are CONCATENATED and folded with ONE full-depth
    # dot: a per-bucket fold contracts over k (padded up to the MXU
    # contraction tile), so 9 shallow dots waste up to ~30% of the fold
    # FLOPs on ragged bucket sizes; one depth-Ktot dot pads only once.
    msgs = []
    for c9, (di, dj) in enumerate(COL_OFFSETS):
        o0, k = offs[c9], ks[c9]
        xi = jax.lax.rem(i + di + nx, nx)
        yj = jax.lax.rem(j + dj + ny, ny)
        ohj = _oh(q_ref, o0, k, P)
        xj = _sel(xcols, ohj, xi, yj)
        mu_j = _sel(mucols, ohj, xi, yj)
        geo = (geo_refs[0][0, 0, :, o0:o0 + k] if gpk
               else geo_refs[c9][0, 0]).T              # [k, B1+3(+1)]
        rbf = geo[:, :B1]
        dirs = geo[:, B1:B1 + 3]
        msgs.append(_msg_edge(xj, mu_j, rbf, dirs, FW_ref, F, wprec))
    msg_all = jnp.concatenate(msgs, axis=0)            # [Ktot, 4F]
    ohd_all = _oh(d_ref, 0, offs[9], P)
    for piece in _split_f32(msg_all, pieces):
        d = jax.lax.dot_general(
            ohd_all, piece, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    dq_ref[0, 0] = acc[:, :F]
    dmu_ref[0, 0] = acc[:, F:]


def _geo_specs(ks, B1):
    return [
        pl.BlockSpec((1, 1, B1 + 3, k), lambda i, j: (i, j, 0, 0))
        for k in ks
    ]


# ---------------------------------------------------------------- preoh
# Precomputed one-hot selection matrices (ColRefs.oh): the per-bucket VPU
# iota/compare/convert chains were measured to serialize with the MXU dots
# (scripts/kb_r5.py: resident fwd 1.21 -> 0.79 ms/pass when the one-hots
# stream from HBM instead).  The arrays are static between NBL rebuilds.

def _own_oh_specs(ks, P):
    """Own-column bucket views [1, 1, k_c9, P] (forward: dest-centric)."""
    return [
        pl.BlockSpec((1, 1, k, P), lambda i, j: (i, j, 0, 0)) for k in ks
    ]


def _dest_oh_specs(nx, ny, ks, P):
    """Dest-column bucket views for the source-centric backward."""
    return [
        pl.BlockSpec(
            (1, 1, k, P),
            functools.partial(
                lambda i, j, dx, dy: ((i - dx) % nx, (j - dy) % ny, 0, 0),
                dx=dx, dy=dy,
            ),
        )
        for k, (dx, dy) in zip(ks, COL_OFFSETS)
    ]


def _msg_fm_fwd_res_preoh_kernel(FW_ref, *args, nx, ny, P, F, B1, ks,
                                 pieces, gpk=False):
    """Resident-table forward with PRECOMPUTED one-hots (no VPU build)."""
    ngeo = 1 if gpk else 9
    geo_refs = args[:ngeo]
    ohj_refs = args[ngeo:ngeo + 9]
    ohd_ref = args[ngeo + 9]
    xcols = args[ngeo + 10:ngeo + 10 + pieces]
    mucols = args[ngeo + 10 + pieces:ngeo + 10 + 2 * pieces]
    dq_ref, dmu_ref = args[ngeo + 10 + 2 * pieces:]
    offs = _koffs(ks)
    i = pl.program_id(0)
    j = pl.program_id(1)
    wprec = _w_precision(pieces)

    def _sel(cols, ohj, xi, yj):
        acc_s = None
        for p in range(pieces):
            d = jax.lax.dot_general(
                ohj, cols[p][xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_s = d if acc_s is None else acc_s + d
        return acc_s

    msgs = []
    for c9, (di, dj) in enumerate(COL_OFFSETS):
        o0, k = offs[c9], ks[c9]
        xi = jax.lax.rem(i + di + nx, nx)
        yj = jax.lax.rem(j + dj + ny, ny)
        ohj = ohj_refs[c9][0, 0]
        xj = _sel(xcols, ohj, xi, yj)
        mu_j = _sel(mucols, ohj, xi, yj)
        geo = (geo_refs[0][0, 0, :, o0:o0 + k] if gpk
               else geo_refs[c9][0, 0]).T
        rbf = geo[:, :B1]
        dirs = geo[:, B1:B1 + 3]
        msgs.append(_msg_edge(xj, mu_j, rbf, dirs, FW_ref, F, wprec))
    msg_all = jnp.concatenate(msgs, axis=0)            # [Ktot, 4F]
    acc = None
    for piece in _split_f32(msg_all, pieces):
        d = jax.lax.dot_general(
            ohd_ref[0, 0], piece, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    dq_ref[0, 0] = acc[:, :F]
    dmu_ref[0, 0] = acc[:, F:]


def _msg_fm_fwd_call(x, mu, geo, FW_aug, qcol, dcol, P, ks, pieces,
                     oh=None):
    nx, ny, Ktot = qcol.shape
    A, D3 = x.shape
    F = D3 // 3
    B1 = FW_aug.shape[0]
    gpk = not isinstance(geo, (tuple, list))
    if gpk:
        geo_specs = [pl.BlockSpec((1, 1, geo.shape[2], Ktot),
                                  lambda i, j: (i, j, 0, 0))]
        geo = (geo,)
    else:
        geo_specs = _geo_specs(ks, B1)
    if oh is not None and _resident_ok(A * D3 * 4 * pieces):
        ohj_parts, ohd_full, _ = oh
        xt = [_cols(p, nx, ny, P) for p in _split_f32(x, pieces)]
        mt = [_cols(p, nx, ny, P) for p in _split_f32(mu, pieces)]
        dq, dmu = pl.pallas_call(
            functools.partial(_msg_fm_fwd_res_preoh_kernel, nx=nx, ny=ny,
                              P=P, F=F, B1=B1, ks=ks, pieces=pieces,
                              gpk=gpk),
            grid=(nx, ny),
            in_specs=[
                pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
            ] + geo_specs + _own_oh_specs(ks, P) + [
                pl.BlockSpec((1, 1, Ktot, P), lambda i, j: (i, j, 0, 0)),
            ] + [
                pl.BlockSpec((nx, ny, P, D3), lambda i, j: (0, 0, 0, 0))
                for _ in range(2 * pieces)
            ],
            out_specs=(
                pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, P, 3 * F), lambda i, j: (i, j, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nx, ny, P, F), x.dtype),
                jax.ShapeDtypeStruct((nx, ny, P, 3 * F), x.dtype),
            ),
            compiler_params=_vmem_params(),
            interpret=_interp(),
        )(FW_aug, *geo, *ohj_parts, ohd_full, *xt, *mt)
        return dq.reshape(A, F), dmu.reshape(A, 3 * F)
    if _resident_ok(A * D3 * 4 * pieces):
        xt = [_cols(p, nx, ny, P) for p in _split_f32(x, pieces)]
        mt = [_cols(p, nx, ny, P) for p in _split_f32(mu, pieces)]
        dq, dmu = pl.pallas_call(
            functools.partial(_msg_fm_fwd_res_kernel, nx=nx, ny=ny, P=P,
                              F=F, B1=B1, ks=ks, pieces=pieces, gpk=gpk),
            grid=(nx, ny),
            in_specs=[
                pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
            ] + geo_specs + [
                pl.BlockSpec((nx, ny, P, D3), lambda i, j: (0, 0, 0, 0))
                for _ in range(2 * pieces)
            ],
            out_specs=(
                pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, P, 3 * F), lambda i, j: (i, j, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nx, ny, P, F), x.dtype),
                jax.ShapeDtypeStruct((nx, ny, P, 3 * F), x.dtype),
            ),
            compiler_params=_vmem_params(),
            interpret=_interp(),
        )(qcol[:, :, None, :], dcol[:, :, None, :], FW_aug, *geo, *xt, *mt)
        return dq.reshape(A, F), dmu.reshape(A, 3 * F)
    xh = [_cols(p, nx, ny, P) for p in _split_f32(x, pieces)]
    mh = [_cols(p, nx, ny, P) for p in _split_f32(mu, pieces)]
    dq, dmu = pl.pallas_call(
        functools.partial(_msg_fm_fwd_kernel, P=P, F=F, B1=B1, ks=ks,
                          pieces=pieces, gpk=gpk),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
        ] + geo_specs + _col_view_specs(nx, ny, P, D3, pieces)
        + _col_view_specs(nx, ny, P, D3, pieces),
        out_specs=(
            pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, P, 3 * F), lambda i, j: (i, j, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nx, ny, P, F), x.dtype),
            jax.ShapeDtypeStruct((nx, ny, P, 3 * F), x.dtype),
        ),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], FW_aug, *geo,
      *[h for h in xh for _ in range(9)],
      *[h for h in mh for _ in range(9)])
    return dq.reshape(A, F), dmu.reshape(A, 3 * F)


def _msg_fm_bwd_src_kernel(FW_ref, *args, P, F, B1, ks, pieces):
    """SOURCE-centric backward: grid step (xs, ys) recomputes every edge
    whose SOURCE atom lives in its own column (bucket c9 of destination
    column (xs-dx, ys-dy)), so the feature cotangent accumulates in VMEM
    for exactly one owned column — no per-source-column partial arrays,
    no roll-fold in XLA."""
    qs = args[:9]
    ds = args[9:18]
    geos = args[18:27]
    gqs = args[27:36]
    gmus = args[36:45]
    xcols = args[45:45 + pieces]
    mucols = args[45 + pieces:45 + 2 * pieces]
    outs = args[45 + 2 * pieces:]
    dx_ref = outs[0]
    dmu_ref = outs[1]
    ggeo_refs = outs[2:11]
    gFW_ref = outs[11]
    offs = _koffs(ks)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        gFW_ref[...] = jnp.zeros_like(gFW_ref)

    def _sel_own(cols, ohj):
        acc_s = None
        for piece in range(pieces):
            d = jax.lax.dot_general(
                ohj, cols[piece][0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_s = d if acc_s is None else acc_s + d
        return acc_s

    acc_dx = None
    acc_dmu = None
    for c9 in range(9):
        o0, k = offs[c9], ks[c9]
        ohj = _oh(qs[c9], o0, k, P)
        ohd = _oh(ds[c9], o0, k, P)
        geo = geos[c9][0, 0].T                            # [k, B1+3]
        rbf = geo[:, :B1]
        dirs = geo[:, B1:B1 + 3]
        # recompute forward intermediates (sources are in MY column)
        xj = _sel_own(xcols, ohj)
        mu_j = _sel_own(mucols, ohj)
        W = jax.lax.dot_general(
            rbf, FW_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        xjW = xj * W
        dmuR = xjW[:, F:2 * F]
        dmumu = xjW[:, 2 * F:]
        gcat = jnp.concatenate([gqs[c9][0, 0], gmus[c9][0, 0]], axis=-1)
        gmsg = None
        for piece in _split_f32(gcat, pieces):
            d = jax.lax.dot_general(
                ohd, piece, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gmsg = d if gmsg is None else gmsg + d         # [k, 4F]
        gqe = gmsg[:, :F]
        gdmuR = None
        gdmumu = None
        gdir_parts = []
        gmuj_parts = []
        for x in range(3):
            gmux = gmsg[:, (1 + x) * F:(2 + x) * F]
            mujx = mu_j[:, x * F:(x + 1) * F]
            t = gmux * dirs[:, x:x + 1]
            gdmuR = t if gdmuR is None else gdmuR + t
            t2 = gmux * mujx
            gdmumu = t2 if gdmumu is None else gdmumu + t2
            gmuj_parts.append(gmux * dmumu)
            gdir_parts.append(jnp.sum(gmux * dmuR, axis=-1, keepdims=True))
        gxjW = jnp.concatenate([gqe, gdmuR, gdmumu], axis=-1)
        gxj = gxjW * W
        gW = gxjW * xj
        grbf = jax.lax.dot_general(
            gW, FW_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        ggeo_refs[c9][0, 0] = jnp.concatenate(
            [grbf] + gdir_parts, axis=-1).T               # [B1+3, k]
        gFW_ref[...] += jax.lax.dot_general(
            rbf, gW, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        gmu_e = jnp.concatenate(gmuj_parts, axis=-1)
        for piece in _split_f32(gxj, pieces):
            d = jax.lax.dot_general(
                ohj, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_dx = d if acc_dx is None else acc_dx + d   # [P, 3F]
        for piece in _split_f32(gmu_e, pieces):
            d = jax.lax.dot_general(
                ohj, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_dmu = d if acc_dmu is None else acc_dmu + d  # [P, 3F]
    dx_ref[0, 0] = acc_dx
    dmu_ref[0, 0] = acc_dmu


def _oh_vec(v, depth):
    """One-hot [k, depth] (bf16) from a raw lane vector of row indices."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], depth), 1)
    return (v[:, None] == iota).astype(jnp.bfloat16)


def _msg_fm_bwd_src_res_kernel(q_ref, d_ref, FW_ref, gq_ref,
                               gmu_ref, *args, nx, ny, P, F, B1, ks,
                               pieces):
    """Resident-table source-centric backward: gq / gmu / qcol / dcol sit
    whole in VMEM; each grid step slices bucket c9 of the 9 DESTINATION
    columns out of the resident copies (the edges whose source lives in
    its own column).  The per-bucket geo parts arrive as 9 block refs
    whose index maps already point at the destination column."""
    geos = args[:9]                            # [B1+3, k_c9] dest blocks
    xcols = args[9:9 + pieces]                 # own x column views
    mucols = args[9 + pieces:9 + 2 * pieces]   # own mu column views
    outs = args[9 + 2 * pieces:]
    dx_ref = outs[0]
    dmu_ref = outs[1]
    ggeo_refs = outs[2:11]
    gFW_ref = outs[11]
    offs = _koffs(ks)
    i = pl.program_id(0)
    j = pl.program_id(1)
    wprec = _w_precision(pieces)

    @pl.when((i == 0) & (j == 0))
    def _():
        gFW_ref[...] = jnp.zeros_like(gFW_ref)

    def _sel_own(cols, ohj):
        acc_s = None
        for p in range(pieces):
            d = jax.lax.dot_general(
                ohj, cols[p][0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_s = d if acc_s is None else acc_s + d
        return acc_s

    acc_dx = None
    acc_dmu = None
    for c9, (dx, dy) in enumerate(COL_OFFSETS):
        o0, k = offs[c9], ks[c9]
        xi = jax.lax.rem(i - dx + nx, nx)
        yj = jax.lax.rem(j - dy + ny, ny)
        qv = q_ref[xi, yj, 0, o0:o0 + k]
        dv = d_ref[xi, yj, 0, o0:o0 + k]
        ohj = _oh_vec(qv, P)
        ohd = _oh_vec(dv, P)
        geoT = geos[c9][0, 0].T                            # [k, B1+3]
        rbf = geoT[:, :B1]
        dirs = geoT[:, B1:B1 + 3]
        # recompute forward intermediates (sources are in MY column)
        xj = _sel_own(xcols, ohj)
        mu_j = _sel_own(mucols, ohj)
        W = jax.lax.dot_general(
            rbf, FW_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=wprec,
        )
        xjW = xj * W
        dmuR = xjW[:, F:2 * F]
        dmumu = xjW[:, 2 * F:]
        gcat = jnp.concatenate([gq_ref[xi, yj], gmu_ref[xi, yj]], axis=-1)
        gmsg = None
        for piece in _split_f32(gcat, pieces):
            d = jax.lax.dot_general(
                ohd, piece, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gmsg = d if gmsg is None else gmsg + d         # [k, 4F]
        gqe = gmsg[:, :F]
        gdmuR = None
        gdmumu = None
        gdir_parts = []
        gmuj_parts = []
        for x in range(3):
            gmux = gmsg[:, (1 + x) * F:(2 + x) * F]
            mujx = mu_j[:, x * F:(x + 1) * F]
            t = gmux * dirs[:, x:x + 1]
            gdmuR = t if gdmuR is None else gdmuR + t
            t2 = gmux * mujx
            gdmumu = t2 if gdmumu is None else gdmumu + t2
            gmuj_parts.append(gmux * dmumu)
            gdir_parts.append(jnp.sum(gmux * dmuR, axis=-1, keepdims=True))
        gxjW = jnp.concatenate([gqe, gdmuR, gdmumu], axis=-1)
        gxj = gxjW * W
        gW = gxjW * xj
        grbf = jax.lax.dot_general(
            gW, FW_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=wprec,
        )
        ggeo_refs[c9][0, 0] = jnp.concatenate(
            [grbf] + gdir_parts, axis=-1).T               # [B1+3, k]
        gFW_ref[...] += jax.lax.dot_general(
            rbf, gW, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=wprec,
        )
        gmu_e = jnp.concatenate(gmuj_parts, axis=-1)
        for piece in _split_f32(gxj, pieces):
            d = jax.lax.dot_general(
                ohj, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_dx = d if acc_dx is None else acc_dx + d   # [P, 3F]
        for piece in _split_f32(gmu_e, pieces):
            d = jax.lax.dot_general(
                ohj, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_dmu = d if acc_dmu is None else acc_dmu + d  # [P, 3F]
    dx_ref[0, 0] = acc_dx
    dmu_ref[0, 0] = acc_dmu


def _dest_geo_specs(nx, ny, ks, B1):
    """Block view of geo bucket c9 at the DEST column (xs - dx, ys - dy):
    used for both the bwd kernels' geo inputs and their ggeo outputs, so
    the gradient parts land dest-aligned and need no roll/concatenate."""
    return [
        pl.BlockSpec(
            (1, 1, B1 + 3, k),
            functools.partial(
                lambda i, j, dx, dy: ((i - dx) % nx, (j - dy) % ny, 0, 0),
                dx=dx, dy=dy,
            ),
        )
        for k, (dx, dy) in zip(ks, COL_OFFSETS)
    ]


def _msg_fm_bwd_res_call(x, mu, geo, FW_aug, qcol, dcol, cots, P, ks,
                         pieces):
    g_dq, g_dmu = cots
    nx, ny, Ktot = qcol.shape
    A, D3 = x.shape
    F = D3 // 3
    B1 = FW_aug.shape[0]
    xh = [_cols(p, nx, ny, P) for p in _split_f32(x, pieces)]
    mh = [_cols(p, nx, ny, P) for p in _split_f32(mu, pieces)]
    gq5 = g_dq.reshape(nx, ny, P, F)
    gmu5 = g_dmu.reshape(nx, ny, P, 3 * F)

    def resident(shape4):
        return pl.BlockSpec(shape4, lambda i, j: (0, 0, 0, 0))

    outs = pl.pallas_call(
        functools.partial(_msg_fm_bwd_src_res_kernel, nx=nx, ny=ny, P=P,
                          F=F, B1=B1, ks=ks, pieces=pieces),
        grid=(nx, ny),
        in_specs=[
            resident((nx, ny, 1, Ktot)),           # qcol
            resident((nx, ny, 1, Ktot)),           # dcol
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
            resident((nx, ny, P, F)),              # g_dq
            resident((nx, ny, P, 3 * F)),          # g_dmu
        ] + _dest_geo_specs(nx, ny, ks, B1) + [
            pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0))
            for _ in range(2 * pieces)
        ],                                         # own x / mu pieces
        out_specs=(
            pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0)),
        ) + tuple(_dest_geo_specs(nx, ny, ks, B1)) + (
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nx, ny, P, D3), x.dtype),
            jax.ShapeDtypeStruct((nx, ny, P, D3), x.dtype),
        ) + tuple(
            jax.ShapeDtypeStruct((nx, ny, B1 + 3, k), x.dtype)
            for k in ks
        ) + (
            jax.ShapeDtypeStruct((B1, 3 * F), x.dtype),
        ),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], FW_aug, gq5, gmu5,
      *geo, *xh, *mh)
    dx = outs[0]
    dmu = outs[1]
    ggeo = tuple(outs[2:11])
    gFW = outs[11]
    return dx.reshape(A, D3), dmu.reshape(A, D3), ggeo, gFW


def _msg_fm_bwd_call(x, mu, geo, FW_aug, qcol, dcol, cots, P, ks, pieces):
    g_dq, g_dmu = cots
    nx, ny, Ktot = qcol.shape
    A, D3 = x.shape
    F = D3 // 3
    B1 = FW_aug.shape[0]
    if _resident_ok(A * 4 * F * 4, 2 * qcol.size * 4):
        return _msg_fm_bwd_res_call(x, mu, geo, FW_aug, qcol, dcol, cots,
                                    P, ks, pieces)
    xh = [_cols(p, nx, ny, P) for p in _split_f32(x, pieces)]
    mh = [_cols(p, nx, ny, P) for p in _split_f32(mu, pieces)]
    gq5 = g_dq.reshape(nx, ny, P, F)
    gmu5 = g_dmu.reshape(nx, ny, P, 3 * F)

    def dest_specs(shape4):
        # view of the DEST column (xs - dx, ys - dy) for each bucket c9
        return [
            pl.BlockSpec(
                shape4,
                functools.partial(
                    lambda i, j, dx, dy: ((i - dx) % nx, (j - dy) % ny, 0, 0),
                    dx=dx, dy=dy,
                ),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]

    outs = pl.pallas_call(
        functools.partial(_msg_fm_bwd_src_kernel, P=P, F=F, B1=B1, ks=ks,
                          pieces=pieces),
        grid=(nx, ny),
        in_specs=[pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0))]
        + dest_specs((1, 1, 1, Ktot))            # qcol
        + dest_specs((1, 1, 1, Ktot))            # dcol
        + _dest_geo_specs(nx, ny, ks, B1)        # geo parts
        + dest_specs((1, 1, P, F))               # g_dq
        + dest_specs((1, 1, P, 3 * F))           # g_dmu
        + [pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0))
           for _ in range(2 * pieces)],          # own x / mu pieces
        out_specs=(
            pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0)),
        ) + tuple(_dest_geo_specs(nx, ny, ks, B1)) + (
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nx, ny, P, D3), x.dtype),
            jax.ShapeDtypeStruct((nx, ny, P, D3), x.dtype),
        ) + tuple(
            jax.ShapeDtypeStruct((nx, ny, B1 + 3, k), x.dtype)
            for k in ks
        ) + (
            jax.ShapeDtypeStruct((B1, 3 * F), x.dtype),
        ),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(FW_aug,
      *([qcol[:, :, None, :]] * 9),
      *([dcol[:, :, None, :]] * 9),
      *geo,
      *([gq5] * 9),
      *([gmu5] * 9),
      *xh, *mh)
    dx = outs[0]
    dmu = outs[1]
    ggeo = tuple(outs[2:11])
    gFW = outs[11]
    return dx.reshape(A, D3), dmu.reshape(A, D3), ggeo, gFW


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _painn_message_fm_p(x, mu, geo, FW_aug, qcol, dcol, P, ks):
    return _msg_fm_fwd_call(x, mu, geo, FW_aug, qcol, dcol, P, ks,
                            _cb.PIECES)


def _pmfm_fwd(x, mu, geo, FW_aug, qcol, dcol, P, ks):
    out = _painn_message_fm_p(x, mu, geo, FW_aug, qcol, dcol, P, ks)
    return out, (x, mu, geo, FW_aug, qcol, dcol)


def _pmfm_bwd(P, ks, res, cots):
    x, mu, geo, FW_aug, qcol, dcol = res
    dx, dmu, ggeo, gFW = _msg_fm_bwd_call(
        x, mu, geo, FW_aug, qcol, dcol, cots, P, ks, _cb.PIECES)
    return dx, dmu, ggeo, gFW, None, None


_painn_message_fm_p.defvjp(_pmfm_fwd, _pmfm_bwd)


def painn_message_columns_fm_pallas(x, mu, geo, FW_aug, refs):
    """Feature-major fused message: x/mu [A', 3F] feature tables, geo =
    the 9-part per-bucket tuple from column_geometry."""
    return _painn_message_fm_p(x, mu, geo, FW_aug, refs.qcol, refs.dcol,
                               refs.P, refs.ksizes)


# ------------------- fused message + geometry backward (force path)
# The standard path stores per-edge geometry cotangents ggeo (9 x
# [nx, ny, B1+3, k]) to HBM per interaction and runs a separate geometry
# backward kernel over them.  For the MD force path (non-trainable
# Gaussian RBF + cosine cutoff), this fused backward recomputes the
# geometry chain per bucket IN VMEM (positions -> rij -> d/dir/fcut/phi,
# two extra depth-P selection dots of width 3) and chains the per-edge
# geometry cotangents straight to position cotangents, folded with the
# already-present one-hots: the ggeo HBM round trip and the geometry
# backward kernel disappear from the step.

_POSP = 3  # bf16 split pieces for exact-f32 position selection


def _msg_fm_bwd_fused_kernel(q_ref, d_ref, FW_ref, gq_ref, gmu_ref,
                             cw_ref, coff_ref, *args,
                             nx, ny, P, F, B, ks, rc, pieces, wgrad=True):
    pos_own = args[:_POSP]
    pos_dest = args[_POSP:_POSP + 9 * _POSP]
    xcols = args[_POSP + 9 * _POSP:_POSP + 9 * _POSP + pieces]
    mucols = args[_POSP + 9 * _POSP + pieces:
                  _POSP + 9 * _POSP + 2 * pieces]
    outs = args[_POSP + 9 * _POSP + 2 * pieces:]
    dx_ref = outs[0]
    dmu_ref = outs[1]
    gRo_ref = outs[2]
    gRd_refs = outs[3:12]
    gFW_ref = outs[12] if wgrad else None
    offs = _koffs(ks)
    i = pl.program_id(0)
    j = pl.program_id(1)
    wprec = _w_precision(pieces)

    if wgrad:
        @pl.when((i == 0) & (j == 0))
        def _():
            gFW_ref[...] = jnp.zeros_like(gFW_ref)

    def _sel_own(cols, ohj):
        acc_s = None
        for p in range(pieces):
            d = jax.lax.dot_general(
                ohj, cols[p][0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_s = d if acc_s is None else acc_s + d
        return acc_s

    def _sel_pos3(piece_refs, oh):
        # exact-f32 [3, k] = sum_p piece [3, P] x one-hot [k, P]
        acc_s = None
        for p in piece_refs:
            d = jax.lax.dot_general(
                p[0, 0], oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_s = d if acc_s is None else acc_s + d
        return acc_s

    acc_dx = None
    acc_dmu = None
    acc_gRo = None
    for c9, (dx, dy) in enumerate(COL_OFFSETS):
        o0, k = offs[c9], ks[c9]
        xi = jax.lax.rem(i - dx + nx, nx)
        yj = jax.lax.rem(j - dy + ny, ny)
        qv = q_ref[xi, yj, 0, o0:o0 + k]
        dv = d_ref[xi, yj, 0, o0:o0 + k]
        ohj = _oh_vec(qv, P)
        ohd = _oh_vec(dv, P)
        emaskT = (qv >= 0).astype(jnp.float32)[None, :]        # [1, k]
        # ---- geometry recompute (channel-major [ch, k], exact f32) ----
        RjT = _sel_pos3(pos_own, ohj)
        RiT = _sel_pos3([pos_dest[p * 9 + c9] for p in range(_POSP)], ohd)
        rijT = (RjT + coff_ref[xi, yj, :, o0:o0 + k] - RiT) * emaskT
        d2 = jnp.sum(rijT * rijT, axis=0, keepdims=True)
        dd = jnp.sqrt(d2 + (1.0 - emaskT))
        inv_d = 1.0 / dd
        dirsT = rijT * inv_d
        fc = 0.5 * (jnp.cos(dd * (np.pi / rc)) + 1.0)
        fcutT = jnp.where(dd < rc, fc, 0.0) * emaskT           # [1, k]
        centers = cw_ref[:, 0:1]
        coeff = cw_ref[:, 1:2]
        diff = dd - centers                                    # [B, k]
        phi = jnp.exp(coeff * diff * diff)
        rbf = jnp.concatenate([phi * fcutT, fcutT], axis=0).T  # [k, B+1]
        dirs = dirsT.T                                         # [k, 3]
        # ---- message backward (same math as the unfused kernel) -------
        xj = _sel_own(xcols, ohj)
        mu_j = _sel_own(mucols, ohj)
        W = jax.lax.dot_general(
            rbf, FW_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=wprec,
        )
        xjW = xj * W
        dmuR = xjW[:, F:2 * F]
        dmumu = xjW[:, 2 * F:]
        gcat = jnp.concatenate([gq_ref[xi, yj], gmu_ref[xi, yj]], axis=-1)
        gmsg = None
        for piece in _split_f32(gcat, pieces):
            d = jax.lax.dot_general(
                ohd, piece, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gmsg = d if gmsg is None else gmsg + d             # [k, 4F]
        gqe = gmsg[:, :F]
        gdmuR = None
        gdmumu = None
        gdir_parts = []
        gmuj_parts = []
        for x in range(3):
            gmux = gmsg[:, (1 + x) * F:(2 + x) * F]
            mujx = mu_j[:, x * F:(x + 1) * F]
            t = gmux * dirs[:, x:x + 1]
            gdmuR = t if gdmuR is None else gdmuR + t
            t2 = gmux * mujx
            gdmumu = t2 if gdmumu is None else gdmumu + t2
            gmuj_parts.append(gmux * dmumu)
            gdir_parts.append(jnp.sum(gmux * dmuR, axis=-1, keepdims=True))
        gxjW = jnp.concatenate([gqe, gdmuR, gdmumu], axis=-1)
        gxj = gxjW * W
        gW = gxjW * xj
        grbf = jax.lax.dot_general(
            gW, FW_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=wprec,
        )                                                      # [k, B+1]
        if wgrad:
            gFW_ref[...] += jax.lax.dot_general(
                rbf, gW, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=wprec,
            )
        gmu_e = jnp.concatenate(gmuj_parts, axis=-1)
        for piece in _split_f32(gxj, pieces):
            d = jax.lax.dot_general(
                ohj, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_dx = d if acc_dx is None else acc_dx + d
        for piece in _split_f32(gmu_e, pieces):
            d = jax.lax.dot_general(
                ohj, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_dmu = d if acc_dmu is None else acc_dmu + d
        # ---- geometry cotangent -> position cotangent -----------------
        grbfT = grbf.T                                         # [B+1, k]
        gphi_fc = grbfT[:B]
        gfc = grbfT[B:B + 1]
        gdirT = jnp.concatenate(gdir_parts, axis=-1).T         # [3, k]
        dphi_dd = 2.0 * coeff * diff * phi
        fp = -0.5 * (np.pi / rc) * jnp.sin(dd * (np.pi / rc))
        dfcut_dd = jnp.where(dd < rc, fp, 0.0) * emaskT
        gd = (
            jnp.sum(gphi_fc * dphi_dd, axis=0, keepdims=True) * fcutT
            + (jnp.sum(gphi_fc * phi, axis=0, keepdims=True) + gfc)
            * dfcut_dd
        )
        gdr = jnp.sum(gdirT * rijT, axis=0, keepdims=True)
        grijT = (gdirT * inv_d - rijT * (gdr * inv_d * inv_d * inv_d)
                 + gd * dirsT) * emaskT                        # [3, k]
        own = None
        dst = None
        for piece in _split_f32(grijT, _POSP):
            a = jax.lax.dot_general(
                piece, ohj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            own = a if own is None else own + a                # [3, P]
            b = jax.lax.dot_general(
                piece, ohd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dst = b if dst is None else dst + b
        acc_gRo = own if acc_gRo is None else acc_gRo + own
        gRd_refs[c9][0, 0] = -dst
    dx_ref[0, 0] = acc_dx
    dmu_ref[0, 0] = acc_dmu
    gRo_ref[0, 0] = acc_gRo


def _msg_fm_bwd_fused_call(x, mu, R, FW_aug, coff_fm, cw, qcol, dcol,
                           cots, P, ks, rc, pieces, wgrad=True):
    from .colblock_geo import _posT_pieces

    g_dq, g_dmu = cots
    nx, ny, Ktot = qcol.shape
    A, D3 = x.shape
    F = D3 // 3
    B = cw.shape[0]
    B1 = B + 1
    xh = [_cols(p, nx, ny, P) for p in _split_f32(x, pieces)]
    mh = [_cols(p, nx, ny, P) for p in _split_f32(mu, pieces)]
    pos_pieces = _posT_pieces(R, nx, ny, P)
    gq5 = g_dq.reshape(nx, ny, P, F)
    gmu5 = g_dmu.reshape(nx, ny, P, 3 * F)

    def resident(shape4):
        return pl.BlockSpec(shape4, lambda i, j: (0, 0, 0, 0))

    def dest_pos_specs():
        return [
            pl.BlockSpec(
                (1, 1, 3, P),
                functools.partial(
                    lambda i, j, dx, dy: ((i - dx) % nx, (j - dy) % ny, 0, 0),
                    dx=dx, dy=dy,
                ),
            )
            for _ in range(_POSP)
            for dx, dy in COL_OFFSETS
        ]

    gRd_specs = [
        pl.BlockSpec(
            (1, 1, 3, P),
            functools.partial(
                lambda i, j, dx, dy: ((i - dx) % nx, (j - dy) % ny, 0, 0),
                dx=dx, dy=dy,
            ),
        )
        for dx, dy in COL_OFFSETS
    ]

    outs = pl.pallas_call(
        functools.partial(_msg_fm_bwd_fused_kernel, nx=nx, ny=ny, P=P,
                          F=F, B=B, ks=ks, rc=rc, pieces=pieces,
                          wgrad=wgrad),
        grid=(nx, ny),
        in_specs=[
            resident((nx, ny, 1, Ktot)),           # qcol
            resident((nx, ny, 1, Ktot)),           # dcol
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
            resident((nx, ny, P, F)),              # g_dq
            resident((nx, ny, P, 3 * F)),          # g_dmu
            pl.BlockSpec((B, 2), lambda i, j: (0, 0)),
            resident((nx, ny, 3, Ktot)),           # coff_fm
        ] + [
            pl.BlockSpec((1, 1, 3, P), lambda i, j: (i, j, 0, 0))
            for _ in range(_POSP)
        ] + dest_pos_specs() + [
            pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0))
            for _ in range(2 * pieces)
        ],
        out_specs=(
            pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 3, P), lambda i, j: (i, j, 0, 0)),
        ) + tuple(gRd_specs) + ((
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
        ) if wgrad else ()),
        out_shape=(
            jax.ShapeDtypeStruct((nx, ny, P, D3), x.dtype),
            jax.ShapeDtypeStruct((nx, ny, P, D3), x.dtype),
            jax.ShapeDtypeStruct((nx, ny, 3, P), x.dtype),
        ) + tuple(
            jax.ShapeDtypeStruct((nx, ny, 3, P), x.dtype) for _ in range(9)
        ) + ((
            jax.ShapeDtypeStruct((B1, 3 * F), x.dtype),
        ) if wgrad else ()),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], FW_aug, gq5, gmu5,
      cw, coff_fm,
      *[p for p in pos_pieces],
      *[p for p in pos_pieces for _ in range(9)],
      *xh, *mh)
    dx = outs[0]
    dmu = outs[1]
    gRT = outs[2]
    for p in outs[3:12]:
        gRT = gRT + p
    gFW = outs[12] if wgrad else jnp.zeros_like(FW_aug)
    dR = jnp.moveaxis(gRT, 2, 3).reshape(A, 3)
    return dx.reshape(A, D3), dmu.reshape(A, D3), dR, gFW


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _painn_message_fm_fused_p(x, mu, R, geo, FW_aug, coff_fm, cw, qcol,
                              dcol, P, ks, rc):
    return _msg_fm_fwd_call(x, mu, geo, FW_aug, qcol, dcol, P, ks,
                            _cb.PIECES)


def _pmff_fwd(x, mu, R, geo, FW_aug, coff_fm, cw, qcol, dcol, P, ks, rc):
    out = _painn_message_fm_fused_p(x, mu, R, geo, FW_aug, coff_fm, cw,
                                    qcol, dcol, P, ks, rc)
    return out, (x, mu, R, geo, FW_aug, coff_fm, cw, qcol, dcol)


def _pmff_bwd(P, ks, rc, res, cots):
    x, mu, R, geo, FW_aug, coff_fm, cw, qcol, dcol = res
    if _resident_ok(x.shape[0] * 4 * (x.shape[1] // 3) * 4,
                    2 * qcol.size * 4):
        dx, dmu, dR, gFW = _msg_fm_bwd_fused_call(
            x, mu, R, FW_aug, coff_fm, cw, qcol, dcol, cots, P, ks, rc,
            _cb.PIECES, wgrad=_cb.WGRAD)
    else:
        # non-resident fallback: unfused message bwd + geometry bwd
        from .colblock_geo import _geo_bwd_call

        dx, dmu, ggeo, gFW = _msg_fm_bwd_call(
            x, mu, geo, FW_aug, qcol, dcol, cots, P, ks, _cb.PIECES)
        dR = _geo_bwd_call(ggeo, R, coff_fm, qcol, dcol, cw, P, ks, rc,
                           False)
    # geo enters stop-gradiented (the R path exists only through this
    # op); its zero cotangent is dead code the compiler removes
    zgeo = jax.tree.map(jnp.zeros_like, geo)
    return dx, dmu, dR, zgeo, gFW, None, None, None, None


_painn_message_fm_fused_p.defvjp(_pmff_fwd, _pmff_bwd)


def painn_message_columns_fm_fused_pallas(x, mu, R, geo, FW_aug, coff_fm,
                                          cw, refs, rc):
    """Message forward on precomputed geo, with a FUSED message+geometry
    backward that emits position cotangents directly (geo enters as a
    non-differentiated input: pass it through jax.lax.stop_gradient)."""
    return _painn_message_fm_fused_p(x, mu, R, geo, FW_aug, coff_fm, cw,
                                     refs.qcol, refs.dcol, refs.P,
                                     refs.ksizes, rc)


# ------------------------- geo-resident backward (hybrid fusion mode)
# Round-4 finding (PERF.md): recomputing the geometry chain inside the
# message kernels costs ~0.4 ms per kernel pass (position-selection dots
# + exp/sqrt/cos VPU chain), x6 passes per step — while the standalone
# geometry kernel computes it ONCE for ~0.1 ms and the geo tensors cost
# only ~0.03 ms of HBM per read.  This backward therefore reads the geo
# tensors (produced with an extra distance channel, with_d=True) like
# the forward does and derives the *backward* geometry chain from them
# alone:
#   d    = stored channel B+4               (Mosaic cannot lower acos,
#                                           so the inverse-cutoff trick
#                                           is replaced by one channel)
#   sin(pi d/rc) = sqrt(1 - (2 fcut - 1)^2) (no transcendental)
#   phi  = (phi*fcut) / max(fcut, tiny)     (stored channel / fcut)
#   grij = (gdir - dirs*(gdir.dirs)) / d + gd * dirs
# so no position inputs, no per-edge recompute dots and no exp/cos/sqrt
# remain in the backward; dR comes out of the same one-hot folds.
# Dead edges (masked, or beyond the model cutoff inside the skin) have
# fcut == 0, which zeroes both gd terms and gdir, hence grij == 0,
# independent of their placeholder d.


def _msg_fm_bwd_geores_kernel(q_ref, d_ref, FW_ref, gq_ref, gmu_ref,
                              cw_ref, *args, nx, ny, P, F, B, ks, rc,
                              pieces, wgrad=True, gpk=False, preoh=False):
    ngeo = 1 if gpk else 9
    geos = args[:ngeo]                         # dest-cell geo blocks
    noh = 18 if preoh else 0
    ohj_refs = args[ngeo:ngeo + 9] if preoh else None
    ohd_refs = args[ngeo + 9:ngeo + 18] if preoh else None
    args = args[:ngeo] + args[ngeo + noh:]
    xcols = args[ngeo:ngeo + pieces]           # own x column views
    mucols = args[ngeo + pieces:ngeo + 2 * pieces]  # own mu column views
    outs = args[ngeo + 2 * pieces:]
    dx_ref = outs[0]
    dmu_ref = outs[1]
    gRo_ref = outs[2]
    gRd_refs = outs[3:12]
    gFW_ref = outs[12] if wgrad else None
    offs = _koffs(ks)
    i = pl.program_id(0)
    j = pl.program_id(1)
    wprec = _w_precision(pieces)

    if wgrad:
        @pl.when((i == 0) & (j == 0))
        def _():
            gFW_ref[...] = jnp.zeros_like(gFW_ref)

    def _sel_own(cols, ohj):
        acc_s = None
        for p in range(pieces):
            d = jax.lax.dot_general(
                ohj, cols[p][0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_s = d if acc_s is None else acc_s + d
        return acc_s

    acc_dx = None
    acc_dmu = None
    acc_gRo = None
    for c9, (dx, dy) in enumerate(COL_OFFSETS):
        o0, k = offs[c9], ks[c9]
        xi = jax.lax.rem(i - dx + nx, nx)
        yj = jax.lax.rem(j - dy + ny, ny)
        if preoh:
            ohj = ohj_refs[c9][0, 0]
            ohd = ohd_refs[c9][0, 0]
        else:
            qv = q_ref[xi, yj, 0, o0:o0 + k]
            dv = d_ref[xi, yj, 0, o0:o0 + k]
            ohj = _oh_vec(qv, P)
            ohd = _oh_vec(dv, P)
        # packed mode: the WHOLE geo tensor is VMEM-resident; slice the
        # destination cell's bucket (dynamic cell, static edge range)
        geo_blk = (geos[0][xi, yj, :, o0:o0 + k] if gpk
                   else geos[c9][0, 0])                    # [B1+4, k]
        geoT = geo_blk.T                                   # [k, B1+4]
        rbf = geoT[:, :B + 1]
        dirs = geoT[:, B + 1:B + 4]
        # recompute forward intermediates (sources are in MY column)
        xj = _sel_own(xcols, ohj)
        mu_j = _sel_own(mucols, ohj)
        W = jax.lax.dot_general(
            rbf, FW_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=wprec,
        )
        xjW = xj * W
        dmuR = xjW[:, F:2 * F]
        dmumu = xjW[:, 2 * F:]
        gcat = jnp.concatenate([gq_ref[xi, yj], gmu_ref[xi, yj]], axis=-1)
        gmsg = None
        for piece in _split_f32(gcat, pieces):
            d = jax.lax.dot_general(
                ohd, piece, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gmsg = d if gmsg is None else gmsg + d         # [k, 4F]
        gqe = gmsg[:, :F]
        gdmuR = None
        gdmumu = None
        gdir_parts = []
        gmuj_parts = []
        for x in range(3):
            gmux = gmsg[:, (1 + x) * F:(2 + x) * F]
            mujx = mu_j[:, x * F:(x + 1) * F]
            t = gmux * dirs[:, x:x + 1]
            gdmuR = t if gdmuR is None else gdmuR + t
            t2 = gmux * mujx
            gdmumu = t2 if gdmumu is None else gdmumu + t2
            gmuj_parts.append(gmux * dmumu)
            gdir_parts.append(jnp.sum(gmux * dmuR, axis=-1, keepdims=True))
        gxjW = jnp.concatenate([gqe, gdmuR, gdmumu], axis=-1)
        gxj = gxjW * W
        gW = gxjW * xj
        grbf = jax.lax.dot_general(
            gW, FW_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=wprec,
        )                                                  # [k, B+1]
        if wgrad:
            gFW_ref[...] += jax.lax.dot_general(
                rbf, gW, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=wprec,
            )
        gmu_e = jnp.concatenate(gmuj_parts, axis=-1)
        for piece in _split_f32(gxj, pieces):
            d = jax.lax.dot_general(
                ohj, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_dx = d if acc_dx is None else acc_dx + d   # [P, 3F]
        for piece in _split_f32(gmu_e, pieces):
            d = jax.lax.dot_general(
                ohj, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_dmu = d if acc_dmu is None else acc_dmu + d  # [P, 3F]
        # ---- position cotangent from the STORED geometry --------------
        # CHANNEL-MAJOR ([ch, k], packed edge axis on lanes): [k, B]- or
        # [k, 1]-shaped VPU ops would use B/128 or 1/128 lanes (the
        # measured 2.5x trap of the first geometry-kernel version).
        geo_cm = geo_blk                                   # [B1+4, k]
        rbf_cm = geo_cm[:B]                                # phi*fcut
        fcutT = geo_cm[B:B + 1]                            # [1, k]
        dirsT = geo_cm[B + 1:B + 4]                        # [3, k]
        ddT = geo_cm[B + 4:B + 5]                          # [1, k]
        cosv = 2.0 * fcutT - 1.0
        # sin(pi d / rc) without a transcendental; identically 0 for
        # dead/masked/out-of-cutoff edges (fcut == 0 -> cos == -1)
        sinv = jnp.sqrt(jnp.maximum(1.0 - cosv * cosv, 0.0))
        dfcut_dd = (-0.5 * np.pi / rc) * sinv              # [1, k]
        phiT = rbf_cm * (1.0 / jnp.maximum(fcutT, 1e-30))  # [B, k]
        centers = cw_ref[:, 0:1]                           # [B, 1]
        coeff = cw_ref[:, 1:2]
        diffT = ddT - centers                              # [B, k]
        dphi_dd = (2.0 * coeff) * diffT * phiT
        grbfT = grbf.T                                     # [B+1, k]
        gphi_fc = grbfT[:B]
        gfc = grbfT[B:B + 1]
        gd = (
            jnp.sum(gphi_fc * dphi_dd, axis=0, keepdims=True) * fcutT
            + (jnp.sum(gphi_fc * phiT, axis=0, keepdims=True) + gfc)
            * dfcut_dd
        )                                                  # [1, k]
        gdirT = jnp.concatenate(gdir_parts, axis=-1).T     # [3, k]
        s = jnp.sum(gdirT * dirsT, axis=0, keepdims=True)
        inv_d = 1.0 / jnp.maximum(ddT, 1e-6)
        grijT = (gdirT - dirsT * s) * inv_d + gd * dirsT   # [3, k]
        own = None
        dst = None
        for piece in _split_f32(grijT, _POSP):
            a = jax.lax.dot_general(
                piece, ohj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            own = a if own is None else own + a            # [3, P]
            b = jax.lax.dot_general(
                piece, ohd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dst = b if dst is None else dst + b
        acc_gRo = own if acc_gRo is None else acc_gRo + own
        gRd_refs[c9][0, 0] = -dst
    dx_ref[0, 0] = acc_dx
    dmu_ref[0, 0] = acc_dmu
    gRo_ref[0, 0] = acc_gRo


def _msg_fm_bwd_geores_call(x, mu, geo, FW_aug, cw, qcol, dcol, cots,
                            P, ks, rc, pieces, wgrad=True, oh=None):
    g_dq, g_dmu = cots
    nx, ny, Ktot = qcol.shape
    A, D3 = x.shape
    F = D3 // 3
    B = cw.shape[0]
    B1 = B + 1
    gpk = not isinstance(geo, (tuple, list))
    xh = [_cols(p, nx, ny, P) for p in _split_f32(x, pieces)]
    mh = [_cols(p, nx, ny, P) for p in _split_f32(mu, pieces)]
    gq5 = g_dq.reshape(nx, ny, P, F)
    gmu5 = g_dmu.reshape(nx, ny, P, 3 * F)

    def resident(shape4):
        return pl.BlockSpec(shape4, lambda i, j: (0, 0, 0, 0))

    preoh = oh is not None
    oh_arrs = ()
    oh_specs = []
    if preoh:
        ohj_parts, _, ohd_parts = oh
        oh_arrs = tuple(ohj_parts) + tuple(ohd_parts)
        oh_specs = _dest_oh_specs(nx, ny, ks, P) * 2

    if gpk:
        geo_specs = [resident((nx, ny, geo.shape[2], Ktot))]
        geo = (geo,)
    else:
        geo_specs = _dest_geo_specs(nx, ny, ks, B1 + 1)

    gRd_specs = [
        pl.BlockSpec(
            (1, 1, 3, P),
            functools.partial(
                lambda i, j, dx, dy: ((i - dx) % nx, (j - dy) % ny, 0, 0),
                dx=dx, dy=dy,
            ),
        )
        for dx, dy in COL_OFFSETS
    ]
    outs = pl.pallas_call(
        functools.partial(_msg_fm_bwd_geores_kernel, nx=nx, ny=ny, P=P,
                          F=F, B=B, ks=ks, rc=rc, pieces=pieces,
                          wgrad=wgrad, gpk=gpk, preoh=preoh),
        grid=(nx, ny),
        in_specs=[
            resident((nx, ny, 1, Ktot)),           # qcol
            resident((nx, ny, 1, Ktot)),           # dcol
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
            resident((nx, ny, P, F)),              # g_dq
            resident((nx, ny, P, 3 * F)),          # g_dmu
            pl.BlockSpec((B, 2), lambda i, j: (0, 0)),
            # geo blocks carry B1+4 channels (with_d layout: the extra
            # distance channel)
        ] + geo_specs + oh_specs + [
            pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0))
            for _ in range(2 * pieces)
        ],
    out_specs=(
            pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, P, D3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 3, P), lambda i, j: (i, j, 0, 0)),
        ) + tuple(gRd_specs) + ((
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
        ) if wgrad else ()),
        out_shape=(
            jax.ShapeDtypeStruct((nx, ny, P, D3), x.dtype),
            jax.ShapeDtypeStruct((nx, ny, P, D3), x.dtype),
            jax.ShapeDtypeStruct((nx, ny, 3, P), x.dtype),
        ) + tuple(
            jax.ShapeDtypeStruct((nx, ny, 3, P), x.dtype) for _ in range(9)
        ) + ((
            jax.ShapeDtypeStruct((B1, 3 * F), x.dtype),
        ) if wgrad else ()),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], FW_aug, gq5, gmu5, cw,
      *geo, *oh_arrs, *xh, *mh)
    dx = outs[0]
    dmu = outs[1]
    gRT = outs[2]
    for p in outs[3:12]:
        gRT = gRT + p
    gFW = outs[12] if wgrad else jnp.zeros_like(FW_aug)
    dR = jnp.moveaxis(gRT, 2, 3).reshape(A, 3)
    return dx.reshape(A, D3), dmu.reshape(A, D3), dR, gFW


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _painn_message_fm_geores_p(x, mu, R, geo, FW_aug, coff_fm, cw, qcol,
                               dcol, oh, P, ks, rc):
    return _msg_fm_fwd_call(x, mu, geo, FW_aug, qcol, dcol, P, ks,
                            _cb.PIECES, oh=oh)


def _pmfg_fwd(x, mu, R, geo, FW_aug, coff_fm, cw, qcol, dcol, oh, P, ks,
              rc):
    out = _painn_message_fm_geores_p(x, mu, R, geo, FW_aug, coff_fm, cw,
                                     qcol, dcol, oh, P, ks, rc)
    return out, (x, mu, R, geo, FW_aug, coff_fm, cw, qcol, dcol, oh)


def _pmfg_bwd(P, ks, rc, res, cots):
    x, mu, R, geo, FW_aug, coff_fm, cw, qcol, dcol, oh = res
    gbytes = (geo.size * geo.dtype.itemsize
              if not isinstance(geo, (tuple, list))
              else sum(g.size * g.dtype.itemsize for g in geo))
    if _resident_ok(x.shape[0] * 4 * (x.shape[1] // 3) * 4,
                    2 * qcol.size * 4, gbytes):
        dx, dmu, dR, gFW = _msg_fm_bwd_geores_call(
            x, mu, geo, FW_aug, cw, qcol, dcol, cots, P, ks, rc,
            _cb.PIECES, wgrad=_cb.WGRAD, oh=oh)
    else:
        # non-resident fallback: unfused message bwd + geometry bwd
        from .colblock_geo import _geo_bwd_call, split_geo

        geo_t = (split_geo(geo, ks)
                 if not isinstance(geo, (tuple, list)) else geo)
        dx, dmu, ggeo, gFW = _msg_fm_bwd_call(
            x, mu, geo_t, FW_aug, qcol, dcol, cots, P, ks, _cb.PIECES)
        dR = _geo_bwd_call(ggeo, R, coff_fm, qcol, dcol, cw, P, ks, rc,
                           False)
    zgeo = jax.tree.map(jnp.zeros_like, geo)
    zoh = jax.tree.map(jnp.zeros_like, oh) if oh is not None else None
    return dx, dmu, dR, zgeo, gFW, None, None, None, None, zoh


_painn_message_fm_geores_p.defvjp(_pmfg_fwd, _pmfg_bwd)


def painn_message_columns_fm_geores_pallas(x, mu, R, geo, FW_aug, coff_fm,
                                           cw, refs, rc):
    """Message forward on precomputed geo, with a backward that derives
    the geometry chain from the STORED geo tensors (no position inputs,
    no geometry recompute) and emits position cotangents directly.  Pass
    ``geo`` through ``jax.lax.stop_gradient``.  When ``refs.oh`` is set,
    the kernels read precomputed one-hot selection matrices instead of
    building them on the VPU (scripts/kb_r5.py: 1.5x faster fwd pass)."""
    return _painn_message_fm_geores_p(x, mu, R, geo, FW_aug, coff_fm, cw,
                                      refs.qcol, refs.dcol, refs.oh,
                                      refs.P, refs.ksizes, rc)


# --------------------- fully fused forward (geometry recomputed in-kernel)
# With the backward already geometry-fused, recomputing the geometry in
# the message FORWARD kernels as well (same two width-3 selection dots +
# VPU chain) makes the geo tensors and the separate geometry forward
# kernel disappear from the PaiNN column path entirely: per step the only
# per-edge data in HBM are the static layout indices.


def _msg_fm_fwd_fused_kernel(q_ref, d_ref, FW_ref, cw_ref, coff_ref,
                             *args, nx, ny, P, F, B, ks, rc, pieces):
    pos_own = args[:_POSP]
    pos_src = args[_POSP:_POSP + 9 * _POSP]
    xcols = args[_POSP + 9 * _POSP:_POSP + 9 * _POSP + pieces]
    mucols = args[_POSP + 9 * _POSP + pieces:
                  _POSP + 9 * _POSP + 2 * pieces]
    dq_ref, dmu_ref = args[_POSP + 9 * _POSP + 2 * pieces:]
    offs = _koffs(ks)
    i = pl.program_id(0)
    j = pl.program_id(1)
    acc = None
    wprec = _w_precision(pieces)

    def _sel(cols, ohj, xi, yj):
        acc_s = None
        for p in range(pieces):
            d = jax.lax.dot_general(
                ohj, cols[p][xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_s = d if acc_s is None else acc_s + d
        return acc_s

    def _sel_pos3(piece_refs, oh):
        acc_s = None
        for p in piece_refs:
            d = jax.lax.dot_general(
                p[0, 0], oh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_s = d if acc_s is None else acc_s + d
        return acc_s

    for c9, (di, dj) in enumerate(COL_OFFSETS):
        o0, k = offs[c9], ks[c9]
        xi = jax.lax.rem(i + di + nx, nx)
        yj = jax.lax.rem(j + dj + ny, ny)
        qv = q_ref[0, 0, 0, o0:o0 + k]
        dv = d_ref[0, 0, 0, o0:o0 + k]
        ohj = _oh_vec(qv, P)
        ohd = _oh_vec(dv, P)
        emaskT = (qv >= 0).astype(jnp.float32)[None, :]
        # geometry recompute (channel-major [ch, k], exact f32)
        RjT = _sel_pos3([pos_src[p * 9 + c9] for p in range(_POSP)], ohj)
        RiT = _sel_pos3(pos_own, ohd)
        rijT = (RjT + coff_ref[0, 0, :, o0:o0 + k] - RiT) * emaskT
        d2 = jnp.sum(rijT * rijT, axis=0, keepdims=True)
        dd = jnp.sqrt(d2 + (1.0 - emaskT))
        dirsT = rijT / dd
        fc = 0.5 * (jnp.cos(dd * (np.pi / rc)) + 1.0)
        fcutT = jnp.where(dd < rc, fc, 0.0) * emaskT
        centers = cw_ref[:, 0:1]
        coeff = cw_ref[:, 1:2]
        diff = dd - centers
        phi = jnp.exp(coeff * diff * diff)
        rbf = jnp.concatenate([phi * fcutT, fcutT], axis=0).T  # [k, B+1]
        dirs = dirsT.T
        # message
        xj = _sel(xcols, ohj, xi, yj)
        mu_j = _sel(mucols, ohj, xi, yj)
        msg = _msg_edge(xj, mu_j, rbf, dirs, FW_ref, F, wprec)
        for piece in _split_f32(msg, pieces):
            d = jax.lax.dot_general(
                ohd, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
    dq_ref[0, 0] = acc[:, :F]
    dmu_ref[0, 0] = acc[:, F:]


def _msg_fm_fwd_fused_call(x, mu, R, FW_aug, coff_fm, cw, qcol, dcol,
                           P, ks, rc, pieces):
    from .colblock_geo import _posT_pieces

    nx, ny, Ktot = qcol.shape
    A, D3 = x.shape
    F = D3 // 3
    B = cw.shape[0]
    B1 = B + 1
    xt = [_cols(p, nx, ny, P) for p in _split_f32(x, pieces)]
    mt = [_cols(p, nx, ny, P) for p in _split_f32(mu, pieces)]
    pos_pieces = _posT_pieces(R, nx, ny, P)

    def src_pos_specs():
        return [
            pl.BlockSpec(
                (1, 1, 3, P),
                functools.partial(
                    lambda i, j, di, dj: ((i + di) % nx, (j + dj) % ny, 0, 0),
                    di=di, dj=dj,
                ),
            )
            for _ in range(_POSP)
            for di, dj in COL_OFFSETS
        ]

    dq, dmu = pl.pallas_call(
        functools.partial(_msg_fm_fwd_fused_kernel, nx=nx, ny=ny, P=P,
                          F=F, B=B, ks=ks, rc=rc, pieces=pieces),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
            pl.BlockSpec((B, 2), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1, 3, Ktot), lambda i, j: (i, j, 0, 0)),
        ] + [
            pl.BlockSpec((1, 1, 3, P), lambda i, j: (i, j, 0, 0))
            for _ in range(_POSP)
        ] + src_pos_specs() + [
            pl.BlockSpec((nx, ny, P, D3), lambda i, j: (0, 0, 0, 0))
            for _ in range(2 * pieces)
        ],
        out_specs=(
            pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, P, 3 * F), lambda i, j: (i, j, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nx, ny, P, F), x.dtype),
            jax.ShapeDtypeStruct((nx, ny, P, 3 * F), x.dtype),
        ),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], FW_aug, cw, coff_fm,
      *[p for p in pos_pieces],
      *[p for p in pos_pieces for _ in range(9)],
      *xt, *mt)
    return dq.reshape(A, F), dmu.reshape(A, 3 * F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _painn_message_full_fused_p(x, mu, R, FW_aug, coff_fm, cw, qcol,
                                dcol, P, ks, rc):
    if _resident_ok(x.shape[0] * x.shape[1] * 4 * _cb.PIECES):
        return _msg_fm_fwd_fused_call(x, mu, R, FW_aug, coff_fm, cw,
                                      qcol, dcol, P, ks, rc, _cb.PIECES)
    # non-resident fallback: geometry kernel + standard fwd
    from .colblock_geo import _geo_fwd_call

    geo = _geo_fwd_call(R, coff_fm, qcol, dcol, cw, P, ks, rc, False)
    return _msg_fm_fwd_call(x, mu, geo, FW_aug, qcol, dcol, P, ks,
                            _cb.PIECES)


def _pmffu_fwd(x, mu, R, FW_aug, coff_fm, cw, qcol, dcol, P, ks, rc):
    out = _painn_message_full_fused_p(x, mu, R, FW_aug, coff_fm, cw,
                                      qcol, dcol, P, ks, rc)
    return out, (x, mu, R, FW_aug, coff_fm, cw, qcol, dcol)


def _pmffu_bwd(P, ks, rc, res, cots):
    x, mu, R, FW_aug, coff_fm, cw, qcol, dcol = res
    if _resident_ok(x.shape[0] * 4 * (x.shape[1] // 3) * 4,
                    2 * qcol.size * 4):
        dx, dmu, dR, gFW = _msg_fm_bwd_fused_call(
            x, mu, R, FW_aug, coff_fm, cw, qcol, dcol, cots, P, ks, rc,
            _cb.PIECES, wgrad=_cb.WGRAD)
    else:
        from .colblock_geo import _geo_bwd_call, _geo_fwd_call

        geo = _geo_fwd_call(R, coff_fm, qcol, dcol, cw, P, ks, rc, False)
        dx, dmu, ggeo, gFW = _msg_fm_bwd_call(
            x, mu, geo, FW_aug, qcol, dcol, cots, P, ks, _cb.PIECES)
        dR = _geo_bwd_call(ggeo, R, coff_fm, qcol, dcol, cw, P, ks, rc,
                           False)
    return dx, dmu, dR, gFW, None, None, None, None


_painn_message_full_fused_p.defvjp(_pmffu_fwd, _pmffu_bwd)


def painn_message_columns_full_fused_pallas(x, mu, R, FW_aug, coff_fm,
                                            cw, refs, rc):
    """Fully fused message: geometry recomputed inside BOTH the forward
    and the backward kernels — no geo tensors exist at all."""
    return _painn_message_full_fused_p(x, mu, R, FW_aug, coff_fm, cw,
                                       refs.qcol, refs.dcol, refs.P,
                                       refs.ksizes, rc)
