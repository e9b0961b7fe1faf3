"""Fully fused PaiNN interaction message for the cell-blocked layout.

One kernel per interaction block computes, entirely in VMEM:

    gather x_j, mu_j  ->  W = filter_net(rbf)  ->  x_j * W  ->  split
    ->  dmu = dmuR * dir_ij + dmumu * mu_j  ->  sum over K

so the only HBM traffic is ~9x the (x||mu) feature table (windowed column
views), the per-edge radial basis [A, K, n_rbf+1], and the *atom-sized*
outputs dq [A, F] / dmu [A, 3F].  Nothing of shape [A, K, 3F] ever exists:
the torch reference materialises exactly those per-edge tensors
(reference painn.py:45-66) — at 10k atoms that is ~0.5 GB per block per
direction on TPU, which this kernel removes.

The filter Dense is applied *inside* the kernel from its weight matrix
(rows augmented with a bias channel: the caller appends fcut*mask as an
extra basis column so bias*fcut is exact).  The hand-written VJP
recomputes the forward in VMEM, folds the per-edge cotangents back onto
the feature table with transposed one-hot matmuls (scatter-free), and
accumulates the filter-weight gradient across the whole grid in a
VMEM-resident accumulator, so the fused path remains trainable.

XLA fallback (`_message_xla`) keeps CPU tests and non-TPU platforms on the
same API, built from `cell_gather`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cellblock as _cb
from .cellblock import _impl, cell_gather
from .cellblock_pallas import COL_OFFSETS, _col_specs, _halo_cols, _split_f32

HI = jax.lax.Precision.HIGHEST


def painn_message_cellblock(xmu, rbf_aug, dir_ij, FW_aug, qidx):
    """PaiNN inter-atomic message, cell-blocked.

    Args:
        xmu: [A, 6F] concat of ctx-Dense output x [A, 3F] and mu [A, 3F]
            (mu flattened from [A, 3, F]).
        rbf_aug: [A, K, B+1] radial basis * fcut * mask, last channel =
            fcut * mask (the filter bias channel).
        dir_ij: [A, K, 3] unit displacement vectors.
        FW_aug: [B+1, 3F] filter weights with the bias as the last row.
        qidx: [nx, ny, nz, C, K] candidate indices.

    Returns:
        dq [A, F], dmu [A, 3F] (sum over neighbors).
    """
    if _impl().startswith("pallas"):
        return _message_fused(xmu, rbf_aug, dir_ij, FW_aug, qidx)
    return _message_xla(xmu, rbf_aug, dir_ij, FW_aug, qidx)


# ------------------------------------------------------------------ XLA
def _message_xla(xmu, rbf_aug, dir_ij, FW_aug, qidx):
    A = xmu.shape[0]
    F = xmu.shape[-1] // 6
    gathered = cell_gather(xmu, qidx)              # [A, K, 6F]
    xj = gathered[..., : 3 * F]
    muj = gathered[..., 3 * F:].reshape(A, -1, 3, F)
    W = jnp.einsum("akb,bf->akf", rbf_aug, FW_aug, precision=HI)
    xjW = xj * W
    dqe = xjW[..., :F]
    dmuR = xjW[..., F:2 * F]
    dmumu = xjW[..., 2 * F:]
    dmu = dmuR[:, :, None, :] * dir_ij[..., None] + dmumu[:, :, None, :] * muj
    return jnp.sum(dqe, axis=1), jnp.sum(dmu, axis=1).reshape(A, 3 * F)


# ----------------------------------------------------------------- fused
@jax.custom_vjp
def _message_fused(xmu, rbf_aug, dir_ij, FW_aug, qidx):
    return _fused_fwd_call(xmu, rbf_aug, dir_ij, FW_aug, qidx)


def _gather_xmu(cols, oh, z, C, pieces):
    """In-VMEM selection of [CK, 6F] neighbor features."""
    acc = None
    for piece in range(pieces):
        E = jnp.concatenate(
            [cols[piece * 9 + c9][0, 0, pl.ds(z * C, 3 * C), :]
             for c9 in range(9)],
            axis=0,
        )
        d = jax.lax.dot_general(
            oh, E, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    return acc


def _onehot_z(q_ref, z, C):
    q = q_ref[0, 0, z, :]
    CK = q.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (CK, 27 * C), 1)
    return (q[:, None] == iota).astype(jnp.bfloat16)


def _zchunk(nz: int, target: int = 5) -> int:
    """Largest divisor of nz that is <= target (grid-step amortisation)."""
    for zc in range(min(target, nz), 0, -1):
        if nz % zc == 0:
            return zc
    return 1


def _fwd_kernel(q_ref, rbf_ref, dir_ref, FW_ref, *args,
                C: int, K: int, F: int, pieces: int, ZC: int):
    cols = args[:9 * pieces]
    dq_ref, dmu_ref = args[9 * pieces:]
    z0 = pl.program_id(2) * ZC

    def body(zz, _):
        z = z0 + zz
        oh = _onehot_z(q_ref, z, C)
        xmu = _gather_xmu(cols, oh, z, C, pieces)      # [CK, 6F]
        xj = xmu[:, : 3 * F]
        rbf = rbf_ref[0, 0, zz]                         # [CK, B+1]
        W = jax.lax.dot_general(
            rbf, FW_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        xjW = xj * W
        dqe = xjW[:, :F]
        dmuR = xjW[:, F:2 * F]
        dmumu = xjW[:, 2 * F:]
        dirs = dir_ref[0, 0, zz]                        # [CK, 3]
        dq_ref[0, 0, zz] = jnp.sum(dqe.reshape(C, K, F), axis=1)
        dmu_parts = []
        for x in range(3):
            mujx = xmu[:, (3 + x) * F:(4 + x) * F]
            dmu_x = dmuR * dirs[:, x:x + 1] + dmumu * mujx
            dmu_parts.append(jnp.sum(dmu_x.reshape(C, K, F), axis=1))
        dmu_ref[0, 0, zz] = jnp.concatenate(dmu_parts, axis=-1)
        return 0

    jax.lax.fori_loop(0, ZC, body, 0)


def _fused_fwd_call(xmu, rbf_aug, dir_ij, FW_aug, qidx):
    nx, ny, nz, C, K = qidx.shape
    A, D = xmu.shape
    F = D // 6
    B1 = rbf_aug.shape[-1]
    pieces = _cb.PIECES
    ZC = _zchunk(nz)
    q2 = qidx.reshape(nx, ny, nz, C * K)
    halos = [_halo_cols(p, nx, ny, nz, C, D) for p in _split_f32(xmu, pieces)]
    rbf5 = rbf_aug.reshape(nx, ny, nz, C * K, B1)
    dir5 = dir_ij.reshape(nx, ny, nz, C * K, 3)

    dq, dmu = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C, K=K, F=F, pieces=pieces, ZC=ZC),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_impl() == "pallas_interpret",
        grid=(nx, ny, nz // ZC),
        in_specs=[
            pl.BlockSpec((1, 1, nz, C * K), lambda i, j, k: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, ZC, C * K, B1), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((1, 1, ZC, C * K, 3), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((B1, 3 * F), lambda i, j, k: (0, 0)),
        ]
        + _col_specs(nx, ny, (nz + 2) * C, D) * pieces,
        out_specs=(
            pl.BlockSpec((1, 1, ZC, C, F), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((1, 1, ZC, C, 3 * F), lambda i, j, k: (i, j, k, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nx, ny, nz, C, F), xmu.dtype),
            jax.ShapeDtypeStruct((nx, ny, nz, C, 3 * F), xmu.dtype),
        ),
    )(q2, rbf5, dir5, FW_aug, *[h for h in halos for _ in range(9)])
    return dq.reshape(A, F), dmu.reshape(A, 3 * F)


def _bwd_kernel(q_ref, rbf_ref, dir_ref, FW_ref, gq_ref, gmu_ref, *args,
                C: int, K: int, F: int, pieces: int, ZC: int):
    cols = args[:9 * pieces]
    outs = args[9 * pieces:]
    part_refs = outs[:9]          # halo'd d(xmu) partials [*, 6F]
    grbf_ref, gdir_ref, gFW_ref = outs[9:]
    zc = pl.program_id(2)

    @pl.when((zc == 0) & (pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        gFW_ref[...] = jnp.zeros_like(gFW_ref)

    @pl.when(zc == 0)
    def _():
        for p_ref in part_refs:
            p_ref[...] = jnp.zeros_like(p_ref)

    jax.lax.fori_loop(0, ZC, functools.partial(
        _bwd_z_body, zc=zc, cols=cols, part_refs=part_refs,
        q_ref=q_ref, rbf_ref=rbf_ref, dir_ref=dir_ref, FW_ref=FW_ref,
        gq_ref=gq_ref, gmu_ref=gmu_ref, grbf_ref=grbf_ref,
        gdir_ref=gdir_ref, gFW_ref=gFW_ref,
        C=C, K=K, F=F, pieces=pieces, ZC=ZC), 0)


def _bwd_z_body(zz, carry, *, zc, cols, part_refs, q_ref, rbf_ref, dir_ref,
                FW_ref, gq_ref, gmu_ref, grbf_ref, gdir_ref, gFW_ref,
                C, K, F, pieces, ZC):
    z = zc * ZC + zz
    oh = _onehot_z(q_ref, z, C)
    # --- recompute forward intermediates -----------------------------
    xmu = _gather_xmu(cols, oh, z, C, pieces)
    xj = xmu[:, : 3 * F]
    rbf = rbf_ref[0, 0, zz]
    W = jax.lax.dot_general(
        rbf, FW_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HI,
    )
    xjW = xj * W
    dmuR = xjW[:, F:2 * F]
    dmumu = xjW[:, 2 * F:]
    dirs = dir_ref[0, 0, zz]
    # --- per-edge cotangents ------------------------------------------
    CK = C * K
    gq = gq_ref[0, 0, zz]         # [C, F]
    gmu = gmu_ref[0, 0, zz]       # [C, 3F]
    # explicit K-expansion (broadcast_to + reshape does not lower in Mosaic)
    ones_k = jnp.ones((1, K, 1), gq.dtype)
    gqe = (gq[:, None, :] * ones_k).reshape(CK, F)
    gdmuR = None
    gdmumu = None
    gdir_parts = []
    gmuj_parts = []
    for x in range(3):
        # lax.slice avoids the gather that mixed None/slice indexing emits
        gmu_x = jax.lax.slice_in_dim(gmu, x * F, (x + 1) * F, axis=1)
        gmux = (gmu_x[:, None, :] * ones_k).reshape(CK, F)
        mujx = xmu[:, (3 + x) * F:(4 + x) * F]
        t = gmux * dirs[:, x:x + 1]
        gdmuR = t if gdmuR is None else gdmuR + t
        t2 = gmux * mujx
        gdmumu = t2 if gdmumu is None else gdmumu + t2
        gmuj_parts.append(gmux * dmumu)
        gdir_parts.append(jnp.sum(gmux * dmuR, axis=-1, keepdims=True))
    gxjW = jnp.concatenate([gqe, gdmuR, gdmumu], axis=-1)   # [CK, 3F]
    gxj = gxjW * W
    gW = gxjW * xj
    grbf_ref[0, 0, zz] = jax.lax.dot_general(
        gW, FW_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HI,
    )
    gdir_ref[0, 0, zz] = jnp.concatenate(gdir_parts, axis=-1)
    gFW_ref[...] += jax.lax.dot_general(
        rbf, gW, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HI,
    )
    # --- fold d(xmu) back onto the table ------------------------------
    gxmu = jnp.concatenate([gxj] + gmuj_parts, axis=-1)     # [CK, 6F]
    H = None
    for piece in _split_f32(gxmu, pieces):
        d = jax.lax.dot_general(
            oh, piece, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        H = d if H is None else H + d                        # [27C, 6F]
    for c9 in range(9):
        blk = part_refs[c9][0, 0, pl.ds(z * C, 3 * C), :]
        part_refs[c9][0, 0, pl.ds(z * C, 3 * C), :] = (
            blk + H[c9 * 3 * C:(c9 + 1) * 3 * C, :]
        )
    return carry


def _fused_fwd(xmu, rbf_aug, dir_ij, FW_aug, qidx):
    out = _fused_fwd_call(xmu, rbf_aug, dir_ij, FW_aug, qidx)
    return out, (xmu, rbf_aug, dir_ij, FW_aug, qidx)


def _fused_bwd(res, cots):
    xmu, rbf_aug, dir_ij, FW_aug, qidx = res
    g_dq, g_dmu = cots
    nx, ny, nz, C, K = qidx.shape
    A, D = xmu.shape
    F = D // 6
    B1 = rbf_aug.shape[-1]
    pieces = _cb.PIECES
    q2 = qidx.reshape(nx, ny, nz, C * K)
    halos = [_halo_cols(p, nx, ny, nz, C, D) for p in _split_f32(xmu, pieces)]
    rbf5 = rbf_aug.reshape(nx, ny, nz, C * K, B1)
    dir5 = dir_ij.reshape(nx, ny, nz, C * K, 3)
    gq5 = g_dq.reshape(nx, ny, nz, C, F)
    gmu5 = g_dmu.reshape(nx, ny, nz, C, 3 * F)
    rows = (nz + 2) * C

    ZC = _zchunk(nz)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C, K=K, F=F, pieces=pieces, ZC=ZC),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_impl() == "pallas_interpret",
        grid=(nx, ny, nz // ZC),
        in_specs=[
            pl.BlockSpec((1, 1, nz, C * K), lambda i, j, k: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, ZC, C * K, B1), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((1, 1, ZC, C * K, 3), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((B1, 3 * F), lambda i, j, k: (0, 0)),
            pl.BlockSpec((1, 1, ZC, C, F), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((1, 1, ZC, C, 3 * F), lambda i, j, k: (i, j, k, 0, 0)),
        ]
        + _col_specs(nx, ny, (nz + 2) * C, D) * pieces,
        out_specs=tuple(
            pl.BlockSpec((1, 1, rows, D), lambda i, j, k: (i, j, 0, 0))
            for _ in range(9)
        ) + (
            pl.BlockSpec((1, 1, ZC, C * K, B1), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((1, 1, ZC, C * K, 3), lambda i, j, k: (i, j, k, 0, 0)),
            pl.BlockSpec((B1, 3 * F), lambda i, j, k: (0, 0)),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nx, ny, rows, D), xmu.dtype)
            for _ in range(9)
        ) + (
            jax.ShapeDtypeStruct((nx, ny, nz, C * K, B1), xmu.dtype),
            jax.ShapeDtypeStruct((nx, ny, nz, C * K, 3), xmu.dtype),
            jax.ShapeDtypeStruct((B1, 3 * F), xmu.dtype),
        ),
    )(q2, rbf5, dir5, FW_aug, gq5, gmu5, *[h for h in halos for _ in range(9)])
    partials, grbf, gdir, gFW = outs[:9], outs[9], outs[10], outs[11]

    dxmu = None
    for (dx, dy), p in zip(COL_OFFSETS, partials):
        core = p[:, :, C:-C, :]
        core = core.at[:, :, :C, :].add(p[:, :, -C:, :])
        core = core.at[:, :, -C:, :].add(p[:, :, :C, :])
        r = jnp.roll(core, (dx, dy), axis=(0, 1))
        dxmu = r if dxmu is None else dxmu + r
    return (
        dxmu.reshape(A, D),
        grbf.reshape(A, K, B1),
        gdir.reshape(A, K, 3),
        gFW,
        None,
    )


_message_fused.defvjp(_fused_fwd, _fused_bwd)
