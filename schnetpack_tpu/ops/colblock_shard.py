"""Slab-sharded column kernels: real multi-chip spatial decomposition.

The column-bucket layout (ops/colblock.py) shards naturally: each device
owns a contiguous slab of xy-columns (nx_loc = nx / n_devices along x).
Per interaction block, only the two x-boundary *column planes*
[1, ny, P, D] cross the interconnect — exchanged with ``jax.lax.ppermute``
— instead of all-gathering the whole feature table (what the round-1
``parallel/spatial.py`` annotations did).  Per-device traffic is
O(A/n_dev + halo), per-device compute is the local slab's kernels.

The halo exchange lives in plain JAX *outside* the custom-VJP kernels, so
autodiff transposes the ppermutes automatically: gradient give-back of
boundary contributions to neighbor shards needs no hand-written
collective code.  Forces against a replicated single-device run agree to
float32 resolution (tests/test_colblock_shard.py).

This is the TPU analog of the reference's MPI local+ghost decomposition
(/root/reference/interfaces/lammps/pair_schnetpack.cpp:250-352) — halo
ghosts over ICI instead of MPI ranks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import cellblock as _cb
from .cellblock_pallas import _split_f32

#: the shard_map mesh axis name the column ops synchronise over
COLS_AXIS = "cols"

HI = jax.lax.Precision.HIGHEST


def halo_x(cols: jax.Array, axis) -> jax.Array:
    """[nx_loc, ny, P, D] -> [nx_loc+2, ny, P, D] with ppermute'd x-halos.

    With a single shard the ppermutes are self-loops and the halo is the
    periodic wrap — the sharded path is exact for any device count.
    """
    size = jax.lax.axis_size(axis)
    fwd = [(i, (i + 1) % size) for i in range(size)]
    bwd = [(i, (i - 1) % size) for i in range(size)]
    left = jax.lax.ppermute(cols[-1:], axis, fwd)   # my right edge -> right nb
    right = jax.lax.ppermute(cols[:1], axis, bwd)
    return jnp.concatenate([left, cols, right], axis=0)


def _decode_hx(qcol, ksizes, ny, P):
    """Edge -> row index into the x-halo'd flattened table (+ mask)."""
    import numpy as np

    nx_loc, ny_, Ktot = qcol.shape
    valid = qcol >= 0
    q = jnp.where(valid, qcol, 0)
    x = jnp.arange(nx_loc)[:, None, None]
    y = jnp.arange(ny)[None, :, None]
    c9 = jnp.asarray(np.repeat(np.arange(9), np.asarray(ksizes)))[None, None, :]
    dx = c9 // 3 - 1
    dy = c9 % 3 - 1
    xs = x + dx + 1                       # into the halo'd x axis, no wrap
    ys = jnp.mod(y + dy, ny)
    j = (xs * ny + ys) * P + q
    return j, valid


def _gather_hx_xla(table_h, qcol, ksizes, P):
    nx2, ny, P_, D = table_h.shape
    j, valid = _decode_hx(qcol, ksizes, ny, P)
    out = jnp.take(table_h.reshape(-1, D), j, axis=0)
    return out * valid[..., None].astype(table_h.dtype)


# ------------------------------------------------- pallas halo'd kernels
def _gather_hx_call(table_h, qcol, P, ks, pieces, interpret):
    import jax.experimental.pallas as pl

    from .colblock_pallas import (
        _gather_fwd_kernel, _vmem_params,
    )

    nx_loc, ny, Ktot = qcol.shape
    D = table_h.shape[-1]
    halos = _split_f32(table_h, pieces)
    specs = [
        pl.BlockSpec(
            (1, 1, P, D),
            functools.partial(
                lambda i, j, di, dj: (i + di + 1, (j + dj) % ny, 0, 0),
                di=di, dj=dj,
            ),
        )
        for _ in range(pieces)
        for di in (-1, 0, 1)
        for dj in (-1, 0, 1)
    ]
    return pl.pallas_call(
        functools.partial(_gather_fwd_kernel, P=P, ks=ks, pieces=pieces),
        grid=(nx_loc, ny),
        in_specs=[pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0))]
        + specs,
        out_specs=pl.BlockSpec((1, 1, Ktot, D), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx_loc, ny, Ktot, D), table_h.dtype),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(qcol[:, :, None, :], *[h for h in halos for _ in range(9)])


def _gather_hx_bwd_call(g, qcol, P, ks, pieces, interpret):
    import jax.experimental.pallas as pl

    from .colblock_pallas import _gather_bwd_kernel, _vmem_params

    nx_loc, ny, Ktot = qcol.shape
    D = g.shape[-1]
    partials = pl.pallas_call(
        functools.partial(_gather_bwd_kernel, P=P, ks=ks, pieces=pieces),
        grid=(nx_loc, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, D), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 1, P, D), lambda i, j: (i, j, 0, 0))
            for _ in range(9)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nx_loc, ny, P, D), g.dtype)
            for _ in range(9)
        ),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(qcol[:, :, None, :], g)
    return _fold_partials_hx(partials, nx_loc, ny, P, D)


def _fold_partials_hx(partials, nx_loc, ny, P, D):
    """Fold per-source-column partials into the x-halo'd cotangent."""
    idx = 0
    dT = jnp.zeros((nx_loc + 2, ny, P, D), partials[0].dtype)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            p = jnp.roll(partials[idx], dj, axis=1)
            dT = dT.at[1 + di:1 + di + nx_loc].add(p)
            idx += 1
    return dT


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_hx_p(table_h, qcol, P, ks):
    return _gather_hx_call(table_h, qcol, P, ks, _cb.PIECES,
                           _cb._impl() == "pallas_interpret")


def _ghx_fwd(table_h, qcol, P, ks):
    return _gather_hx_p(table_h, qcol, P, ks), (table_h.shape, qcol)


def _ghx_bwd(P, ks, res, g):
    th_shape, qcol = res
    dT = _gather_hx_bwd_call(g, qcol, P, ks, _cb.PIECES,
                             _cb._impl() == "pallas_interpret")
    return dT.reshape(th_shape), None


_gather_hx_p.defvjp(_ghx_fwd, _ghx_bwd)


# ---------------------------------------------------------- public ops
def column_gather_sharded(table, refs):
    """Sharded per-edge source rows (halo exchange + local kernels)."""
    nx_loc, ny, Ktot = refs.qcol.shape
    P = refs.P
    D = table.shape[-1]
    table_h = halo_x(table.reshape(nx_loc, ny, P, D), refs.shard_axis)
    if _cb._impl().startswith("pallas"):
        return _gather_hx_p(table_h, refs.qcol, P, refs.ksizes)
    return _gather_hx_xla(table_h, refs.qcol, refs.ksizes, P)


def painn_message_columns_sharded(xmu, rbf_aug, dir_e, FW_aug, refs):
    """Sharded fused PaiNN message (halo exchange + local kernels)."""
    nx_loc, ny, Ktot = refs.qcol.shape
    P = refs.P
    A, D6 = xmu.shape
    xmu_h = halo_x(xmu.reshape(nx_loc, ny, P, D6), refs.shard_axis)
    if _cb._impl().startswith("pallas"):
        return _msg_hx_p(xmu_h, rbf_aug, dir_e, FW_aug,
                         refs.qcol, refs.dcol, P, refs.ksizes)
    return _msg_hx_xla(xmu_h, rbf_aug, dir_e, FW_aug, refs)


def _msg_hx_xla(xmu_h, rbf_aug, dir_e, FW_aug, refs):
    from .colblock import _column_fold_xla

    nx_loc, ny, Ktot = refs.qcol.shape
    P = refs.P
    F = xmu_h.shape[-1] // 6
    gathered = _gather_hx_xla(xmu_h, refs.qcol, refs.ksizes, P)
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
    msg = jnp.concatenate([dqe] + msg_mu, axis=-1)
    folded = _column_fold_xla(msg, refs)
    return folded[:, :F], folded[:, F:]


def _msg_hx_fwd_call(xmu_h, rbf_aug, dir_e, FW_aug, qcol, dcol, P, ks,
                     pieces, interpret):
    import jax.experimental.pallas as pl

    from .colblock_pallas import _msg_fwd_kernel, _vmem_params

    nx_loc, ny, Ktot = qcol.shape
    D6 = xmu_h.shape[-1]
    F = D6 // 6
    B1 = rbf_aug.shape[-1]
    halos = _split_f32(xmu_h, pieces)
    specs = [
        pl.BlockSpec(
            (1, 1, P, D6),
            functools.partial(
                lambda i, j, di, dj: (i + di + 1, (j + dj) % ny, 0, 0),
                di=di, dj=dj,
            ),
        )
        for _ in range(pieces)
        for di in (-1, 0, 1)
        for dj in (-1, 0, 1)
    ]
    dq, dmu = pl.pallas_call(
        functools.partial(_msg_fwd_kernel, P=P, F=F, ks=ks, pieces=pieces),
        grid=(nx_loc, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, B1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, 3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
        ] + specs,
        out_specs=(
            pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, P, 3 * F), lambda i, j: (i, j, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nx_loc, ny, P, F), xmu_h.dtype),
            jax.ShapeDtypeStruct((nx_loc, ny, P, 3 * F), xmu_h.dtype),
        ),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(qcol[:, :, None, :], dcol[:, :, None, :], rbf_aug, dir_e, FW_aug,
      *[h for h in halos for _ in range(9)])
    A = nx_loc * ny * P
    return dq.reshape(A, F), dmu.reshape(A, 3 * F)


def _msg_hx_bwd_call(xmu_h, rbf_aug, dir_e, FW_aug, qcol, dcol, cots,
                     P, ks, pieces, interpret):
    import jax.experimental.pallas as pl

    from .colblock_pallas import _msg_bwd_kernel, _vmem_params

    g_dq, g_dmu = cots
    nx_loc, ny, Ktot = qcol.shape
    D6 = xmu_h.shape[-1]
    F = D6 // 6
    B1 = rbf_aug.shape[-1]
    halos = _split_f32(xmu_h, pieces)
    gq5 = g_dq.reshape(nx_loc, ny, P, F)
    gmu5 = g_dmu.reshape(nx_loc, ny, P, 3 * F)
    specs = [
        pl.BlockSpec(
            (1, 1, P, D6),
            functools.partial(
                lambda i, j, di, dj: (i + di + 1, (j + dj) % ny, 0, 0),
                di=di, dj=dj,
            ),
        )
        for _ in range(pieces)
        for di in (-1, 0, 1)
        for dj in (-1, 0, 1)
    ]
    outs = pl.pallas_call(
        functools.partial(_msg_bwd_kernel, P=P, F=F, ks=ks, pieces=pieces),
        grid=(nx_loc, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, B1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, 3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, P, 3 * F), lambda i, j: (i, j, 0, 0)),
        ] + specs,
        out_specs=tuple(
            pl.BlockSpec((1, 1, P, D6), lambda i, j: (i, j, 0, 0))
            for _ in range(9)
        ) + (
            pl.BlockSpec((1, 1, Ktot, B1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, Ktot, 3), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nx_loc, ny, P, D6), xmu_h.dtype)
            for _ in range(9)
        ) + (
            jax.ShapeDtypeStruct((nx_loc, ny, Ktot, B1), xmu_h.dtype),
            jax.ShapeDtypeStruct((nx_loc, ny, Ktot, 3), xmu_h.dtype),
            jax.ShapeDtypeStruct((B1, 3 * F), xmu_h.dtype),
        ),
        compiler_params=_vmem_params(),
        interpret=interpret,
    )(qcol[:, :, None, :], dcol[:, :, None, :], rbf_aug, dir_e, FW_aug,
      gq5, gmu5, *[h for h in halos for _ in range(9)])
    partials, grbf, gdir, gFW = outs[:9], outs[9], outs[10], outs[11]
    D6 = xmu_h.shape[-1]
    dxmu_h = _fold_partials_hx(partials, nx_loc, ny, P, D6)
    return dxmu_h, grbf, gdir, gFW


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _msg_hx_p(xmu_h, rbf_aug, dir_e, FW_aug, qcol, dcol, P, ks):
    return _msg_hx_fwd_call(xmu_h, rbf_aug, dir_e, FW_aug, qcol, dcol,
                            P, ks, _cb.PIECES,
                            _cb._impl() == "pallas_interpret")


def _mhx_fwd(xmu_h, rbf_aug, dir_e, FW_aug, qcol, dcol, P, ks):
    out = _msg_hx_p(xmu_h, rbf_aug, dir_e, FW_aug, qcol, dcol, P, ks)
    return out, (xmu_h, rbf_aug, dir_e, FW_aug, qcol, dcol)


def _mhx_bwd(P, ks, res, cots):
    xmu_h, rbf_aug, dir_e, FW_aug, qcol, dcol = res
    dxmu_h, grbf, gdir, gFW = _msg_hx_bwd_call(
        xmu_h, rbf_aug, dir_e, FW_aug, qcol, dcol, cots, P, ks, _cb.PIECES,
        _cb._impl() == "pallas_interpret")
    return dxmu_h, grbf, gdir, gFW, None, None


_msg_hx_p.defvjp(_mhx_fwd, _mhx_bwd)
