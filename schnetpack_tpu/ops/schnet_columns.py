"""Fused SchNet cfconv for the column-bucketed layout.

One kernel per interaction block runs, entirely in VMEM per destination
column:

    gather h_j  ->  W = Dense2(ssp(Dense1(phi))) * fcut  ->  h_j * W
    ->  sum over each atom's edges

with the per-edge radial basis arriving as the feature-major geometry
tensor geo [nx, ny, B+4, Ktot] (RAW phi channels + fcut + dir; see
ops/colblock_geo.py with raw_phi=True — SchNet's filter MLP is nonlinear,
so unlike PaiNN the cutoff cannot be folded into the basis channels).

The filter-generating MLP runs per edge on the MXU inside the kernel
(depth B ~ 20 and F x F dots) — nothing of shape [A, K, F] is ever
materialised in HBM (the torch reference materialises exactly that,
src/schnetpack/representation/schnet.py:60-67).

The hand-written VJP recomputes the forward per bucket (destination-
centric), folds dh back with transposed one-hot matmuls as 9
per-source-column partials (XLA folds them with one roll each), writes
the geometry cotangent feature-major, and accumulates the filter MLP
parameter gradients in VMEM across the grid — the fused path remains
trainable.

No reference counterpart: the reference gathers/scatters flat edge lists.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cellblock as _cb
from .cellblock_pallas import COL_OFFSETS, _split_f32
from .colblock_pallas import _col_view_specs, _cols, _fold_partials, _oh

HI = jax.lax.Precision.HIGHEST


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


def _ssp(z):
    """shifted softplus ln(0.5 e^z + 0.5) = softplus(z) - ln 2."""
    return jax.nn.softplus(z) - jnp.float32(0.6931471805599453)


def _filter_mlp(phi, fcut, W1_ref, b1_ref, W2_ref, b2_ref):
    z1 = jax.lax.dot_general(
        phi, W1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HI,
    ) + b1_ref[0:1, :]
    h1 = _ssp(z1)
    pre = jax.lax.dot_general(
        h1, W2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HI,
    ) + b2_ref[0:1, :]
    return z1, h1, pre, pre * fcut


# ------------------------------------------------------------------ fwd
def _cf_fwd_kernel(q_ref, d_ref, W1_ref, b1_ref, W2_ref, b2_ref,
                   *args, P, F, B, ks, pieces):
    geo_refs = args[:9]
    cols = args[9: 9 + 9 * pieces]
    out_ref = args[9 + 9 * pieces]
    offs = _koffs(ks)
    acc = None
    for c9 in range(9):
        o0, k = offs[c9], ks[c9]
        ohj = _oh(q_ref, o0, k, P)
        hj = None
        for piece in range(pieces):
            d = jax.lax.dot_general(
                ohj, cols[piece * 9 + c9][0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            hj = d if hj is None else hj + d               # [k, F]
        geoT = geo_refs[c9][0, 0].T                        # [k, B+4]
        phi = geoT[:, :B]
        fcut = geoT[:, B:B + 1]
        _, _, _, W = _filter_mlp(phi, fcut, W1_ref, b1_ref, W2_ref, b2_ref)
        msg = hj * W
        ohd = _oh(d_ref, o0, k, P)
        for piece in _split_f32(msg, pieces):
            d = jax.lax.dot_general(
                ohd, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d            # [P, F]
    out_ref[0, 0] = acc


def _geo_part_specs(ks, B):
    return [
        pl.BlockSpec((1, 1, B + 4, k), lambda i, j: (i, j, 0, 0))
        for k in ks
    ]


def _cf_fwd_call(h, geo, W1, b1, W2, b2, qcol, dcol, P, ks, pieces):
    nx, ny, Ktot = qcol.shape
    A, F = h.shape
    B = geo[0].shape[2] - 4
    halos = [_cols(p, nx, ny, P) for p in _split_f32(h, pieces)]
    out = pl.pallas_call(
        functools.partial(_cf_fwd_kernel, P=P, F=F, B=B, ks=ks,
                          pieces=pieces),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B, F), lambda i, j: (0, 0)),
            pl.BlockSpec((1, F), lambda i, j: (0, 0)),
            pl.BlockSpec((F, F), lambda i, j: (0, 0)),
            pl.BlockSpec((1, F), lambda i, j: (0, 0)),
        ] + _geo_part_specs(ks, B) + _col_view_specs(nx, ny, P, F, pieces),
        out_specs=pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, P, F), h.dtype),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], W1, b1[None], W2,
      b2[None], *geo, *[hh for hh in halos for _ in range(9)])
    return out.reshape(A, F)


# ------------------------------------------------------------------ bwd
def _cf_bwd_kernel(q_ref, d_ref, W1_ref, b1_ref, W2_ref, b2_ref,
                   g_ref, *args, P, F, B, ks, pieces):
    geo_refs = args[:9]
    cols = args[9: 9 + 9 * pieces]
    outs = args[9 + 9 * pieces:]
    part_refs = outs[:9]
    ggeo_refs = outs[9:18]
    gW1_ref, gb1_ref, gW2_ref, gb2_ref = outs[18:]
    offs = _koffs(ks)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        gW1_ref[...] = jnp.zeros_like(gW1_ref)
        gb1_ref[...] = jnp.zeros_like(gb1_ref)
        gW2_ref[...] = jnp.zeros_like(gW2_ref)
        gb2_ref[...] = jnp.zeros_like(gb2_ref)

    for c9 in range(9):
        o0, k = offs[c9], ks[c9]
        ohj = _oh(q_ref, o0, k, P)
        ohd = _oh(d_ref, o0, k, P)
        # --- recompute forward intermediates --------------------------
        hj = None
        for piece in range(pieces):
            d = jax.lax.dot_general(
                ohj, cols[piece * 9 + c9][0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            hj = d if hj is None else hj + d
        geoT = geo_refs[c9][0, 0].T                        # [k, B+4]
        phi = geoT[:, :B]
        fcut = geoT[:, B:B + 1]
        z1, h1, pre, W = _filter_mlp(phi, fcut, W1_ref, b1_ref, W2_ref,
                                     b2_ref)
        # --- per-edge cotangents (expand over dcol) -------------------
        gmsg = None
        for piece in _split_f32(g_ref[0, 0], pieces):
            d = jax.lax.dot_general(
                ohd, piece, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gmsg = d if gmsg is None else gmsg + d         # [k, F]
        ghj = gmsg * W
        gW = gmsg * hj
        gfcut = jnp.sum(gW * pre, axis=1, keepdims=True)   # [k, 1]
        gpre = gW * fcut                                   # [k, F]
        gb2_ref[...] += jnp.sum(gpre, axis=0, keepdims=True)
        gW2_ref[...] += jax.lax.dot_general(
            h1, gpre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        gh1 = jax.lax.dot_general(
            gpre, W2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        gz1 = gh1 * jax.nn.sigmoid(z1)
        gb1_ref[...] += jnp.sum(gz1, axis=0, keepdims=True)
        gW1_ref[...] += jax.lax.dot_general(
            phi, gz1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        gphi = jax.lax.dot_general(
            gz1, W1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        # geometry cotangent, feature-major [B+4, k] (dir channels unused)
        ggeo_refs[c9][0, 0, 0:B] = gphi.T
        ggeo_refs[c9][0, 0, B:B + 1] = gfcut.T
        ggeo_refs[c9][0, 0, B + 1:B + 4] = jnp.zeros((3, k), jnp.float32)
        # --- fold dh back onto the table ------------------------------
        acc = None
        for piece in _split_f32(ghj, pieces):
            d = jax.lax.dot_general(
                ohj, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        part_refs[c9][0, 0] = acc


def _cf_bwd_call(h, geo, W1, b1, W2, b2, qcol, dcol, g, P, ks, pieces):
    nx, ny, Ktot = qcol.shape
    A, F = h.shape
    B = geo[0].shape[2] - 4
    halos = [_cols(p, nx, ny, P) for p in _split_f32(h, pieces)]
    g4 = g.reshape(nx, ny, P, F)
    outs = pl.pallas_call(
        functools.partial(_cf_bwd_kernel, P=P, F=F, B=B, ks=ks,
                          pieces=pieces),
        grid=(nx, ny),
        in_specs=[
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, Ktot), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((B, F), lambda i, j: (0, 0)),
            pl.BlockSpec((1, F), lambda i, j: (0, 0)),
            pl.BlockSpec((F, F), lambda i, j: (0, 0)),
            pl.BlockSpec((1, F), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0)),
        ] + _geo_part_specs(ks, B) + _col_view_specs(nx, ny, P, F, pieces),
        out_specs=tuple(
            pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0))
            for _ in range(9)
        ) + tuple(_geo_part_specs(ks, B)) + (
            pl.BlockSpec((B, F), lambda i, j: (0, 0)),
            pl.BlockSpec((1, F), lambda i, j: (0, 0)),
            pl.BlockSpec((F, F), lambda i, j: (0, 0)),
            pl.BlockSpec((1, F), lambda i, j: (0, 0)),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nx, ny, P, F), h.dtype) for _ in range(9)
        ) + tuple(
            jax.ShapeDtypeStruct((nx, ny, B + 4, k), h.dtype) for k in ks
        ) + (
            jax.ShapeDtypeStruct((B, F), h.dtype),
            jax.ShapeDtypeStruct((1, F), h.dtype),
            jax.ShapeDtypeStruct((F, F), h.dtype),
            jax.ShapeDtypeStruct((1, F), h.dtype),
        ),
        compiler_params=_vmem_params(),
        interpret=_interp(),
    )(qcol[:, :, None, :], dcol[:, :, None, :], W1, b1[None], W2,
      b2[None], g4, *geo, *[hh for hh in halos for _ in range(9)])
    partials = outs[:9]
    ggeo = tuple(outs[9:18])
    gW1, gb1, gW2, gb2 = outs[18], outs[19][0], outs[20], outs[21][0]
    dh = _fold_partials(partials, nx, ny, P, F)
    return dh.reshape(A, F), ggeo, gW1, gb1, gW2, gb2


# ----------------------------------------------------- public op + VJP
@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _cfconv_p(h, geo, W1, b1, W2, b2, qcol, dcol, P, ks):
    return _cf_fwd_call(h, geo, W1, b1, W2, b2, qcol, dcol, P, ks,
                        _cb.PIECES)


def _cfp_fwd(h, geo, W1, b1, W2, b2, qcol, dcol, P, ks):
    out = _cfconv_p(h, geo, W1, b1, W2, b2, qcol, dcol, P, ks)
    return out, (h, geo, W1, b1, W2, b2, qcol, dcol)


def _cfp_bwd(P, ks, res, g):
    h, geo, W1, b1, W2, b2, qcol, dcol = res
    dh, ggeo, gW1, gb1, gW2, gb2 = _cf_bwd_call(
        h, geo, W1, b1, W2, b2, qcol, dcol, g, P, ks, _cb.PIECES)
    return dh, ggeo, gW1, gb1, gW2, gb2, None, None


_cfconv_p.defvjp(_cfp_fwd, _cfp_bwd)


def schnet_cfconv_columns(h, geo, W1, b1, W2, b2, refs):
    """Fused cfconv over the column layout.

    Args:
        h: [A', F] in2f output table (cell-sorted space).
        geo: 9-part per-bucket tuple of RAW-phi feature-major geometry
            tensors [nx, ny, B+4, k_c9] (colblock_geo.column_geometry
            with raw_phi=True).
        W1, b1: filter Dense 1 params ([B, F], [F]).
        W2, b2: filter Dense 2 params ([F, F], [F]).
        refs: ColRefs.

    Returns:
        [A', F] per-atom aggregated messages.
    """
    if _cb._impl().startswith("pallas"):
        return _cfconv_p(h, geo, W1, b1, W2, b2, refs.qcol, refs.dcol,
                         refs.P, refs.ksizes)
    return _cfconv_xla(h, geo, W1, b1, W2, b2, refs)


def _cfconv_xla(h, geo, W1, b1, W2, b2, refs):
    """XLA reference (numerics oracle)."""
    from .colblock import _column_fold_xla, _column_gather_xla
    from .colblock_geo import concat_geo

    geo = concat_geo(geo)
    B = geo.shape[2] - 4
    g = jnp.moveaxis(geo, 2, 3)                            # [nx,ny,Ktot,B+4]
    phi = g[..., :B]
    fcut = g[..., B:B + 1]
    z1 = jnp.einsum("...b,bf->...f", phi, W1, precision=HI) + b1
    pre = jnp.einsum("...g,gf->...f", _ssp(z1), W2, precision=HI) + b2
    W = pre * fcut
    hj = _column_gather_xla(h, refs)
    return _column_fold_xla(hj * W, refs)
