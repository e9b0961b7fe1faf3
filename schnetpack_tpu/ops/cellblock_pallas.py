"""Fused Pallas kernels for the cell-blocked neighbor gather.

The XLA formulation (ops/cellblock.py) materialises the candidate tile
E [n_cells, 27C, D] and a one-hot selection in HBM; at 10k atoms those are
~0.5-1.5 GB of traffic per gather.  The kernel eliminates both:

* grid (nx, ny, nz), z innermost; the 9 xy-neighbor *columns* of the table
  arrive as windowed block views via modular ``index_map`` — each column
  stays resident in VMEM while the kernel sweeps z, so HBM reads are ~9x
  the table instead of 27x (and nothing else);
* columns carry one cell of z-halo at each end (built with two static
  concats in XLA), so each column's three z-neighbor tiles are a single
  contiguous 3C-row slice — the candidate tile E [27C, D] is 9 VMEM
  slices, matching the dz-minor offset enumeration of ``OFFSETS``;
* the one-hot selection is built in registers from the int32 candidate
  indices (no HBM one-hot) and contracted on the MXU in ``pieces`` bf16
  passes: one-hot entries are exact in bf16, so 2 pieces give ~16-bit
  mantissa accuracy and 3 pieces reconstruct float32 exactly.

The backward kernel reads the [A, K, D] cotangent exactly once, folds it
onto the candidate axis with a transposed one-hot matmul, and accumulates
per-source-column halo'd partials that XLA reduces with 9 static rolls —
the whole VJP is scatter-free.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

COL_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _split_f32(x: jax.Array, pieces: int):
    """Split float32 into `pieces` bf16 terms (exact sum for pieces=3)."""
    parts = []
    rest = x
    for _ in range(pieces - 1):
        p = rest.astype(jnp.bfloat16)
        parts.append(p)
        rest = rest - p.astype(jnp.float32)
    parts.append(rest.astype(jnp.bfloat16))
    return parts


def _pieces_dot(oh_bf16, mat_f32, pieces, dims):
    acc = None
    for piece in _split_f32(mat_f32, pieces):
        d = jax.lax.dot_general(
            oh_bf16, piece, dims, preferred_element_type=jnp.float32
        )
        acc = d if acc is None else acc + d
    return acc


def _halo_cols(table, nx, ny, nz, C, D):
    """[nx, ny, (nz+2)*C, D] columns with one wrapped z-cell of halo."""
    tcol = table.reshape(nx, ny, nz * C, D)
    return jnp.concatenate(
        [tcol[:, :, -C:], tcol, tcol[:, :, :C]], axis=2
    )


def _col_specs(nx, ny, rows, D):
    return [
        pl.BlockSpec(
            (1, 1, rows, D),
            functools.partial(
                lambda i, j, k, di, dj: ((i + di) % nx, (j + dj) % ny, 0, 0),
                di=di, dj=dj,
            ),
        )
        for di, dj in COL_OFFSETS
    ]


def _zchunk(nz: int, target: int = 5) -> int:
    """Largest divisor of nz that is <= target (grid-step amortisation)."""
    for zc in range(min(target, nz), 0, -1):
        if nz % zc == 0:
            return zc
    return 1


def _fwd_kernel(q_ref, *args, C: int, pieces: int, ZC: int):
    cols, out_ref = args[:9 * pieces], args[9 * pieces]
    z0 = pl.program_id(2) * ZC

    def body(zz, carry):
        z = z0 + zz
        q = q_ref[0, 0, z, :]  # [CK]
        CK = q.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (CK, 27 * C), 1)
        oh = (q[:, None] == iota).astype(jnp.bfloat16)
        acc = None
        for piece in range(pieces):
            # E [27C, D]: 9 contiguous 3C windows (halo rows z*C..z*C+3C)
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
        out_ref[0, 0, zz] = acc
        return carry

    jax.lax.fori_loop(0, ZC, body, 0)


def cell_gather_fwd_pallas(table, qidx, pieces=2, interpret=False):
    nx, ny, nz, C, K = qidx.shape
    D = table.shape[-1]
    q2 = qidx.reshape(nx, ny, nz, C * K)
    # bf16 table pieces built once in XLA (one-hot rows are exact in bf16,
    # so the selected values sum back to `pieces`-term accuracy)
    halos = [
        _halo_cols(p, nx, ny, nz, C, D) for p in _split_f32(table, pieces)
    ]

    ZC = _zchunk(nz)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C, pieces=pieces, ZC=ZC),
        grid=(nx, ny, nz // ZC),
        in_specs=[pl.BlockSpec((1, 1, nz, C * K), lambda i, j, k: (i, j, 0, 0))]
        + _col_specs(nx, ny, (nz + 2) * C, D) * pieces,
        out_specs=pl.BlockSpec(
            (1, 1, ZC, C * K, D), lambda i, j, k: (i, j, k, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz, C * K, D), table.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q2, *[h for h in halos for _ in range(9)])
    return out.reshape(nx * ny * nz * C, K, D)


def _bwd_kernel(q_ref, *args, C: int, pieces: int, ZC: int):
    g_refs, outs = args[:pieces], args[pieces:]
    zc = pl.program_id(2)

    @pl.when(zc == 0)
    def _():
        for o_ref in outs:
            o_ref[...] = jnp.zeros_like(o_ref)

    def body(zz, carry):
        z = zc * ZC + zz
        q = q_ref[0, 0, z, :]
        CK = q.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (CK, 27 * C), 1)
        oh = (q[:, None] == iota).astype(jnp.bfloat16)
        # H [27C, D]: cotangent folded onto the candidate axis
        H = None
        for g_ref in g_refs:
            d = jax.lax.dot_general(
                oh, g_ref[0, 0, zz], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            H = d if H is None else H + d
        for c9 in range(9):
            blk = outs[c9][0, 0, pl.ds(z * C, 3 * C), :]
            outs[c9][0, 0, pl.ds(z * C, 3 * C), :] = (
                blk + H[c9 * 3 * C:(c9 + 1) * 3 * C, :]
            )
        return carry

    jax.lax.fori_loop(0, ZC, body, 0)


def cell_gather_bwd_pallas(g, qidx, pieces=2, interpret=False):
    nx, ny, nz, C, K = qidx.shape
    D = g.shape[-1]
    q2 = qidx.reshape(nx, ny, nz, C * K)
    g_pieces = [
        p.reshape(nx, ny, nz, C * K, D) for p in _split_f32(g, pieces)
    ]
    rows = (nz + 2) * C

    ZC = _zchunk(nz)
    partials = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C, pieces=pieces, ZC=ZC),
        grid=(nx, ny, nz // ZC),
        in_specs=[pl.BlockSpec((1, 1, nz, C * K), lambda i, j, k: (i, j, 0, 0))]
        + [
            pl.BlockSpec((1, 1, ZC, C * K, D), lambda i, j, k: (i, j, k, 0, 0))
            for _ in range(pieces)
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 1, rows, D), lambda i, j, k: (i, j, 0, 0))
            for _ in range(9)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nx, ny, rows, D), g.dtype) for _ in range(9)
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q2, *g_pieces)
    # fold: z-halo rows wrap onto the column ends, then the partial written
    # at source column (i, j) for offset (dx, dy) belongs to column
    # (i+dx, j+dy)
    dT = None
    for (dx, dy), p in zip(COL_OFFSETS, partials):
        core = p[:, :, C:-C, :]
        core = core.at[:, :, :C, :].add(p[:, :, -C:, :])
        core = core.at[:, :, -C:, :].add(p[:, :, :C, :])
        r = jnp.roll(core, (dx, dy), axis=(0, 1))
        dT = r if dT is None else dT + r
    return dT.reshape(nx * ny * nz * C, D)
