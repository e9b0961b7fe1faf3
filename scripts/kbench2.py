"""v2 fwd kernel: full z unroll, static slice starts. Compare + time."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from schnetpack_tpu.ops import cellblock_pallas as cbp  # noqa: E402
from schnetpack_tpu.ops.cellblock_pallas import (  # noqa: E402
    _col_specs, _halo_cols, _split_f32,
)
from scripts.kbench import timeit  # noqa: E402


def _fwd_kernel_v2(q_ref, *args, C: int, nz: int, pieces: int):
    cols, out_ref = args[:9 * pieces], args[9 * pieces]
    for z in range(nz):  # static unroll
        q = q_ref[0, 0, z, :]
        CK = q.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (CK, 27 * C), 1)
        oh = (q[:, None] == iota).astype(jnp.bfloat16)
        acc = None
        for piece in range(pieces):
            E = jnp.concatenate(
                [cols[piece * 9 + c9][0, 0, z * C:z * C + 3 * C, :]
                 for c9 in range(9)],
                axis=0,
            )
            d = jax.lax.dot_general(
                oh, E, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        out_ref[0, 0, z] = acc


def cell_gather_fwd_v2(table, qidx, pieces=2):
    nx, ny, nz, C, K = qidx.shape
    D = table.shape[-1]
    q2 = qidx.reshape(nx, ny, nz, C * K)
    halos = [_halo_cols(p, nx, ny, nz, C, D) for p in _split_f32(table, pieces)]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_v2, C=C, nz=nz, pieces=pieces),
        grid=(nx, ny),
        in_specs=[pl.BlockSpec((1, 1, nz, C * K), lambda i, j: (i, j, 0, 0))]
        + [
            pl.BlockSpec(
                (1, 1, (nz + 2) * C, D),
                functools.partial(
                    lambda i, j, di, dj: ((i + di) % nx, (j + dj) % ny, 0, 0),
                    di=di, dj=dj),
            )
            for di, dj in cbp.COL_OFFSETS
        ] * pieces,
        out_specs=pl.BlockSpec((1, 1, nz, C * K, D), lambda i, j: (i, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz, C * K, D), table.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(q2, *[h for h in halos for _ in range(9)])
    return out.reshape(nx * ny * nz * C, K, D)


def main():
    nx = ny = nz = 10
    C, K, D = 16, 20, 768
    rng = np.random.RandomState(0)
    Ap = nx * ny * nz * C
    table = jnp.asarray(rng.randn(Ap, D), jnp.float32)
    qv = rng.randint(0, 27 * C, size=(nx, ny, nz, C, K)).astype(np.int32)
    mask = rng.rand(*qv.shape) < 0.7
    qidx = jnp.asarray(np.where(mask, qv, -1))

    a = cbp.cell_gather_fwd_pallas(table, qidx, pieces=2)
    b = cell_gather_fwd_v2(table, qidx, pieces=2)
    err = float(jnp.abs(a - b).max())
    print("maxerr v2 vs v1:", err)

    timeit("fwd p=2 v2 unroll", lambda t: cell_gather_fwd_v2(t, qidx, pieces=2),
           table)
    timeit("fwd p=1 v2 unroll", lambda t: cell_gather_fwd_v2(t, qidx, pieces=1),
           table)


if __name__ == "__main__":
    main()
