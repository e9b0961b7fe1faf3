"""Isolate fwd-kernel cost components: dots vs concat vs one-hot vs write."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from schnetpack_tpu.ops import cellblock_pallas as cbp  # noqa: E402
from schnetpack_tpu.ops.cellblock_pallas import _halo_cols, _split_f32  # noqa: E402
from scripts.kbench import timeit  # noqa: E402

nx = ny = nz = 10
C, K, D = 16, 20, 768
CK = C * K
rng = np.random.RandomState(0)
Ap = nx * ny * nz * C
table0 = jnp.asarray(rng.randn(Ap, D), jnp.float32)
qv = rng.randint(0, 27 * C, size=(nx, ny, nz, C, K)).astype(np.int32)
mask = rng.rand(*qv.shape) < 0.7
qidx = jnp.asarray(np.where(mask, qv, -1))
q2 = qidx.reshape(nx, ny, nz, CK)


def call(kernel, pieces, **kw):
    def run(table):
        halos = [_halo_cols(p, nx, ny, nz, C, D)
                 for p in _split_f32(table, pieces)]
        return pl.pallas_call(
            functools.partial(kernel, pieces=pieces, **kw),
            grid=(nx, ny),
            in_specs=[pl.BlockSpec((1, 1, nz, CK), lambda i, j: (i, j, 0, 0))]
            + [
                pl.BlockSpec(
                    (1, 1, (nz + 2) * C, D),
                    functools.partial(
                        lambda i, j, di, dj: ((i + di) % nx, (j + dj) % ny, 0, 0),
                        di=di, dj=dj),
                )
                for di, dj in cbp.COL_OFFSETS
            ] * pieces,
            out_specs=pl.BlockSpec((1, 1, nz, CK, D), lambda i, j: (i, j, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nx, ny, nz, CK, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(q2, *[h for h in halos for _ in range(9)])
    return run


def k_full(q_ref, *args, pieces):
    cols, out_ref = args[:9 * pieces], args[9 * pieces]
    for z in range(nz):
        q = q_ref[0, 0, z, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (CK, 27 * C), 1)
        oh = (q[:, None] == iota).astype(jnp.bfloat16)
        acc = None
        for piece in range(pieces):
            E = jnp.concatenate(
                [cols[piece * 9 + c9][0, 0, z * C:z * C + 3 * C, :]
                 for c9 in range(9)], axis=0)
            d = jax.lax.dot_general(oh, E, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        out_ref[0, 0, z] = acc


def k_static_slab(q_ref, *args, pieces):
    """Concat of z-independent static slices (timing only: concat hoistable)."""
    cols, out_ref = args[:9 * pieces], args[9 * pieces]
    for z in range(nz):
        q = q_ref[0, 0, z, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (CK, 27 * C), 1)
        oh = (q[:, None] == iota).astype(jnp.bfloat16)
        acc = None
        for piece in range(pieces):
            E = jnp.concatenate(
                [cols[piece * 9 + c9][0, 0, 0:3 * C, :]
                 for c9 in range(9)], axis=0)
            d = jax.lax.dot_general(oh, E, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        out_ref[0, 0, z] = acc


def k_nine_dots(q_ref, *args, pieces):
    """9 separate depth-3C dots, no concat (correct result)."""
    cols, out_ref = args[:9 * pieces], args[9 * pieces]
    for z in range(nz):
        q = q_ref[0, 0, z, :]
        acc = None
        for c9 in range(9):
            iota = jax.lax.broadcasted_iota(jnp.int32, (CK, 3 * C), 1)
            qq = q - c9 * 3 * C
            oh = (qq[:, None] == iota).astype(jnp.bfloat16)
            for piece in range(pieces):
                E = cols[piece * 9 + c9][0, 0, z * C:z * C + 3 * C, :]
                d = jax.lax.dot_general(oh, E, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
        out_ref[0, 0, z] = acc


def k_no_oh(q_ref, *args, pieces):
    """Concat but constant selection matrix (measures oh-build cost by diff)."""
    cols, out_ref = args[:9 * pieces], args[9 * pieces]
    iota0 = jax.lax.broadcasted_iota(jnp.int32, (CK, 27 * C), 1)
    oh = (iota0 == 3).astype(jnp.bfloat16)
    for z in range(nz):
        acc = None
        for piece in range(pieces):
            E = jnp.concatenate(
                [cols[piece * 9 + c9][0, 0, z * C:z * C + 3 * C, :]
                 for c9 in range(9)], axis=0)
            d = jax.lax.dot_general(oh, E, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        out_ref[0, 0, z] = acc


def k_no_write(q_ref, *args, pieces):
    """Full compute but single accumulated write (measures out-write cost)."""
    cols, out_ref = args[:9 * pieces], args[9 * pieces]
    total = None
    for z in range(nz):
        q = q_ref[0, 0, z, :]
        iota = jax.lax.broadcasted_iota(jnp.int32, (CK, 27 * C), 1)
        oh = (q[:, None] == iota).astype(jnp.bfloat16)
        acc = None
        for piece in range(pieces):
            E = jnp.concatenate(
                [cols[piece * 9 + c9][0, 0, z * C:z * C + 3 * C, :]
                 for c9 in range(9)], axis=0)
            d = jax.lax.dot_general(oh, E, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        total = acc if total is None else total + acc
    out_ref[0, 0, 0] = total


if __name__ == "__main__":
    a = call(k_full, 2)(table0)
    b = call(k_nine_dots, 2)(table0)
    print("nine-dots maxerr:", float(jnp.abs(a - b).max()))
    timeit("full p=2      ", call(k_full, 2), table0)
    timeit("static-slab p=2", call(k_static_slab, 2), table0)
    timeit("nine-dots p=2 ", call(k_nine_dots, 2), table0)
    timeit("no-oh p=2     ", call(k_no_oh, 2), table0)
    timeit("no-write p=2  ", call(k_no_write, 2), table0)
