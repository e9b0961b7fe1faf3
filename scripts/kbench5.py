"""What binds the fwd kernel: dots, E-concat, or per-z overhead?"""
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
C, K, D = 16, 18, 768
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


def body_common(q_ref, z):
    q = q_ref[0, 0, z, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (CK, 27 * C), 1)
    return (q[:, None] == iota).astype(jnp.bfloat16)


def k_full(q_ref, *args, pieces):
    cols, out_ref = args[:9 * pieces], args[9 * pieces]
    for z in range(nz):
        oh = body_common(q_ref, z)
        acc = None
        for piece in range(pieces):
            E = jnp.concatenate(
                [cols[piece * 9 + c9][0, 0, z * C:z * C + 3 * C, :]
                 for c9 in range(9)], axis=0)
            d = jax.lax.dot_general(oh, E, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        out_ref[0, 0, z] = acc


def k_no_dot(q_ref, *args, pieces):
    """concat + oh + write, dot replaced by cheap reduce."""
    cols, out_ref = args[:9 * pieces], args[9 * pieces]
    for z in range(nz):
        oh = body_common(q_ref, z)
        acc = None
        for piece in range(pieces):
            E = jnp.concatenate(
                [cols[piece * 9 + c9][0, 0, z * C:z * C + 3 * C, :]
                 for c9 in range(9)], axis=0)
            d = (jnp.sum(E, axis=0, keepdims=True).astype(jnp.float32)
                 + jnp.sum(oh[:, :1]))
            acc = d if acc is None else acc + d
        out_ref[0, 0, z] = jnp.broadcast_to(acc, (CK, D))


def k_const_E(q_ref, *args, pieces):
    """dot + oh + write against a z-independent hoisted E (concat once)."""
    cols, out_ref = args[:9 * pieces], args[9 * pieces]
    Es = []
    for piece in range(pieces):
        Es.append(jnp.concatenate(
            [cols[piece * 9 + c9][0, 0, 0:3 * C, :] for c9 in range(9)],
            axis=0))
    for z in range(nz):
        oh = body_common(q_ref, z)
        acc = None
        for piece in range(pieces):
            d = jax.lax.dot_general(oh, Es[piece], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        out_ref[0, 0, z] = acc


if __name__ == "__main__":
    timeit("full p=2   ", call(k_full, 2), table0)
    timeit("no-dot p=2 ", call(k_no_dot, 2), table0)
    timeit("const-E p=2", call(k_const_E, 2), table0)
    timeit("full p=1   ", call(k_full, 1), table0)
    timeit("const-E p=1", call(k_const_E, 1), table0)
