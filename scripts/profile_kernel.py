"""Isolate cell_gather kernel costs on the real TPU at bench scale."""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, ".")
from schnetpack_tpu.ops import cellblock_pallas as cbp  # noqa: E402

nx = ny = nz = 10
C, K, D = 16, 20, 384
Ap = nx * ny * nz * C
rng = np.random.RandomState(0)
table0 = jnp.asarray(rng.randn(Ap, D), jnp.float32)
qidx = jnp.asarray(rng.randint(0, 27 * C, size=(nx, ny, nz, C, K)).astype(np.int32))
g0 = jnp.asarray(rng.randn(Ap, K, D), jnp.float32)


def timeit(name, fn, iters=10):
    def chained(x):
        def body(c, _):
            r = fn(x + c * 0.0)
            return c + r.ravel()[0] * 1e-20, None
        return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

    run = jax.jit(chained)
    jax.block_until_ready(run(table0 + 1e-3))
    t0 = time.time()
    jax.block_until_ready(run(table0))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name}: {dt:.3f} ms", flush=True)


def profile_fused():
    import schnetpack_tpu.ops.painn_fused as pf
    F = 128
    D6 = 6 * F
    B1 = 21
    xmu0 = jnp.asarray(rng.randn(Ap, D6), jnp.float32)
    rbf0 = jnp.asarray(rng.randn(Ap, K, B1), jnp.float32)
    dir0 = jnp.asarray(rng.randn(Ap, K, 3), jnp.float32)
    FW0 = jnp.asarray(rng.randn(B1, 3 * F) * 0.3, jnp.float32)

    def fwd_only(t):
        xmu = jnp.concatenate([t, t, t, t, t, t], axis=-1)[:, :D6]
        dq, dmu = pf._message_fused(xmu, rbf0, dir0, FW0, qidx)
        return dq

    def fwd_bwd(t):
        def loss(tt):
            xmu = jnp.concatenate([tt, tt, tt, tt, tt, tt], axis=-1)[:, :D6]
            dq, dmu = pf._message_fused(xmu, rbf0, dir0, FW0, qidx)
            return jnp.sum(dq) + jnp.sum(dmu)
        return jax.grad(loss)(t)

    timeit("fused fwd", fwd_only)
    timeit("fused fwd+bwd", fwd_bwd)

    def pos_gather(t):
        from schnetpack_tpu.ops.cellblock_pallas import cell_gather_fwd_pallas
        return cell_gather_fwd_pallas(t[:, :3], qidx, pieces=2)

    timeit("pos gather D=3", pos_gather)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "fwd"):
        timeit("fwd p=2", lambda t: cbp.cell_gather_fwd_pallas(t, qidx, pieces=2))
        timeit("fwd p=1", lambda t: cbp.cell_gather_fwd_pallas(t, qidx, pieces=1))
    if which in ("all", "bwd"):
        def bwd_fn(t):
            gg = jnp.repeat(t[:, None, :], K, axis=1)  # derived, no literal
            return cbp.cell_gather_bwd_pallas(gg, qidx, pieces=2)
        timeit("bwd p=2", bwd_fn)
    if which in ("all", "fused"):
        profile_fused()
    if which in ("all", "take"):
        nbh = jnp.asarray(rng.randint(0, Ap, size=(Ap, K)).astype(np.int32))
        timeit("xla take", lambda t: jnp.take(t, nbh, axis=0))
