"""Chained-scan microbench for cellblock kernel variants on the real TPU.

Follows PERF.md methodology: data-dependent chain inside one scan dispatch,
warmup on different data than the timed run.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(name, fn, x0, iters=50):
    """fn: x -> array; chains via adding a tiny output-derived delta to x.

    block_until_ready does NOT reliably sync through the axon tunnel, so we
    device_get a scalar derived from the chained carry (forces completion)
    and subtract the measured RTT of a trivial round-trip.
    """
    def chained(x):
        def body(c, _):
            r = fn(c)
            # fold a scalar of the result back into the carry (cheap)
            return c + jnp.float32(1e-30) * r.ravel()[0], None
        c, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(c[..., :1])

    run = jax.jit(chained)
    trivial = jax.jit(lambda x: jnp.sum(x[..., :1]))
    float(jax.device_get(run(x0 + jnp.float32(1.0))))  # warm, different data
    float(jax.device_get(trivial(x0 + jnp.float32(2.0))))
    t0 = time.time()
    float(jax.device_get(trivial(x0 + jnp.float32(3.0))))
    rtt = time.time() - t0
    t0 = time.time()
    float(jax.device_get(run(x0)))
    dt = (time.time() - t0 - rtt) / iters * 1e3
    print(f"{name}: {dt:.3f} ms  (rtt {rtt*1e3:.0f} ms)", flush=True)
    return dt


def main():
    from schnetpack_tpu.ops import cellblock as cb
    from schnetpack_tpu.ops import cellblock_pallas as cbp

    nx = ny = nz = 10
    C, K, D = 16, 20, 768
    rng = np.random.RandomState(0)
    Ap = nx * ny * nz * C
    table = jnp.asarray(rng.randn(Ap, D), jnp.float32)
    # realistic qidx: ~70% valid, candidates within window
    qv = rng.randint(0, 27 * C, size=(nx, ny, nz, C, K)).astype(np.int32)
    mask = rng.rand(*qv.shape) < 0.7
    qidx = jnp.asarray(np.where(mask, qv, -1))

    timeit("fwd p=2 cur", lambda t: cbp.cell_gather_fwd_pallas(t, qidx, pieces=2),
           table)
    timeit("fwd p=1 cur", lambda t: cbp.cell_gather_fwd_pallas(t, qidx, pieces=1),
           table)


if __name__ == "__main__":
    main()
