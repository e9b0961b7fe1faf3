"""Raw in-kernel dot throughput vs (M, depth) shape on the real TPU."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from scripts.kbench import timeit  # noqa: E402

D = 768
REPS = 20  # dots per kernel invocation per grid step


def make(M, Kdep):
    def kernel(a_ref, b_ref, o_ref):
        acc = None
        for r in range(REPS):
            d = jax.lax.dot_general(
                a_ref[r], b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        o_ref[0] = acc

    def run(x):
        a = jnp.stack([jnp.roll(x[:M, :Kdep], r, 0)
                       for r in range(REPS)]).astype(jnp.bfloat16)
        b = (x[:Kdep, :D]).astype(jnp.bfloat16)
        return pl.pallas_call(
            kernel,
            grid=(8,),
            in_specs=[pl.BlockSpec((REPS, M, Kdep), lambda i: (0, 0, 0)),
                      pl.BlockSpec((Kdep, D), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1, M, D), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, M, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(a, b)
    return run


if __name__ == "__main__":
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1024, 1024), jnp.float32)
    for M, Kdep in [(320, 432), (384, 512), (256, 384), (252, 378),
                    (256, 512), (512, 512), (512, 384), (320, 384),
                    (640, 432), (1024, 432)]:
        flop = 8 * REPS * M * Kdep * D * 2
        dt = timeit(f"M={M:5d} K={Kdep:4d}", make(M, Kdep), x0, iters=20)
        print(f"    -> {flop / dt / 1e9:.1f} TFLOP/s")
