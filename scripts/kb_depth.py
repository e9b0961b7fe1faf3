"""MXU contraction-depth scaling on v5e: does a [k, S] @ [S, N] bf16 dot
with S < 128 run at S-proportional cost (useful for windowed buckets) or
get padded to the 128 tile?

Chained dots (each rep feeds the next) so nothing can be CSE'd or
reordered; FLOPs counted per useful contraction depth.

Run: python scripts/kb_depth.py
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
from scripts.kb_r5 import profile_device_ms


def main(iters=20):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    k, N, reps = 4096, 512, 16
    rng = np.random.RandomState(0)

    for S in (128, 104, 64, 56, 32):
        down = jnp.asarray(rng.rand(k, S) < (1.0 / S), jnp.bfloat16)
        up = jnp.asarray(rng.rand(S, k) < (1.0 / k), jnp.bfloat16)

        def kern(dn_ref, up_ref, t_ref, o_ref):
            x = t_ref[...]                       # [S, N] bf16
            for _ in range(reps):
                big = jax.lax.dot_general(       # [k, N]
                    dn_ref[...], x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                x = jax.lax.dot_general(         # [S, N] (depth k)
                    up_ref[...], big.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
            o_ref[...] = x.astype(jnp.float32)

        def call(t):
            return (pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((S, N), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=params,
            )(down, up, t),)

        tbl = jnp.asarray(rng.randn(S, N) * 0.1, jnp.bfloat16)
        ms = profile_device_ms(lambda t: call(t), tbl, iters, f"depthc{S}")
        # only the DOWN dots' FLOPs scale with S; the up dots (depth k)
        # are constant across S — report the down-dot throughput after
        # subtracting the S=128-measured up-dot share is messy, so report
        # raw total time: if time is ~constant in S the down dots are
        # 128-padded; if it falls with S they scale.
        fl_down = 2 * k * S * N * reps
        fl_up = 2 * S * k * N * reps
        print(f"S={S:4d}: {ms:7.4f} ms  total_flops={fl_down + fl_up:,} "
              f"eff={(fl_down + fl_up)/ms/1e9:7.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
