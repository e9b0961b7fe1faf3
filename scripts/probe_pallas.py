"""Probe Mosaic capabilities that the cellblock kernel wants.

Run on a real TPU. Each probe prints ok/fail so the kernel design can pick
the fastest supported primitive.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def report(name, fn):
    try:
        out = fn()
        print(f"[ok]   {name}: {out}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")


# ---------------------------------------------------------------- probes
def probe_take_vmem():
    """jnp.take over a VMEM-resident table inside a kernel."""
    E = jnp.asarray(np.random.randn(384, 128), jnp.float32)
    q = jnp.asarray(np.random.randint(0, 384, 256), jnp.int32)

    def kernel(E_ref, q_ref, o_ref):
        o_ref[:] = jnp.take(E_ref[:], q_ref[:], axis=0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )(E, q)
    ref = jnp.take(E, q, axis=0)
    return f"maxerr={float(jnp.abs(out - ref).max()):.2e}"


def probe_dyn_slice_loop():
    """fori loop of dynamic single-row VMEM reads."""
    E = jnp.asarray(np.random.randn(384, 128), jnp.float32)
    q = jnp.asarray(np.random.randint(0, 384, 256), jnp.int32)

    def kernel(E_ref, q_ref, o_ref):
        def body(p, _):
            o_ref[pl.ds(p, 1), :] = E_ref[pl.ds(q_ref[p], 1), :]
            return 0
        jax.lax.fori_loop(0, 256, body, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )(E, q)
    ref = jnp.take(E, q, axis=0)
    return f"maxerr={float(jnp.abs(out - ref).max()):.2e}"


def probe_onehot_dot(precision):
    E = jnp.asarray(np.random.randn(384, 128), jnp.float32)
    q = jnp.asarray(np.random.randint(0, 384, 256), jnp.int32)

    def kernel(E_ref, q_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 384), 1)
        oh = (q_ref[:][:, None] == iota).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            oh, E_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )(E, q)
    ref = jnp.take(E, q, axis=0)
    return f"maxerr={float(jnp.abs(out - ref).max()):.2e}"


def probe_onehot_bf16_pieces():
    E = jnp.asarray(np.random.randn(384, 128), jnp.float32)
    q = jnp.asarray(np.random.randint(0, 384, 256), jnp.int32)

    def kernel(E_ref, q_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 384), 1)
        oh = (q_ref[:][:, None] == iota).astype(jnp.bfloat16)
        E = E_ref[:]
        hi = E.astype(jnp.bfloat16)
        mid = (E - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        lo = (E - hi.astype(jnp.float32) - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(oh, hi, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(oh, mid, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(oh, lo, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        o_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )(E, q)
    ref = jnp.take(E, q, axis=0)
    return f"maxerr={float(jnp.abs(out - ref).max()):.2e}"


def probe_mod_index_map():
    """Windowed column views with modular index_map + accumulation."""
    nx, rows, D = 4, 8, 128
    T = jnp.asarray(np.random.randn(nx, rows, D), jnp.float32)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = a_ref[:] + b_ref[:]

    out = pl.pallas_call(
        kernel,
        grid=(nx,),
        in_specs=[
            pl.BlockSpec((1, rows, D), lambda i: ((i + 1) % nx, 0, 0)),
            pl.BlockSpec((1, rows, D), lambda i: ((i + nx - 1) % nx, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nx, rows, D), jnp.float32),
    )(T, T)
    ref = jnp.roll(T, -1, 0) + jnp.roll(T, 1, 0)
    return f"maxerr={float(jnp.abs(out - ref).max()):.2e}"


def probe_dyn_z_window():
    """Dynamic z-window slicing of a resident column block."""
    nz, C, D = 6, 8, 128
    col = jnp.asarray(np.random.randn(nz * C, D), jnp.float32)

    def kernel(col_ref, o_ref):
        k = pl.program_id(0)
        zz = jax.lax.rem(k + 1, nz)
        o_ref[:] = col_ref[pl.ds(zz * C, C), :]

    out = pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=[pl.BlockSpec((nz * C, D), lambda k: (0, 0))],
        out_specs=pl.BlockSpec((C, D), lambda k: (k, 0)),
        out_shape=jax.ShapeDtypeStruct((nz * C, D), jnp.float32),
    )(col)
    ref = jnp.concatenate([col[((z + 1) % nz) * C:((z + 1) % nz) * C + C] for z in range(nz)])
    return f"maxerr={float(jnp.abs(out - ref).max()):.2e}"


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    report("take over VMEM table", probe_take_vmem)
    report("fori dynamic row slice", probe_dyn_slice_loop)
    report("one-hot dot DEFAULT", functools.partial(probe_onehot_dot, jax.lax.Precision.DEFAULT))
    report("one-hot dot HIGHEST", functools.partial(probe_onehot_dot, jax.lax.Precision.HIGHEST))
    report("one-hot bf16 3-piece", probe_onehot_bf16_pieces)
    report("modular index_map window", probe_mod_index_map)
    report("dynamic z-window slice", probe_dyn_z_window)
