"""Round-5 kernel microbenchmarks: where does the message-kernel time go?

Variants of the feature-major resident FORWARD message kernel at bench
shapes (10x10 grid, P=128, F=128, B1=21, PIECES=1), each timed with the
jax.profiler device trace (the tunnel is time-shared; wall clock lies):

  v0_current   exact copy of the production fwd kernel structure
  v1_preoh     one-hots precomputed in HBM (VPU build -> DMA read)
  v2_merged    x|mu as ONE [A,6F] table: one gather dot per bucket
  v3_bf16      all-bf16 internal math: gathers emit bf16, no f32 casts
  v4_ceiling   dots only (precomputed one-hots, W multiply, no msg asm)
  v5_b16merged v2+v3 combined

Run: python scripts/kb_r5.py [iters]
"""
from __future__ import annotations

import functools
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")

COL_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def build_layout():
    from bench import fcc_box
    from schnetpack_tpu.ops.cellblock import build_column_layout

    pos, cell = fcc_box(10_000)
    rng = np.random.RandomState(0)
    pos = pos + rng.randn(*pos.shape) * 0.05
    lay = build_column_layout(pos, 5.6, cell, np.ones(3, bool))
    return lay


def _koffs(ks):
    out, acc = [], 0
    for k in ks:
        out.append(acc)
        acc += k
    return tuple(out) + (acc,)


def make_kernels(nx, ny, P, ks, F, B1):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Ktot = sum(ks)
    offs = _koffs(ks)
    params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

    def _oh_vec(v, depth):
        iota = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], depth), 1)
        return (v[:, None] == iota).astype(jnp.bfloat16)

    def _msg_edge(xj, mu_j, rbf, dirs, FW_ref, out_dt=jnp.float32):
        W = jax.lax.dot_general(
            rbf, FW_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=out_dt,
        )
        xjW = (xj * W).astype(out_dt)
        dqe = xjW[:, :F]
        dmuR = xjW[:, F:2 * F]
        dmumu = xjW[:, 2 * F:]
        parts = [dqe]
        for x in range(3):
            mujx = mu_j[:, x * F:(x + 1) * F]
            parts.append(dmuR * dirs[:, x:x + 1] + dmumu * mujx)
        return jnp.concatenate(parts, axis=-1)

    # ---------------- v0: current production structure -----------------
    def v0_kernel(q_ref, d_ref, FW_ref, geo_ref, xcols, mucols,
                  dq_ref, dmu_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        msgs = []
        for c9, (di, dj) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i + di + nx, nx)
            yj = jax.lax.rem(j + dj + ny, ny)
            ohj = _oh_vec(q_ref[0, 0, 0, o0:o0 + k], P)
            xj = jax.lax.dot_general(
                ohj, xcols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mu_j = jax.lax.dot_general(
                ohj, mucols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            geo = geo_ref[0, 0, :, o0:o0 + k].T
            msgs.append(_msg_edge(xj, mu_j, geo[:, :B1], geo[:, B1:B1 + 3],
                                  FW_ref))
        msg_all = jnp.concatenate(msgs, axis=0)
        ohd_all = _oh_vec(d_ref[0, 0, 0, :], P)
        acc = jax.lax.dot_general(
            ohd_all, msg_all.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, 0] = acc[:, :F]
        dmu_ref[0, 0] = acc[:, F:]

    # ---------------- v1: precomputed one-hots -------------------------
    def v1_kernel(q_oh, d_oh, FW_ref, geo_ref, xcols, mucols,
                  dq_ref, dmu_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        msgs = []
        for c9, (di, dj) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i + di + nx, nx)
            yj = jax.lax.rem(j + dj + ny, ny)
            ohj = q_oh[0, 0, o0:o0 + k]
            xj = jax.lax.dot_general(
                ohj, xcols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mu_j = jax.lax.dot_general(
                ohj, mucols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            geo = geo_ref[0, 0, :, o0:o0 + k].T
            msgs.append(_msg_edge(xj, mu_j, geo[:, :B1], geo[:, B1:B1 + 3],
                                  FW_ref))
        msg_all = jnp.concatenate(msgs, axis=0)
        acc = jax.lax.dot_general(
            d_oh[0, 0], msg_all.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, 0] = acc[:, :F]
        dmu_ref[0, 0] = acc[:, F:]

    # ---------------- v2: merged xmu table ------------------------------
    def v2_kernel(q_ref, d_ref, FW_ref, geo_ref, xmucols, dq_ref, dmu_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        msgs = []
        for c9, (di, dj) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i + di + nx, nx)
            yj = jax.lax.rem(j + dj + ny, ny)
            ohj = _oh_vec(q_ref[0, 0, 0, o0:o0 + k], P)
            xmu_j = jax.lax.dot_general(
                ohj, xmucols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            xj = xmu_j[:, :3 * F]
            mu_j = xmu_j[:, 3 * F:]
            geo = geo_ref[0, 0, :, o0:o0 + k].T
            msgs.append(_msg_edge(xj, mu_j, geo[:, :B1], geo[:, B1:B1 + 3],
                                  FW_ref))
        msg_all = jnp.concatenate(msgs, axis=0)
        ohd_all = _oh_vec(d_ref[0, 0, 0, :], P)
        acc = jax.lax.dot_general(
            ohd_all, msg_all.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, 0] = acc[:, :F]
        dmu_ref[0, 0] = acc[:, F:]

    # ---------------- v3: preoh + merged 6F gather ----------------------
    def v3_kernel(q_oh, d_oh, FW_ref, geo_ref, xmucols, dq_ref, dmu_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        msgs = []
        for c9, (di, dj) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i + di + nx, nx)
            yj = jax.lax.rem(j + dj + ny, ny)
            ohj = q_oh[0, 0, o0:o0 + k]
            xmu_j = jax.lax.dot_general(
                ohj, xmucols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            xj = xmu_j[:, :3 * F]
            mu_j = xmu_j[:, 3 * F:]
            geo = geo_ref[0, 0, :, o0:o0 + k].T
            msgs.append(_msg_edge(xj, mu_j, geo[:, :B1], geo[:, B1:B1 + 3],
                                  FW_ref))
        msg_all = jnp.concatenate(msgs, axis=0)
        acc = jax.lax.dot_general(
            d_oh[0, 0], msg_all.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, 0] = acc[:, :F]
        dmu_ref[0, 0] = acc[:, F:]

    # ---------------- v4: MXU ceiling (dots only, f32 accum) ------------
    def v4_kernel(q_oh, d_oh, FW_ref, geo_ref, xmucols, dq_ref, dmu_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        msgs = []
        for c9, (di, dj) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i + di + nx, nx)
            yj = jax.lax.rem(j + dj + ny, ny)
            ohj = q_oh[0, 0, o0:o0 + k]
            xmu_j = jax.lax.dot_general(
                ohj, xmucols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            msgs.append(xmu_j[:, :4 * F].astype(jnp.bfloat16))
        msg_all = jnp.concatenate(msgs, axis=0)
        acc = jax.lax.dot_general(
            d_oh[0, 0], msg_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, 0] = acc[:, :F]
        dmu_ref[0, 0] = acc[:, F:]

    # ---------------- v5: preoh + per-bucket folds (no msg concat) ------
    def v5_kernel(q_oh, d_oh, FW_ref, geo_ref, xcols, mucols,
                  dq_ref, dmu_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        acc = None
        for c9, (di, dj) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i + di + nx, nx)
            yj = jax.lax.rem(j + dj + ny, ny)
            ohj = q_oh[0, 0, o0:o0 + k]
            xj = jax.lax.dot_general(
                ohj, xcols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mu_j = jax.lax.dot_general(
                ohj, mucols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            geo = geo_ref[0, 0, :, o0:o0 + k].T
            msg = _msg_edge(xj, mu_j, geo[:, :B1], geo[:, B1:B1 + 3], FW_ref)
            d = jax.lax.dot_general(
                d_oh[0, 0, o0:o0 + k], msg.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        dq_ref[0, 0] = acc[:, :F]
        dmu_ref[0, 0] = acc[:, F:]

    def v6_kernel(q_oh, d_oh, FW_ref, geo_ref, xcols, mucols,
                  dq_ref, dmu_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        msgs = []
        for c9, (di, dj) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i + di + nx, nx)
            yj = jax.lax.rem(j + dj + ny, ny)
            ohj = q_oh[0, 0, o0:o0 + k]
            xj = jax.lax.dot_general(
                ohj, xcols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            mu_j = jax.lax.dot_general(
                ohj, mucols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            geo = geo_ref[0, 0, :, o0:o0 + k].T.astype(jnp.bfloat16)
            W = jax.lax.dot_general(
                geo[:, :B1], FW_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            dirs = geo[:, B1:B1 + 3]
            xjW = xj * W
            dqe = xjW[:, :F]
            dmuR = xjW[:, F:2 * F]
            dmumu = xjW[:, 2 * F:]
            parts = [dqe]
            for xx in range(3):
                mujx = mu_j[:, xx * F:(xx + 1) * F]
                parts.append(dmuR * dirs[:, xx:xx + 1] + dmumu * mujx)
            msgs.append(jnp.concatenate(parts, axis=-1))
        msg_all = jnp.concatenate(msgs, axis=0)
        acc = jax.lax.dot_general(
            d_oh[0, 0], msg_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, 0] = acc[:, :F]
        dmu_ref[0, 0] = acc[:, F:]

    # -------- v7: preoh + channel-major W dot (no [24, k] geo transpose)
    def v7_kernel(q_oh, d_oh, FW_ref, geo_ref, xcols, mucols,
                  dq_ref, dmu_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        msgs = []
        for c9, (di, dj) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i + di + nx, nx)
            yj = jax.lax.rem(j + dj + ny, ny)
            ohj = q_oh[0, 0, o0:o0 + k]
            xj = jax.lax.dot_general(
                ohj, xcols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mu_j = jax.lax.dot_general(
                ohj, mucols[xi, yj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            geo_cm = geo_ref[0, 0, :, o0:o0 + k]            # [24, k]
            W = jax.lax.dot_general(
                geo_cm[:B1], FW_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [k, 3F]
            dirs = geo_cm[B1:B1 + 3].T                       # [k, 3] (tiny)
            xjW = xj * W
            dqe = xjW[:, :F]
            dmuR = xjW[:, F:2 * F]
            dmumu = xjW[:, 2 * F:]
            parts = [dqe]
            for xx in range(3):
                mujx = mu_j[:, xx * F:(xx + 1) * F]
                parts.append(dmuR * dirs[:, xx:xx + 1] + dmumu * mujx)
            msgs.append(jnp.concatenate(parts, axis=-1))
        msg_all = jnp.concatenate(msgs, axis=0)
        acc = jax.lax.dot_general(
            d_oh[0, 0], msg_all.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, 0] = acc[:, :F]
        dmu_ref[0, 0] = acc[:, F:]

    def call(kernel, arrs, specs):
        return pl.pallas_call(
            kernel,
            grid=(nx, ny),
            in_specs=specs,
            out_specs=(
                pl.BlockSpec((1, 1, P, F), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, 1, P, 3 * F), lambda i, j: (i, j, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nx, ny, P, F), jnp.float32),
                jax.ShapeDtypeStruct((nx, ny, P, 3 * F), jnp.float32),
            ),
            compiler_params=params,
        )(*arrs)

    return call, (v0_kernel, v1_kernel, v2_kernel, v3_kernel, v4_kernel,
                  v5_kernel, v6_kernel, v7_kernel)


def profile_device_ms(fn, args, iters, tag):
    """Run fn in a chained scan and return device ms/iter from the trace."""
    import jax
    import jax.numpy as jnp

    def chained(x0):
        def body(x, _):
            out = fn(x)
            # data dependency: fold a scalar back into the carry
            return x + (0 * jnp.sum(out[0].ravel()[:1])).astype(x.dtype), None

        return jax.lax.scan(body, x0, None, length=iters)[0]

    run = jax.jit(chained)
    x0 = args
    jax.block_until_ready(run(x0))
    tdir = f"/tmp/kb_r5_{tag}"
    with jax.profiler.trace(tdir):
        jax.block_until_ready(run(x0))
    files = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    pids = {ev["pid"]: ev["args"].get("name", "")
            for ev in trace["traceEvents"]
            if ev.get("ph") == "M" and ev.get("name") == "process_name"}
    dev = {p for p, nm in pids.items() if "TPU" in nm}
    agg = defaultdict(float)
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "X" and ev.get("pid") in dev:
            agg[ev.get("name", "?")] += ev.get("dur", 0)
    while_tot = max((v for k, v in agg.items() if k.startswith("while")),
                    default=0.0)
    return while_tot / 1e3 / iters


def main(iters=30):
    import jax
    import jax.numpy as jnp

    lay = build_layout()
    nx, ny, P, ks = lay.dims
    ks = tuple(ks)
    Ktot = sum(ks)
    F, B1 = 128, 21
    A = nx * ny * P
    print(f"grid {nx}x{ny} P={P} Ktot={Ktot} slots={nx*ny*Ktot} "
          f"real={int((np.asarray(lay.qcol) >= 0).sum())}", flush=True)

    rng = np.random.RandomState(1)
    qcol = jnp.asarray(lay.qcol)[:, :, None, :]
    dcol = jnp.asarray(lay.dcol)[:, :, None, :]
    FW = jnp.asarray(rng.randn(B1, 3 * F), jnp.bfloat16)
    geo = jnp.asarray(rng.rand(nx, ny, B1 + 3, Ktot), jnp.float32)
    x = jnp.asarray(rng.randn(nx, ny, P, 3 * F) * 0.1, jnp.bfloat16)
    mu = jnp.asarray(rng.randn(nx, ny, P, 3 * F) * 0.1, jnp.bfloat16)
    xmu = jnp.concatenate([x, mu], axis=-1)

    # precomputed one-hots
    def onehots(idx):
        i = np.asarray(idx)[:, :, 0]
        oh = (i[..., None] == np.arange(P)).astype(np.float32)
        oh[i < 0] = 0.0
        return jnp.asarray(oh, jnp.bfloat16)

    q_oh = onehots(qcol)
    d_oh = onehots(dcol)

    import jax.experimental.pallas as pl

    call, kernels = make_kernels(nx, ny, P, ks, F, B1)
    v0, v1, v2, v3, v4, v5, v6, v7 = kernels

    resident = lambda shp: pl.BlockSpec(shp, lambda i, j: tuple(
        0 for _ in shp))
    blocked = lambda shp: pl.BlockSpec(shp, lambda i, j: (i, j) + tuple(
        0 for _ in shp[2:]))
    FW_spec = pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0))

    cases = {
        "v0_current": (
            v0, lambda W: (qcol, dcol, W, geo, x, mu),
            [resident((nx, ny, 1, Ktot)), resident((nx, ny, 1, Ktot)),
             FW_spec, blocked((1, 1, B1 + 3, Ktot)),
             resident((nx, ny, P, 3 * F)), resident((nx, ny, P, 3 * F))],
            FW),
        "v1_preoh": (
            v1, lambda W: (q_oh, d_oh, W, geo, x, mu),
            [blocked((1, 1, Ktot, P)), blocked((1, 1, Ktot, P)),
             FW_spec, blocked((1, 1, B1 + 3, Ktot)),
             resident((nx, ny, P, 3 * F)), resident((nx, ny, P, 3 * F))],
            FW),
        "v2_merged": (
            v2, lambda W: (qcol, dcol, W, geo, xmu),
            [resident((nx, ny, 1, Ktot)), resident((nx, ny, 1, Ktot)),
             FW_spec, blocked((1, 1, B1 + 3, Ktot)),
             resident((nx, ny, P, 6 * F))],
            FW),
        "v3_pre_merged": (
            v3, lambda W: (q_oh, d_oh, W, geo, xmu),
            [blocked((1, 1, Ktot, P)), blocked((1, 1, Ktot, P)),
             FW_spec, blocked((1, 1, B1 + 3, Ktot)),
             resident((nx, ny, P, 6 * F))],
            FW),
        "v4_ceiling": (
            v4, lambda W: (q_oh, d_oh, W, geo, xmu),
            [blocked((1, 1, Ktot, P)), blocked((1, 1, Ktot, P)),
             FW_spec, blocked((1, 1, B1 + 3, Ktot)),
             resident((nx, ny, P, 6 * F))],
            FW),
        "v6_pre_bf16vpu": (
            v6, lambda W: (q_oh, d_oh, W, geo, x, mu),
            [blocked((1, 1, Ktot, P)), blocked((1, 1, Ktot, P)),
             FW_spec, blocked((1, 1, B1 + 3, Ktot)),
             resident((nx, ny, P, 3 * F)), resident((nx, ny, P, 3 * F))],
            FW),
        "v5_pre_pbfold": (
            v5, lambda W: (q_oh, d_oh, W, geo, x, mu),
            [blocked((1, 1, Ktot, P)), blocked((1, 1, Ktot, P)),
             FW_spec, blocked((1, 1, B1 + 3, Ktot)),
             resident((nx, ny, P, 3 * F)), resident((nx, ny, P, 3 * F))],
            FW),
        "v7_pre_cmW": (
            v7, lambda W: (q_oh, d_oh, W, geo, x, mu),
            [blocked((1, 1, Ktot, P)), blocked((1, 1, Ktot, P)),
             FW_spec, blocked((1, 1, B1 + 3, Ktot)),
             resident((nx, ny, P, 3 * F)), resident((nx, ny, P, 3 * F))],
            FW),
    }
    only = sys.argv[2:] if len(sys.argv) > 2 else None
    if only:
        cases = {k: v for k, v in cases.items() if k in only}

    # FLOP accounting (per kernel pass)
    slots = nx * ny * Ktot
    flops = {
        "v0_current": slots * 2 * P * 10 * F,
        "v1_preoh": slots * 2 * P * 10 * F,
        "v2_merged": slots * 2 * P * 10 * F,
        "v3_pre_merged": slots * 2 * P * 10 * F,
        "v4_ceiling": slots * 2 * P * 10 * F,
        "v5_pre_pbfold": slots * 2 * P * 10 * F,
        "v6_pre_bf16vpu": slots * 2 * P * 10 * F,
        "v7_pre_cmW": slots * 2 * P * 10 * F,
    }

    for name, (kern, argfn, specs, var_in) in cases.items():
        try:
            fn = lambda X, kern=kern, argfn=argfn, specs=specs: call(
                kern, argfn(X), specs)
            ms = profile_device_ms(fn, var_in, iters, name)
            tf = flops[name] / (ms * 1e-3) / 1e12
            print(f"{name:14s} {ms:7.3f} ms/pass  {tf:6.1f} TFLOP/s "
                  f"({tf/197*100:4.1f}% of bf16 peak)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
