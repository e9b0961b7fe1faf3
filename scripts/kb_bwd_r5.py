"""Round-5 BACKWARD message-kernel microbenchmarks.

The geo-resident backward is the largest single block of the MD step
(3 x 1.55 ms/step of 8.78 at the round-5 preoh state).  Variants (all
preoh, pieces=1, wgrad=False — the production MD mode):

  b1_prod     the production _msg_fm_bwd_geores_call, unchanged
  b2_deep     (round-5 experiment, REJECTED: 2.38 vs 1.97 ms) a
              rearranged one-hot table turned the 18 shallow gathers
              and 18 ragged folds into 2+2 deep dots — slower: the
              [Ktot, 6F] VMEM concats cost more than the ragged-dot
              padding saved.  Removed; see git history.
  b0_param    parametrized re-implementation at production flags
              (sanity: should match b1)
  b3_bf16vpu  per-edge VPU math in bf16 (gathers emit bf16)
  b7_posp1    position folds in 1 bf16 piece instead of 3 (matches
              the bf16 feature-mode error budget)
  b5_nochain  geometry chain stripped (feature cotangents only):
              isolates the chain's VPU cost
  b6_dots     dots only (gathers + gmsg + folds, no per-edge math):
              the MXU-bound floor

Run: python scripts/kb_bwd_r5.py [iters]
"""
from __future__ import annotations

import functools
import glob
import gzip
import json
import sys
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
    return build_column_layout(pos, 5.6, cell, np.ones(3, bool))


def _koffs(ks):
    out, acc = [], 0
    for k in ks:
        out.append(acc)
        acc += k
    return tuple(out) + (acc,)


def make_param_call(nx, ny, P, ks, F, B, rc, vpu_bf16=False, chain=True,
                    dots_only=False, posp=3, cmchain=False,
                    gdir_blockdot=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from schnetpack_tpu.ops.cellblock_pallas import _split_f32

    Ktot = sum(ks)
    offs = _koffs(ks)
    B1 = B + 1
    vdt = jnp.bfloat16 if vpu_bf16 else jnp.float32

    def kernel(q_ref, d_ref, FW_ref, gq_ref, gmu_ref, cw_ref, *args):
        geo_ref = args[0]
        ohj_refs = args[1:10]
        ohd_refs = args[10:19]
        xcols = args[19:20]
        mucols = args[20:21]
        outs = args[21:]
        dx_ref, dmu_ref = outs[0], outs[1]
        gRo_ref = outs[2] if chain else None
        gRd_refs = outs[3:12] if chain else None
        i = pl.program_id(0)
        j = pl.program_id(1)

        def _sel_own(cols, ohj):
            return jax.lax.dot_general(
                ohj, cols[0][0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(vdt)

        acc_dx = None
        acc_dmu = None
        acc_gRo = None
        for c9, (dx, dy) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i - dx + nx, nx)
            yj = jax.lax.rem(j - dy + ny, ny)
            ohj = ohj_refs[c9][0, 0]
            ohd = ohd_refs[c9][0, 0]
            geo_blk = geo_ref[xi, yj, :, o0:o0 + k]
            geoT = geo_blk.T.astype(vdt)
            rbf = geoT[:, :B1]
            dirs = geoT[:, B1:B1 + 3]
            xj = _sel_own(xcols, ohj)
            mu_j = _sel_own(mucols, ohj)
            W = jax.lax.dot_general(
                rbf, FW_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(vdt)
            gcat = jnp.concatenate([gq_ref[xi, yj], gmu_ref[xi, yj]],
                                   axis=-1)
            gmsg = jax.lax.dot_general(
                ohd, _split_f32(gcat, 1)[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(vdt)
            if dots_only:
                gxj = gmsg[:, :3 * F] * W
                gmu_e = gmsg[:, F:]
                grbf = jax.lax.dot_general(
                    gmsg[:, :3 * F], FW_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                del grbf
            else:
                xjW = xj * W
                dmuR = xjW[:, F:2 * F]
                dmumu = xjW[:, 2 * F:]
                gqe = gmsg[:, :F]
                gdmuR = None
                gdmumu = None
                gdir_parts = []
                gmuj_parts = []
                for x in range(3):
                    gmux = gmsg[:, (1 + x) * F:(2 + x) * F]
                    mujx = mu_j[:, x * F:(x + 1) * F]
                    t = gmux * dirs[:, x:x + 1]
                    gdmuR = t if gdmuR is None else gdmuR + t
                    t2 = gmux * mujx
                    gdmumu = t2 if gdmumu is None else gdmumu + t2
                    gmuj_parts.append(gmux * dmumu)
                    if gdir_blockdot:
                        gdir_parts.append(gmux * dmuR)
                    elif cmchain:
                        # defer the F-reduction to a ones-row MXU dot that
                        # emits [1, k] channel-major (no [k, 1] lane-poor
                        # intermediate, no transpose)
                        gdir_parts.append(gmux * dmuR)
                    else:
                        gdir_parts.append(
                            jnp.sum(gmux * dmuR, axis=-1, keepdims=True))
                gxjW = jnp.concatenate([gqe, gdmuR, gdmumu], axis=-1)
                gxj = gxjW * W
                gW = gxjW * xj
                if cmchain:
                    # channel-major grbf straight off the MXU: no [k, B1]
                    # -> [B1, k] VMEM transpose afterwards
                    grbfT_cm = jax.lax.dot_general(
                        FW_ref[...], gW, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)     # [B1, k]
                    grbf = None
                else:
                    grbf = jax.lax.dot_general(
                        gW, FW_ref[...], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                gmu_e = jnp.concatenate(gmuj_parts, axis=-1)
            for piece in _split_f32(gxj.astype(jnp.float32), 1):
                d = jax.lax.dot_general(
                    ohj, piece, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_dx = d if acc_dx is None else acc_dx + d
            for piece in _split_f32(gmu_e.astype(jnp.float32), 1):
                d = jax.lax.dot_general(
                    ohj, piece, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_dmu = d if acc_dmu is None else acc_dmu + d
            if chain and not dots_only:
                geo_cm = geo_blk
                rbf_cm = geo_cm[:B]
                fcutT = geo_cm[B:B + 1]
                dirsT = geo_cm[B + 1:B + 4]
                ddT = geo_cm[B + 4:B + 5]
                cosv = 2.0 * fcutT - 1.0
                sinv = jnp.sqrt(jnp.maximum(1.0 - cosv * cosv, 0.0))
                dfcut_dd = (-0.5 * np.pi / rc) * sinv
                phiT = rbf_cm * (1.0 / jnp.maximum(fcutT, 1e-30))
                centers = cw_ref[:, 0:1]
                coeff = cw_ref[:, 1:2]
                diffT = ddT - centers
                dphi_dd = (2.0 * coeff) * diffT * phiT
                grbfT = grbfT_cm if cmchain else grbf.T
                gphi_fc = grbfT[:B]
                gfc = grbfT[B:B + 1]
                gd = (jnp.sum(gphi_fc * dphi_dd, axis=0, keepdims=True)
                      * fcutT
                      + (jnp.sum(gphi_fc * phiT, axis=0, keepdims=True)
                         + gfc) * dfcut_dd)
                if gdir_blockdot:
                    # ONE [3, 3F] block-ones dot for all three lane
                    # reductions (vs 3 VPU cross-lane reduction trees)
                    U = jnp.concatenate(gdir_parts, axis=-1)   # [k, 3F]
                    B3 = jnp.concatenate([
                        jnp.concatenate([
                            jnp.ones((1, F), jnp.float32) if c == r
                            else jnp.zeros((1, F), jnp.float32)
                            for c in range(3)], axis=1)
                        for r in range(3)], axis=0)            # [3, 3F]
                    gdirT = jax.lax.dot_general(
                        B3, U, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)    # [3, k]
                elif cmchain:
                    ones_row = jnp.ones((1, F), jnp.float32)
                    gdirT = jnp.concatenate([
                        jax.lax.dot_general(
                            ones_row, g, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        for g in gdir_parts], axis=0)          # [3, k]
                else:
                    gdirT = jnp.concatenate(gdir_parts, axis=-1).T
                s = jnp.sum(gdirT * dirsT.astype(jnp.float32), axis=0,
                            keepdims=True)
                inv_d = 1.0 / jnp.maximum(ddT, 1e-6)
                grijT = ((gdirT - dirsT.astype(jnp.float32) * s) * inv_d
                         + gd * dirsT.astype(jnp.float32))
                own = None
                dst = None
                for piece in _split_f32(grijT, posp):
                    a = jax.lax.dot_general(
                        piece, ohj, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    own = a if own is None else own + a
                    b = jax.lax.dot_general(
                        piece, ohd, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dst = b if dst is None else dst + b
                acc_gRo = own if acc_gRo is None else acc_gRo + own
                gRd_refs[c9][0, 0] = -dst
            elif chain:
                gRd_refs[c9][0, 0] = jnp.zeros((1, 1, 3, P), jnp.float32)
        dx_ref[0, 0] = acc_dx
        dmu_ref[0, 0] = acc_dmu
        if chain:
            gRo_ref[0, 0] = (acc_gRo if acc_gRo is not None
                             else jnp.zeros((3, P), jnp.float32))

    def call(x, mu, geo, FW_aug, cw, qcol, dcol, cots, oh):
        import jax

        ohj_parts, _, ohd_parts = oh
        g_dq, g_dmu = cots
        A, D3 = x.shape
        gq5 = g_dq.reshape(nx, ny, P, F)
        gmu5 = g_dmu.reshape(nx, ny, P, 3 * F)
        xh = _split_f32(x, 1)[0].reshape(nx, ny, P, D3)
        mh = _split_f32(mu, 1)[0].reshape(nx, ny, P, D3)

        def resident(shape):
            return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape))

        def own(shape4):
            return pl.BlockSpec(shape4, lambda i, j: (i, j, 0, 0))

        dest_specs = [
            pl.BlockSpec(
                (1, 1, k, P),
                functools.partial(
                    lambda i, j, dx, dy: ((i - dx) % nx, (j - dy) % ny,
                                          0, 0),
                    dx=dx, dy=dy))
            for k, (dx, dy) in zip(ks, COL_OFFSETS)
        ]
        gRd_specs = [
            pl.BlockSpec(
                (1, 1, 3, P),
                functools.partial(
                    lambda i, j, dx, dy: ((i - dx) % nx, (j - dy) % ny,
                                          0, 0),
                    dx=dx, dy=dy))
            for dx, dy in COL_OFFSETS
        ]
        n_out = 12 if chain else 2
        outs = pl.pallas_call(
            kernel,
            grid=(nx, ny),
            in_specs=[
                resident((nx, ny, 1, Ktot)),
                resident((nx, ny, 1, Ktot)),
                pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0)),
                resident((nx, ny, P, F)),
                resident((nx, ny, P, 3 * F)),
                pl.BlockSpec((B, 2), lambda i, j: (0, 0)),
                resident((nx, ny, B1 + 4, Ktot)),
            ] + dest_specs + dest_specs + [
                own((1, 1, P, D3)), own((1, 1, P, D3)),
            ],
            out_specs=((own((1, 1, P, D3)), own((1, 1, P, D3)))
                       + ((own((1, 1, 3, P)),) + tuple(gRd_specs)
                          if chain else ())),
            out_shape=((jax.ShapeDtypeStruct((nx, ny, P, D3), jnp.float32),
                        jax.ShapeDtypeStruct((nx, ny, P, D3), jnp.float32))
                       + (tuple(
                           jax.ShapeDtypeStruct((nx, ny, 3, P), jnp.float32)
                           for _ in range(10)) if chain else ())),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(qcol[:, :, None, :], dcol[:, :, None, :], FW_aug, gq5, gmu5, cw,
          geo, *ohj_parts, *ohd_parts, xh, mh)
        dx = outs[0]
        dmu = outs[1]
        if not chain:
            return dx.reshape(A, D3), dmu.reshape(A, D3), None
        gRT = outs[2]
        for p in outs[3:12]:
            gRT = gRT + p
        dR = jnp.moveaxis(gRT, 2, 3).reshape(A, 3)
        return dx.reshape(A, D3), dmu.reshape(A, D3), dR

    return call


def profile_device_ms(fn, x0, iters, tag):
    import jax
    import jax.numpy as jnp

    def chained(x):
        def body(c, _):
            out = fn(c)
            return c + (0 * jnp.sum(out[0].ravel()[:1])).astype(c.dtype), None

        return jax.lax.scan(body, x, None, length=iters)[0]

    run = jax.jit(chained)
    jax.block_until_ready(run(x0))
    tdir = f"/tmp/kb_bwd_{tag}"
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

    from schnetpack_tpu.ops.colblock import build_onehots
    from schnetpack_tpu.ops.colblock_pallas import _msg_fm_bwd_geores_call

    lay = build_layout()
    nx, ny, P, ks = lay.dims
    ks = tuple(ks)
    Ktot = sum(ks)
    F, B = 128, 20
    B1 = B + 1
    rc = 5.0
    A = nx * ny * P
    print(f"grid {nx}x{ny} P={P} Ktot={Ktot}", flush=True)

    rng = np.random.RandomState(1)
    qcol = jnp.asarray(lay.qcol)
    dcol = jnp.asarray(lay.dcol)
    oh = build_onehots(qcol, dcol, P, ks)

    dd = rng.uniform(1.0, 5.4, (nx, ny, 1, Ktot))
    fcut = 0.5 * (np.cos(np.pi * np.minimum(dd, rc) / rc) + 1.0)
    centers = np.linspace(0, rc, B)
    coeff = -2.0 * np.ones(B)
    phi = np.exp(coeff[None, None, :, None]
                 * (dd - centers[None, None, :, None]) ** 2)
    dirs = rng.randn(nx, ny, 3, Ktot)
    dirs /= np.linalg.norm(dirs, axis=2, keepdims=True)
    geo = jnp.asarray(np.concatenate(
        [phi * fcut, fcut, dirs, dd], axis=2), jnp.float32)
    cw = jnp.asarray(np.stack([centers, coeff], axis=1), jnp.float32)

    x = jnp.asarray(rng.randn(A, 3 * F) * 0.1, jnp.float32)
    mu = jnp.asarray(rng.randn(A, 3 * F) * 0.1, jnp.float32)
    FW = jnp.asarray(rng.randn(B1, 3 * F) * 0.1, jnp.bfloat16)
    gq = jnp.asarray(rng.randn(A, F) * 0.1, jnp.float32)
    gmu = jnp.asarray(rng.randn(A, 3 * F) * 0.1, jnp.float32)

    def b1(xv):
        return _msg_fm_bwd_geores_call(
            xv, mu, geo, FW, cw, qcol, dcol, (gq, gmu), P, ks, rc,
            1, wgrad=False, oh=oh)

    all_variants = {
        "b0_param": dict(),
        "b3_bf16vpu": dict(vpu_bf16=True),
        "b7_posp1": dict(posp=1),
        "b37_both": dict(vpu_bf16=True, posp=1),
        "b5_nochain": dict(chain=False),
        "b6_dots": dict(chain=False, dots_only=True),
        "b8_cmchain": dict(cmchain=True),
        "b9_cm_posp1": dict(cmchain=True, posp=1),
        "b10_gdirdot": dict(gdir_blockdot=True),
        "b11_cm_gdot": dict(cmchain=True, gdir_blockdot=True),
    }
    only = sys.argv[2:] if len(sys.argv) > 2 else None
    variants = ({k: v for k, v in all_variants.items() if k in only}
                if only else all_variants)
    calls = {name: make_param_call(nx, ny, P, ks, F, B, rc, **kw)
             for name, kw in variants.items()}

    # numerical sanity: b0 must match production; b3/b7 approximately
    o1 = jax.jit(b1)(x)
    for name in calls:
        if name in ("b5_nochain", "b6_dots"):
            continue
        fn = calls[name]
        o2 = jax.jit(lambda xv, fn=fn: fn(
            xv, mu, geo, FW, cw, qcol, dcol, (gq, gmu), oh))(x)
        for lbl, a, b in zip(("dx", "dmu", "dR"), o1[:3], o2[:3]):
            if b is None:
                continue
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-30
            print(f"{name} {lbl}: max rel diff "
                  f"{np.abs(a - b).max() / scale:.2e}", flush=True)

    if only is None:
        ms1 = profile_device_ms(b1, x, iters, "b1")
        print(f"{'b1_prod':11s} {ms1:7.3f} ms/pass", flush=True)
    for name, fn in calls.items():
        ms = profile_device_ms(
            lambda xv, fn=fn: fn(xv, mu, geo, FW, cw, qcol, dcol,
                                 (gq, gmu), oh), x, iters, name)
        print(f"{name:11s} {ms:7.3f} ms/pass", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
