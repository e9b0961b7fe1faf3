"""Round-5 BACKWARD-kernel microbenchmarks (see kb_r5.py for the fwd).

  b0_current   production geo-resident source-centric backward structure
  b1_preoh     one-hots precomputed in HBM as 9 dest-aligned bucket parts

Run: python scripts/kb_r5_bwd.py [iters]
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
from scripts.kb_r5 import COL_OFFSETS, _koffs, build_layout, profile_device_ms


def main(iters=30):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lay = build_layout()
    nx, ny, P, ks = lay.dims
    ks = tuple(ks)
    Ktot = sum(ks)
    offs = _koffs(ks)
    F, B = 128, 20
    B1 = B + 1
    A = nx * ny * P
    slots = nx * ny * Ktot
    print(f"grid {nx}x{ny} P={P} Ktot={Ktot} slots={slots}", flush=True)

    rng = np.random.RandomState(1)
    qcol = jnp.asarray(lay.qcol)[:, :, None, :]
    dcol = jnp.asarray(lay.dcol)[:, :, None, :]
    FW = jnp.asarray(rng.randn(B1, 3 * F), jnp.float32)
    cw = jnp.asarray(np.stack([np.linspace(0, 5, B),
                               np.full(B, -3.0)], 1), jnp.float32)
    # geo with the extra distance channel (with_d layout): [B1+4, Ktot]
    geo = jnp.asarray(rng.rand(nx, ny, B1 + 4, Ktot), jnp.float32)
    x = jnp.asarray(rng.randn(nx, ny, P, 3 * F) * 0.1, jnp.bfloat16)
    mu = jnp.asarray(rng.randn(nx, ny, P, 3 * F) * 0.1, jnp.bfloat16)
    gq = jnp.asarray(rng.randn(nx, ny, P, F) * 0.1, jnp.float32)
    gmu = jnp.asarray(rng.randn(nx, ny, P, 3 * F) * 0.1, jnp.float32)
    rc = 5.0
    params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

    def _oh_vec(v, depth):
        iota = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], depth), 1)
        return (v[:, None] == iota).astype(jnp.bfloat16)

    # per-bucket dest-aligned one-hot parts
    def oh_parts(idx):
        i = np.asarray(idx)[:, :, 0]
        oh = (i[..., None] == np.arange(P)).astype(np.float32)
        oh[i < 0] = 0.0
        return [jnp.asarray(oh[:, :, offs[c]:offs[c + 1]], jnp.bfloat16)
                for c in range(9)]

    q_parts = oh_parts(qcol)
    d_parts = oh_parts(dcol)

    def bwd_body(c9, ohj, ohd, geoT, xj, mu_j, FW_ref, cw_ref, gq_v, gmu_v,
                 split_gcat=False):
        """Shared message+geometry backward math for one bucket."""
        rbf = geoT[:, :B1]
        dirs = geoT[:, B1:B1 + 3]
        W = jax.lax.dot_general(
            rbf, FW_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xjW = xj * W
        dmuR = xjW[:, F:2 * F]
        dmumu = xjW[:, 2 * F:]
        if split_gcat:
            gqe = jax.lax.dot_general(
                ohd, gq_v.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            gmsg_mu = jax.lax.dot_general(
                ohd, gmu_v.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            gmsg = jnp.concatenate([gqe, gmsg_mu], axis=-1)
        else:
            gcat = jnp.concatenate([gq_v, gmu_v], axis=-1)
            gmsg = jax.lax.dot_general(
                ohd, gcat.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            gqe = gmsg[:, :F]
        gdmuR = None
        gdmumu = None
        gdir_parts = []
        gmuj_parts = []
        for xx in range(3):
            gmux = gmsg[:, (1 + xx) * F:(2 + xx) * F]
            mujx = mu_j[:, xx * F:(xx + 1) * F]
            t = gmux * dirs[:, xx:xx + 1]
            gdmuR = t if gdmuR is None else gdmuR + t
            t2 = gmux * mujx
            gdmumu = t2 if gdmumu is None else gdmumu + t2
            gmuj_parts.append(gmux * dmumu)
            gdir_parts.append(jnp.sum(gmux * dmuR, axis=-1, keepdims=True))
        gxjW = jnp.concatenate([gqe, gdmuR, gdmumu], axis=-1)
        gxj = gxjW * W
        gW = gxjW * xj
        grbf = jax.lax.dot_general(
            gW, FW_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        gmu_e = jnp.concatenate(gmuj_parts, axis=-1)
        # geometry chain from stored geo
        geo_cm = geoT.T
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
        grbfT = grbf.T
        gphi_fc = grbfT[:B]
        gfc = grbfT[B:B + 1]
        gd = (jnp.sum(gphi_fc * dphi_dd, axis=0, keepdims=True) * fcutT
              + (jnp.sum(gphi_fc * phiT, axis=0, keepdims=True) + gfc)
              * dfcut_dd)
        gdirT = jnp.concatenate(gdir_parts, axis=-1).T
        s = jnp.sum(gdirT * dirsT, axis=0, keepdims=True)
        inv_d = 1.0 / jnp.maximum(ddT, 1e-6)
        grijT = (gdirT - dirsT * s) * inv_d + gd * dirsT
        grij_b = grijT.astype(jnp.bfloat16)
        own = jax.lax.dot_general(
            grij_b, ohj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dst = jax.lax.dot_general(
            grij_b, ohd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gxj_b = gxj.astype(jnp.bfloat16)
        gmu_b = gmu_e.astype(jnp.bfloat16)
        ddx = jax.lax.dot_general(
            ohj, gxj_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ddmu = jax.lax.dot_general(
            ohj, gmu_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return ddx, ddmu, own, dst

    def sel_own(cols, ohj):
        return jax.lax.dot_general(
            ohj, cols[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # --------------- b0: production structure (VPU one-hot build) -------
    def b0_kernel(q_ref, d_ref, FW_ref, gq_ref, gmu_ref, cw_ref, geo_ref,
                  xcols, mucols, dx_ref, dmu_ref, gRo_ref, *gRd_refs):
        i, j = pl.program_id(0), pl.program_id(1)
        acc_dx = None
        acc_dmu = None
        acc_gRo = None
        for c9, (dx, dy) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i - dx + nx, nx)
            yj = jax.lax.rem(j - dy + ny, ny)
            qv = q_ref[xi, yj, 0, o0:o0 + k]
            dv = d_ref[xi, yj, 0, o0:o0 + k]
            ohj = _oh_vec(qv, P)
            ohd = _oh_vec(dv, P)
            geoT = geo_ref[xi, yj, :, o0:o0 + k].T
            xj = sel_own(xcols, ohj)
            mu_j = sel_own(mucols, ohj)
            ddx, ddmu, own, dst = bwd_body(
                c9, ohj, ohd, geoT, xj, mu_j, FW_ref, cw_ref,
                gq_ref[xi, yj], gmu_ref[xi, yj])
            acc_dx = ddx if acc_dx is None else acc_dx + ddx
            acc_dmu = ddmu if acc_dmu is None else acc_dmu + ddmu
            acc_gRo = own if acc_gRo is None else acc_gRo + own
            gRd_refs[c9][0, 0] = -dst
        dx_ref[0, 0] = acc_dx
        dmu_ref[0, 0] = acc_dmu
        gRo_ref[0, 0] = acc_gRo

    # --------------- b1: precomputed bucket-split one-hots --------------
    def b1_kernel(FW_ref, gq_ref, gmu_ref, cw_ref, geo_ref, *args):
        q_oh = args[:9]          # dest-aligned [1,1,k,P] views
        d_oh = args[9:18]
        xcols, mucols = args[18], args[19]
        dx_ref, dmu_ref, gRo_ref = args[20], args[21], args[22]
        gRd_refs = args[23:]
        i, j = pl.program_id(0), pl.program_id(1)
        acc_dx = None
        acc_dmu = None
        acc_gRo = None
        for c9, (dx, dy) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i - dx + nx, nx)
            yj = jax.lax.rem(j - dy + ny, ny)
            ohj = q_oh[c9][0, 0]
            ohd = d_oh[c9][0, 0]
            geoT = geo_ref[xi, yj, :, o0:o0 + k].T
            xj = sel_own(xcols, ohj)
            mu_j = sel_own(mucols, ohj)
            ddx, ddmu, own, dst = bwd_body(
                c9, ohj, ohd, geoT, xj, mu_j, FW_ref, cw_ref,
                gq_ref[xi, yj], gmu_ref[xi, yj])
            acc_dx = ddx if acc_dx is None else acc_dx + ddx
            acc_dmu = ddmu if acc_dmu is None else acc_dmu + ddmu
            acc_gRo = own if acc_gRo is None else acc_gRo + own
            gRd_refs[c9][0, 0] = -dst
        dx_ref[0, 0] = acc_dx
        dmu_ref[0, 0] = acc_dmu
        gRo_ref[0, 0] = acc_gRo

    def b2_kernel(FW_ref, gq_ref, gmu_ref, cw_ref, geo_ref, *args):
        q_oh = args[:9]
        d_oh = args[9:18]
        xcols, mucols = args[18], args[19]
        dx_ref, dmu_ref, gRo_ref = args[20], args[21], args[22]
        gRd_refs = args[23:]
        i, j = pl.program_id(0), pl.program_id(1)
        acc_dx = None
        acc_dmu = None
        acc_gRo = None
        for c9, (dx, dy) in enumerate(COL_OFFSETS):
            o0, k = offs[c9], ks[c9]
            xi = jax.lax.rem(i - dx + nx, nx)
            yj = jax.lax.rem(j - dy + ny, ny)
            ohj = q_oh[c9][0, 0]
            ohd = d_oh[c9][0, 0]
            geoT = geo_ref[xi, yj, :, o0:o0 + k].T
            xj = sel_own(xcols, ohj)
            mu_j = sel_own(mucols, ohj)
            ddx, ddmu, own, dst = bwd_body(
                c9, ohj, ohd, geoT, xj, mu_j, FW_ref, cw_ref,
                gq_ref[xi, yj], gmu_ref[xi, yj], split_gcat=True)
            acc_dx = ddx if acc_dx is None else acc_dx + ddx
            acc_dmu = ddmu if acc_dmu is None else acc_dmu + ddmu
            acc_gRo = own if acc_gRo is None else acc_gRo + own
            gRd_refs[c9][0, 0] = -dst
        dx_ref[0, 0] = acc_dx
        dmu_ref[0, 0] = acc_dmu
        gRo_ref[0, 0] = acc_gRo

    def dest(shape4):
        return [
            pl.BlockSpec(
                shape4,
                functools.partial(
                    lambda i, j, dx, dy: ((i - dx) % nx, (j - dy) % ny, 0, 0),
                    dx=dx, dy=dy),
            )
            for dx, dy in COL_OFFSETS
        ]

    def dest_k(kdim):
        out = []
        for (dx, dy), k in zip(COL_OFFSETS, ks):
            out.append(pl.BlockSpec(
                (1, 1, k, P),
                functools.partial(
                    lambda i, j, dx, dy: ((i - dx) % nx, (j - dy) % ny, 0, 0),
                    dx=dx, dy=dy)))
        return out

    resident = lambda shp: pl.BlockSpec(shp, lambda i, j: tuple(
        0 for _ in shp))
    own = lambda shp: pl.BlockSpec(shp, lambda i, j: (i, j) + tuple(
        0 for _ in shp[2:]))
    FW_spec = pl.BlockSpec((B1, 3 * F), lambda i, j: (0, 0))
    cw_spec = pl.BlockSpec((B, 2), lambda i, j: (0, 0))

    out_specs = (own((1, 1, P, 3 * F)), own((1, 1, P, 3 * F)),
                 own((1, 1, 3, P))) + tuple(dest((1, 1, 3, P)))
    out_shape = (
        jax.ShapeDtypeStruct((nx, ny, P, 3 * F), jnp.float32),
        jax.ShapeDtypeStruct((nx, ny, P, 3 * F), jnp.float32),
        jax.ShapeDtypeStruct((nx, ny, 3, P), jnp.float32),
    ) + tuple(jax.ShapeDtypeStruct((nx, ny, 3, P), jnp.float32)
              for _ in range(9))

    def b0_call(W):
        return pl.pallas_call(
            b0_kernel,
            grid=(nx, ny),
            in_specs=[
                resident((nx, ny, 1, Ktot)), resident((nx, ny, 1, Ktot)),
                FW_spec, resident((nx, ny, P, F)),
                resident((nx, ny, P, 3 * F)), cw_spec,
                resident((nx, ny, B1 + 4, Ktot)),
                own((1, 1, P, 3 * F)), own((1, 1, P, 3 * F)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
        )(qcol, dcol, W, gq, gmu, cw, geo, x, mu)

    def b1_call(W):
        return pl.pallas_call(
            b1_kernel,
            grid=(nx, ny),
            in_specs=[
                FW_spec, resident((nx, ny, P, F)),
                resident((nx, ny, P, 3 * F)), cw_spec,
                resident((nx, ny, B1 + 4, Ktot)),
            ] + dest_k(P) + dest_k(P) + [
                own((1, 1, P, 3 * F)), own((1, 1, P, 3 * F)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
        )(W, gq, gmu, cw, geo, *q_parts, *d_parts, x, mu)

    flops = slots * 2 * P * (4 + 6 + 6) * F  # expand + regather + folds
    def b2_call(W):
        return pl.pallas_call(
            b2_kernel,
            grid=(nx, ny),
            in_specs=[
                FW_spec, resident((nx, ny, P, F)),
                resident((nx, ny, P, 3 * F)), cw_spec,
                resident((nx, ny, B1 + 4, Ktot)),
            ] + dest_k(P) + dest_k(P) + [
                own((1, 1, P, 3 * F)), own((1, 1, P, 3 * F)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
        )(W, gq, gmu, cw, geo, *q_parts, *d_parts, x, mu)

    for name, fn in (("b0_current", b0_call), ("b1_preoh", b1_call),
                     ("b2_pre_split", b2_call)):
        try:
            ms = profile_device_ms(fn, FW, iters, name)
            tf = flops / (ms * 1e-3) / 1e12
            print(f"{name:12s} {ms:7.3f} ms/pass  {tf:6.1f} TFLOP/s "
                  f"({tf/197*100:4.1f}% of bf16 peak)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
