"""Fused PaiNN mixing kernel (flat [A, 3F] column-path layout).

The intra-atomic mixing block (reference painn.py:70-117) is a chain of
eleven [A, F] x [F, F]-class matmuls and elementwise ops.  In XLA each op
is an HBM round trip — measured ~0.45 ms/step (fwd+bwd) of the 10k-atom
MD step plus ~0.12 ms of interaction residual adds (r5 trace, PERF.md).
This kernel runs the whole block (residual add -> channel mix -> gated
update) per row-block with all weights VMEM-resident: HBM traffic drops
to the four feature tables in + two out.

Backward follows the message-kernel recipe: recompute the forward
intermediates in-kernel from the saved inputs, emit input cotangents
(and optionally weight cotangents for training use).

Row-parallel, so unlike the edge-space message kernels there are no
ragged buckets; every dot is [R, F] x [F, F] with R = block rows.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import cellblock as _cb


def _act(name, x):
    if name == "silu":
        return x * jax.nn.sigmoid(x)
    # shifted softplus: log(0.5 e^x + 0.5)
    return jax.nn.softplus(x) - 0.6931471805599453


def _dact(name, x):
    s = jax.nn.sigmoid(x)
    if name == "silu":
        return s * (1.0 + x * (1.0 - s))
    return s


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_core(q, mu, dq, dmu, kmix, k0, b0, k1, b1, F, eps, act):
    """Shared forward math on one row block; returns outputs and the
    intermediates the backward chain reuses."""
    qp = q + dq
    mup = mu + dmu
    Wv = kmix[:, :F]
    Ww = kmix[:, F:]
    mu_c = [mup[:, c * F:(c + 1) * F] for c in range(3)]
    V_c = [_dot(m, Wv) for m in mu_c]
    W_c = [_dot(m, Ww) for m in mu_c]
    Vn = jnp.sqrt(V_c[0] ** 2 + V_c[1] ** 2 + V_c[2] ** 2 + eps)
    pre = _dot(qp, k0[:F]) + _dot(Vn, k0[F:]) + b0
    h = _act(act, pre)
    dq_i = _dot(h, k1[:, :F]) + b1[:F]
    dmu_i = _dot(h, k1[:, F:2 * F]) + b1[F:2 * F]
    dqmu_i = _dot(h, k1[:, 2 * F:]) + b1[2 * F:]
    vw = V_c[0] * W_c[0] + V_c[1] * W_c[1] + V_c[2] * W_c[2]
    q_out = qp + dq_i + dqmu_i * vw
    mu_out = jnp.concatenate(
        [m + dmu_i * w for m, w in zip(mu_c, W_c)], axis=-1)
    return (q_out, mu_out,
            dict(qp=qp, mu_c=mu_c, V_c=V_c, W_c=W_c, Vn=Vn, pre=pre, h=h,
                 dmu_i=dmu_i, dqmu_i=dqmu_i, vw=vw))


def _mix_fwd_kernel(q_ref, mu_ref, dq_ref, dmu_ref, kmix_ref, k0_ref,
                    b0_ref, k1_ref, b1_ref, qo_ref, muo_ref, *, F, eps,
                    act):
    q_out, mu_out, _ = _fwd_core(
        q_ref[...], mu_ref[...], dq_ref[...], dmu_ref[...], kmix_ref[...],
        k0_ref[...], b0_ref[0], k1_ref[...], b1_ref[0], F, eps, act)
    qo_ref[...] = q_out
    muo_ref[...] = mu_out


def _mix_bwd_kernel(q_ref, mu_ref, dq_ref, dmu_ref, kmix_ref, k0_ref,
                    b0_ref, k1_ref, b1_ref, gq_ref, gmu_ref,
                    *out_refs, F, eps, act, wgrad):
    gqi_ref, gmui_ref = out_refs[:2]
    i = pl.program_id(0)
    if wgrad:
        (gkmix_ref, gk0_ref, gb0_ref, gk1_ref, gb1_ref) = out_refs[2:]

        @pl.when(i == 0)
        def _():
            gkmix_ref[...] = jnp.zeros_like(gkmix_ref)
            gk0_ref[...] = jnp.zeros_like(gk0_ref)
            gb0_ref[...] = jnp.zeros_like(gb0_ref)
            gk1_ref[...] = jnp.zeros_like(gk1_ref)
            gb1_ref[...] = jnp.zeros_like(gb1_ref)

    kmix = kmix_ref[...]
    k0 = k0_ref[...]
    k1 = k1_ref[...]
    _, _, s = _fwd_core(
        q_ref[...], mu_ref[...], dq_ref[...], dmu_ref[...], kmix,
        k0, b0_ref[0], k1, b1_ref[0], F, eps, act)
    Wv = kmix[:, :F]
    Ww = kmix[:, F:]
    g = gq_ref[...]
    gm_c = [gmu_ref[:, c * F:(c + 1) * F] for c in range(3)]

    gvw = g * s["dqmu_i"]
    gdmu_i = gm_c[0] * s["W_c"][0] + gm_c[1] * s["W_c"][1] \
        + gm_c[2] * s["W_c"][2]
    gW_c = [gm * s["dmu_i"] + gvw * v for gm, v in zip(gm_c, s["V_c"])]
    gV_c = [gvw * w for w in s["W_c"]]
    gdqmu_i = g * s["vw"]
    # gh via the three K1 blocks (transposed contractions)
    def _dotT(a, w):
        return jax.lax.dot_general(a, w, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    gh = (_dotT(g, k1[:, :F]) + _dotT(gdmu_i, k1[:, F:2 * F])
          + _dotT(gdqmu_i, k1[:, 2 * F:]))
    gpre = gh * _dact(act, s["pre"])
    gqp = g + _dotT(gpre, k0[:F])
    gVn = _dotT(gpre, k0[F:])
    inv_Vn = 1.0 / s["Vn"]
    gV_c = [gv + gVn * v * inv_Vn for gv, v in zip(gV_c, s["V_c"])]
    gmup = jnp.concatenate(
        [gm + _dotT(gv, Wv) + _dotT(gw, Ww)
         for gm, gv, gw in zip(gm_c, gV_c, gW_c)], axis=-1)
    gqi_ref[...] = gqp
    gmui_ref[...] = gmup
    if wgrad:
        def _wdot(a, b):
            return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        gWv = sum(_wdot(m, gv) for m, gv in zip(s["mu_c"], gV_c))
        gWw = sum(_wdot(m, gw) for m, gw in zip(s["mu_c"], gW_c))
        gkmix_ref[...] += jnp.concatenate([gWv, gWw], axis=-1)
        gk0_ref[...] += jnp.concatenate(
            [_wdot(s["qp"], gpre), _wdot(s["Vn"], gpre)], axis=0)
        gb0_ref[...] += jnp.sum(gpre, axis=0, keepdims=True)
        gk1_ref[...] += jnp.concatenate(
            [_wdot(s["h"], g), _wdot(s["h"], gdmu_i),
             _wdot(s["h"], gdqmu_i)], axis=-1)
        gb1_ref[...] += jnp.concatenate([
            jnp.sum(g, axis=0, keepdims=True),
            jnp.sum(gdmu_i, axis=0, keepdims=True),
            jnp.sum(gdqmu_i, axis=0, keepdims=True)], axis=-1)


def _row_block(A):
    # blocks are capped at 512 rows: the backward stages ~11 [R, F]/[R, 3F]
    # f32 tiles (inputs + cotangents + outputs, double-buffered), which at
    # R=512/F=128 is ~10 MB of the 16 MB scoped VMEM; 1600-row blocks OOM
    for r in (512, 640, 400, 320, 256, 160, 128):
        if A % r == 0:
            return r
    return None


def _specs(R, F, n):
    def blk(cols):
        return pl.BlockSpec((R, cols), lambda i: (i, 0))

    return blk, [
        blk(F), blk(3 * F), blk(F), blk(3 * F),
        pl.BlockSpec((F, 2 * F), lambda i: (0, 0)),
        pl.BlockSpec((2 * F, F), lambda i: (0, 0)),
        pl.BlockSpec((1, F), lambda i: (0, 0)),
        pl.BlockSpec((F, 3 * F), lambda i: (0, 0)),
        pl.BlockSpec((1, 3 * F), lambda i: (0, 0)),
    ][:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _painn_mixing_p(q, mu, dq, dmu, kmix, k0, b0, k1, b1, eps, act):
    A, F = q.shape
    R = _row_block(A)
    blk, in_specs = _specs(R, F, 9)
    qo, muo = pl.pallas_call(
        functools.partial(_mix_fwd_kernel, F=F, eps=eps, act=act),
        grid=(A // R,),
        in_specs=in_specs,
        out_specs=(blk(F), blk(3 * F)),
        out_shape=(jax.ShapeDtypeStruct((A, F), q.dtype),
                   jax.ShapeDtypeStruct((A, 3 * F), q.dtype)),
        interpret=_cb._impl() == "pallas_interpret",
    )(q, mu, dq, dmu, kmix, k0, b0[None], k1, b1[None])
    return qo, muo


def _pm_fwd(q, mu, dq, dmu, kmix, k0, b0, k1, b1, eps, act):
    out = _painn_mixing_p(q, mu, dq, dmu, kmix, k0, b0, k1, b1, eps, act)
    return out, (q, mu, dq, dmu, kmix, k0, b0, k1, b1)


def _pm_bwd(eps, act, res, cots):
    q, mu, dq, dmu, kmix, k0, b0, k1, b1 = res
    gq_out, gmu_out = cots
    A, F = q.shape
    R = _row_block(A)
    wgrad = _cb.WGRAD
    blk, in_specs = _specs(R, F, 9)
    out_specs = [blk(F), blk(3 * F)]
    out_shape = [jax.ShapeDtypeStruct((A, F), q.dtype),
                 jax.ShapeDtypeStruct((A, 3 * F), q.dtype)]
    if wgrad:
        for shp in ((F, 2 * F), (2 * F, F), (1, F), (F, 3 * F),
                    (1, 3 * F)):
            out_specs.append(pl.BlockSpec(shp, lambda i: (0, 0)))
            out_shape.append(jax.ShapeDtypeStruct(shp, q.dtype))
    outs = pl.pallas_call(
        functools.partial(_mix_bwd_kernel, F=F, eps=eps, act=act,
                          wgrad=wgrad),
        grid=(A // R,),
        in_specs=in_specs + [blk(F), blk(3 * F)],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_cb._impl() == "pallas_interpret",
    )(q, mu, dq, dmu, kmix, k0, b0[None], k1, b1[None], gq_out, gmu_out)
    gq, gmu = outs[0], outs[1]
    if wgrad:
        gkmix, gk0, gb0, gk1, gb1 = outs[2:]
        gb0, gb1 = gb0[0], gb1[0]
    else:
        gkmix = jnp.zeros_like(kmix)
        gk0 = jnp.zeros_like(k0)
        gb0 = jnp.zeros_like(b0)
        gk1 = jnp.zeros_like(k1)
        gb1 = jnp.zeros_like(b1)
    # residual identity: the message outputs' cotangents equal the
    # post-residual input cotangents
    return gq, gmu, gq, gmu, gkmix, gk0, gb0, gk1, gb1


_painn_mixing_p.defvjp(_pm_fwd, _pm_bwd)


def painn_mixing_xla(q, mu, dq, dmu, kmix, k0, b0, k1, b1, eps, act):
    """XLA reference (numerics oracle for the kernel)."""
    F = q.shape[-1]
    q_out, mu_out, _ = _fwd_core(q, mu, dq, dmu, kmix, k0, b0, k1, b1,
                                 F, eps, act)
    return q_out, mu_out


def painn_mixing_fused(q, mu, dq, dmu, kmix, k0, b0, k1, b1, eps, act):
    """Residual add + full PaiNN mixing block as one fused kernel pass
    (flat [A, 3F] layout).  ``act`` is a static string ("ssp"/"silu").
    Falls back to XLA when no row blocking divides A or off the pallas
    impl."""
    A = q.shape[0]
    if (not _cb._impl().startswith("pallas")) or _row_block(A) is None:
        return painn_mixing_xla(q, mu, dq, dmu, kmix, k0, b0, k1, b1,
                                eps, act)
    return _painn_mixing_p(q, mu, dq, dmu, kmix, k0, b0, k1, b1,
                           float(eps), act)
