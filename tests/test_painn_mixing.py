"""Fused PaiNN mixing kernel (ops/painn_mixing.py) vs its XLA oracle.

The oracle (`painn_mixing_xla`) is itself validated end-to-end by
tests/test_colblock.py::test_forces_match_dense, which compares the whole
column path (fused mixing engaged) against the dense [A, K] layout that
runs the original unfused flax mixing branch.  Reference math:
/root/reference/src/schnetpack/representation/painn.py:70-117.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schnetpack_tpu.ops import cellblock as cb
from schnetpack_tpu.ops import painn_mixing as pm


def _inputs(A=256, F=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 9)
    return dict(
        q=jax.random.normal(ks[0], (A, F), jnp.float32),
        mu=jax.random.normal(ks[1], (A, 3 * F), jnp.float32) * 0.3,
        dq=jax.random.normal(ks[2], (A, F), jnp.float32) * 0.1,
        dmu=jax.random.normal(ks[3], (A, 3 * F), jnp.float32) * 0.1,
        kmix=jax.random.normal(ks[4], (F, 2 * F), jnp.float32) / np.sqrt(F),
        k0=jax.random.normal(ks[5], (2 * F, F), jnp.float32) / np.sqrt(2 * F),
        b0=jax.random.normal(ks[6], (F,), jnp.float32) * 0.01,
        k1=jax.random.normal(ks[7], (F, 3 * F), jnp.float32) / np.sqrt(F),
        b1=jax.random.normal(ks[8], (3 * F,), jnp.float32) * 0.01,
    )


def _call(fn, inp, act):
    return fn(inp["q"], inp["mu"], inp["dq"], inp["dmu"], inp["kmix"],
              inp["k0"], inp["b0"], inp["k1"], inp["b1"], 1e-8, act)


@pytest.mark.parametrize("act", ["ssp", "silu"])
def test_fused_matches_xla_forward_and_grads(act):
    inp = _inputs()
    old_impl, old_wgrad = cb.IMPL, cb.WGRAD
    cb.IMPL, cb.WGRAD = "pallas_interpret", True
    try:
        qo_k, muo_k = _call(pm.painn_mixing_fused, inp, act)
        qo_x, muo_x = _call(pm.painn_mixing_xla, inp, act)
        np.testing.assert_allclose(qo_k, qo_x, rtol=0, atol=2e-5)
        np.testing.assert_allclose(muo_k, muo_x, rtol=0, atol=2e-5)

        def loss(fn, i):
            qo, muo = _call(fn, i, act)
            return jnp.sum(jnp.sin(qo)) + jnp.sum(jnp.cos(muo))

        gk = jax.grad(lambda i: loss(pm.painn_mixing_fused, i))(inp)
        gx = jax.grad(lambda i: loss(pm.painn_mixing_xla, i))(inp)
        for name in inp:
            np.testing.assert_allclose(
                gk[name], gx[name], rtol=0, atol=5e-4,
                err_msg=f"cotangent mismatch for {name}")
    finally:
        cb.IMPL, cb.WGRAD = old_impl, old_wgrad


def test_md_mode_skips_weight_cotangents():
    """WGRAD=False (MD tracing mode): input cotangents still match the
    oracle; weight cotangents come back zero (cellblock.py:95-100)."""
    inp = _inputs(seed=1)
    old_impl, old_wgrad = cb.IMPL, cb.WGRAD
    cb.IMPL, cb.WGRAD = "pallas_interpret", False
    try:
        def loss(fn, i):
            qo, muo = _call(fn, i, "silu")
            return jnp.sum(qo ** 2) + jnp.sum(muo ** 2)

        gk = jax.grad(lambda i: loss(pm.painn_mixing_fused, i))(inp)
        gx = jax.grad(lambda i: loss(pm.painn_mixing_xla, i))(inp)
        for name in ("q", "mu", "dq", "dmu"):
            np.testing.assert_allclose(gk[name], gx[name], rtol=0,
                                       atol=5e-4, err_msg=name)
        for name in ("kmix", "k0", "b0", "k1", "b1"):
            assert float(jnp.abs(gk[name]).max()) == 0.0
    finally:
        cb.IMPL, cb.WGRAD = old_impl, old_wgrad


def test_xla_fallback_on_odd_rows():
    """A row count with no block divisor falls back to the XLA path."""
    inp = _inputs(A=254)
    qo, muo = _call(pm.painn_mixing_fused, inp, "silu")
    qo_x, muo_x = _call(pm.painn_mixing_xla, inp, "silu")
    np.testing.assert_array_equal(np.asarray(qo), np.asarray(qo_x))
    np.testing.assert_array_equal(np.asarray(muo), np.asarray(muo_x))
