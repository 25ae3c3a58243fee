"""Pallas RMSNorm fwd/bwd vs jax autodiff of the reference formula."""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.kernels.rmsnorm import rms_norm_pallas

EPS = 1e-5


def ref_rmsnorm(x, w):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + EPS) * w.astype(jnp.float32)).astype(x.dtype)


def test_forward_matches():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (256,)) * 0.1 + 1.0
    out = rms_norm_pallas(x, w, EPS, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_rmsnorm(x, w)), atol=1e-5)


def test_grads_match_autodiff():
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (256,)) * 0.1 + 1.0
    dy = jax.random.normal(jax.random.PRNGKey(4), (8, 256), jnp.float32)

    def f_ref(x, w):
        return jnp.sum(ref_rmsnorm(x, w) * dy)

    def f_ker(x, w):
        return jnp.sum(rms_norm_pallas(x, w, EPS, True) * dy)

    gx_ref, gw_ref = jax.grad(f_ref, argnums=(0, 1))(x, w)
    gx_ker, gw_ker = jax.grad(f_ker, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_ker), np.asarray(gx_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_ker), np.asarray(gw_ref), atol=1e-4, rtol=1e-4)


def test_bf16_stream_fp32_stats():
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 128), jnp.bfloat16)
    w = jnp.ones((128,), jnp.bfloat16)
    out = rms_norm_pallas(x, w, EPS, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_rmsnorm(x, w), np.float32), atol=0.05
    )
