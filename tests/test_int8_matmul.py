"""Fused int8-dequant matmul kernel (kernels/int8_matmul.py), interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.kernels.int8_matmul import int8_matmul, int8_matmul_stacked


def _quantize(w: np.ndarray):
    scale = np.abs(w).max(0) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def test_parity_across_shapes():
    rng = np.random.RandomState(0)
    # decode-relevant InternLM2 shapes (scaled down): odd M exercises the
    # sublane pad, N=1280 exercises the 256-block fallback
    for M, K, N in [(4, 512, 1024), (1, 1024, 1280), (16, 4096, 512),
                    (3, 256, 128)]:
        w = rng.randn(K, N).astype(np.float32) * 0.02
        q, scale = _quantize(w)
        h = rng.randn(M, K).astype(np.float32)
        ref = (h @ q.astype(np.float32)) * scale
        out = np.asarray(int8_matmul(jnp.asarray(h), jnp.asarray(q),
                                     jnp.asarray(scale), interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_stacked_matches_sliced():
    # the scalar-prefetch stacked kernel must equal slicing the layer out
    # and running the 2-D kernel, for every layer index
    rng = np.random.RandomState(2)
    L, M, K, N = 3, 4, 512, 1024
    w = rng.randn(L, K, N).astype(np.float32) * 0.02
    scale = np.abs(w).max(1) / 127.0  # (L, N)
    q = np.clip(np.round(w / scale[:, None, :]), -127, 127).astype(np.int8)
    h = rng.randn(M, K).astype(np.float32)
    for layer in range(L):
        ref = np.asarray(int8_matmul(jnp.asarray(h), jnp.asarray(q[layer]),
                                     jnp.asarray(scale[layer]), interpret=True))
        out = np.asarray(int8_matmul_stacked(
            jnp.asarray(h), jnp.asarray(q), jnp.asarray(scale),
            jnp.asarray(layer, jnp.int32), interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_stacked_under_scan():
    # exactly the deployed pattern: lax.scan over layer indices with the
    # full stacked weights closed over (never sliced outside the kernel)
    rng = np.random.RandomState(3)
    L, M, K, N = 4, 3, 256, 128
    w = rng.randn(L, K, N).astype(np.float32) * 0.02
    scale = np.abs(w).max(1) / 127.0
    q = np.clip(np.round(w / scale[:, None, :]), -127, 127).astype(np.int8)
    h0 = rng.randn(M, K).astype(np.float32)
    qj, sj = jnp.asarray(q), jnp.asarray(scale)

    def body(h, idx):
        y = int8_matmul_stacked(h, qj, sj, idx, interpret=True)
        return h, y

    _, ys = jax.lax.scan(body, jnp.asarray(h0), jnp.arange(L, dtype=jnp.int32))
    for layer in range(L):
        ref = (h0 @ q[layer].astype(np.float32)) * scale[layer]
        np.testing.assert_allclose(np.asarray(ys[layer]), ref, rtol=1e-5,
                                   atol=1e-4)


def test_bf16_activations():
    rng = np.random.RandomState(1)
    M, K, N = 8, 512, 512
    w = rng.randn(K, N).astype(np.float32) * 0.02
    q, scale = _quantize(w)
    h = rng.randn(M, K).astype(np.float32)
    ref = (h.astype(jnp.bfloat16) @ q.astype(jnp.bfloat16)) * scale
    out = int8_matmul(jnp.asarray(h, jnp.bfloat16), jnp.asarray(q),
                      jnp.asarray(scale), interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=3e-2,
                               atol=3e-2)
