"""Fused int8-dequant matmul kernel (kernels/int8_matmul.py), interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.kernels.int8_matmul import int8_matmul


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
