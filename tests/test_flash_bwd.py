"""Differentiable flash attention: grads vs reference autodiff (interpret)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.kernels.attention import attention_reference
from callireader_tpu.kernels.attention_bwd import flash_attention_trainable


def _grads(fn, q, k, v, *args):
    def loss(q, k, v):
        out = fn(q, k, v, *args)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("Hq,Hkv", [(4, 4), (4, 2)])
def test_grads_match_reference(causal, Hq, Hkv):
    B, S, D = 2, 64, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, S, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32)

    ref_fn = functools.partial(attention_reference, causal=causal)
    fl_fn = lambda q, k, v: flash_attention_trainable(
        q, k, v, None, None, causal, None, 32, 32, True
    )
    # forward parity first
    np.testing.assert_allclose(
        np.asarray(fl_fn(q, k, v)), np.asarray(ref_fn(q, k, v)), atol=2e-5, rtol=2e-5
    )
    gr = _grads(lambda q, k, v: ref_fn(q, k, v), q, k, v)
    gf = _grads(fl_fn, q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=f"d{name}"
        )


def test_grads_with_segments_and_padding():
    B, H, S, D = 1, 2, 48, 16  # 48 pads to 64 with block 32
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.float32)
    seg = jnp.concatenate(
        [jnp.zeros((B, 24), jnp.int32), jnp.ones((B, 24), jnp.int32)], axis=1
    )
    ref_fn = lambda q, k, v: attention_reference(
        q, k, v, causal=True, q_segment_ids=seg, kv_segment_ids=seg
    )
    fl_fn = lambda q, k, v: flash_attention_trainable(
        q, k, v, seg, seg, True, None, 32, 32, True
    )
    np.testing.assert_allclose(
        np.asarray(fl_fn(q, k, v)), np.asarray(ref_fn(q, k, v)), atol=2e-5, rtol=2e-5
    )
    gr = _grads(ref_fn, q, k, v)
    gf = _grads(fl_fn, q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4, err_msg=f"d{name}"
        )
