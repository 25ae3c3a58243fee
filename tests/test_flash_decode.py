"""Pallas flash-decode kernel vs reference attention (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.kernels.attention import attention_reference
from callireader_tpu.kernels.decode_attention import flash_decode


def _setup(L=2, B=3, Hq=8, Hkv=2, S=64, D=32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, 1, D), jnp.float32)
    ck = jax.random.normal(ks[1], (L, B, Hkv, S, D), jnp.float32)
    cv = jax.random.normal(ks[2], (L, B, Hkv, S, D), jnp.float32)
    return q, ck, cv


def _ref(q, k, v, valid):
    kv_seg = jnp.where(valid > 0, 0, -9).astype(jnp.int32)
    q_seg = jnp.zeros((q.shape[0], 1), jnp.int32)
    return attention_reference(
        q, k, v, causal=False, q_segment_ids=q_seg, kv_segment_ids=kv_seg
    )


def test_layer_selection_and_masking():
    q, ck, cv = _setup()
    S = ck.shape[3]
    lengths = jnp.asarray([10, 35, 64])
    valid = (jnp.arange(S)[None, :] < lengths[:, None]).astype(jnp.int32)
    for l in range(ck.shape[0]):
        out = flash_decode(q, ck, cv, jnp.asarray(l), valid, interpret=True)
        ref = _ref(q, ck[l], cv[l], valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_chunked_blocks():
    q, ck, cv = _setup(S=128)
    valid = jnp.ones((3, 128), jnp.int32)
    out = flash_decode(q, ck, cv, jnp.asarray(1), valid, block_k=32, interpret=True)
    ref = _ref(q, ck[1], cv[1], valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_left_padded_window():
    # serving: valid window [start, length] per row
    q, ck, cv = _setup()
    S = ck.shape[3]
    starts = jnp.asarray([5, 0, 20])
    ends = jnp.asarray([40, 64, 50])
    pos = jnp.arange(S)[None, :]
    valid = ((pos >= starts[:, None]) & (pos < ends[:, None])).astype(jnp.int32)
    out = flash_decode(q, ck, cv, jnp.asarray(0), valid, interpret=True)
    ref = _ref(q, ck[0], cv[0], valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
