"""Paged KV cache: kernel parity, allocator, scheduler parity vs the
contiguous-slot batcher."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.kernels.attention import attention_reference
from callireader_tpu.kernels.paged_decode import paged_flash_decode
from callireader_tpu.models import internlm2
from callireader_tpu.runtime import generate as gen
from callireader_tpu.runtime.paged_cache import PagedBatcher, PagePool
from callireader_tpu.runtime.serving import Request

CFG = callireader_tiny().llm


def test_paged_kernel_matches_gathered_reference():
    L, NP, B, Hq, Hkv, page, D, P = 2, 8, 2, 8, 2, 16, 32, 3
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, 1, D), jnp.float32)
    kpool = jax.random.normal(ks[1], (L, NP, Hkv, page, D), jnp.float32)
    vpool = jax.random.normal(ks[2], (L, NP, Hkv, page, D), jnp.float32)
    page_table = jnp.asarray([[3, 5, 1], [7, 2, 0]], jnp.int32)
    valid = np.zeros((B, P, page), np.int32)
    valid[0, :2, :] = 1
    valid[0, 2, :5] = 1
    valid[1, 0, 4:] = 1
    valid[1, 1, :] = 1
    valid = jnp.asarray(valid)

    for l in range(L):
        out = paged_flash_decode(q, kpool, vpool, jnp.asarray(l), page_table, valid, interpret=True)
        # gathered dense reference
        k = kpool[l][page_table].transpose(0, 2, 1, 3, 4).reshape(B, Hkv, P * page, D)
        v = vpool[l][page_table].transpose(0, 2, 1, 3, 4).reshape(B, Hkv, P * page, D)
        seg = jnp.where(valid.reshape(B, P * page) > 0, 0, -9).astype(jnp.int32)
        ref = attention_reference(
            q, k, v, causal=False,
            q_segment_ids=jnp.zeros((B, 1), jnp.int32), kv_segment_ids=seg,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_page_pool():
    pool = PagePool(8)
    a = pool.alloc(3)
    assert 0 not in a  # trash page reserved
    b = pool.alloc(4)
    assert set(a).isdisjoint(b)
    with pytest.raises(MemoryError):
        pool.alloc(2)
    pool.release(a)
    assert len(pool.alloc(3)) == 3


def _embeds(params, ids):
    return np.asarray(internlm2.embed_tokens(params, jnp.asarray(ids), jnp.float32))


def test_paged_batcher_matches_reference_tokens():
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    batcher = PagedBatcher(
        params, CFG, num_slots=2, num_pages=32, page_size=64, max_pages_per_slot=4,
        policy=FP32_POLICY, use_flash=False, cache_dtype=jnp.float32,
    )
    prompts = [[1, 5, 9, 3], [1, 7, 11], [1, 42, 17, 23, 8]]
    for uid, ids in enumerate(prompts):
        batcher.submit(
            Request(uid, _embeds(params, np.asarray(ids)[None])[0],
                    max_new_tokens=6, eos_token_ids=(-1,))
        )
    done = batcher.run()
    assert len(done) == 3
    by_uid = {r.uid: r.tokens for r in done}
    for uid, ids in enumerate(prompts):
        e = _embeds(params, np.asarray(ids)[None])
        toks, lengths = gen.generate_from_embeds(
            params, CFG, jnp.asarray(e), jnp.ones((1, len(ids)), jnp.int32),
            gen_cfg=gen.GenerateConfig(max_new_tokens=6, eos_token_ids=(-1,)),
            max_cache_len=256, policy=FP32_POLICY, use_flash=False,
        )
        expected = list(np.asarray(toks)[0, : int(lengths[0])])
        assert by_uid[uid] == expected, (uid, by_uid[uid], expected)
    # all pages returned
    assert len(batcher.pool.free) == 31


def test_paged_windowed_matches_single_step():
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)

    def run(k):
        b = PagedBatcher(
            params, CFG, num_slots=2, num_pages=32, page_size=64,
            max_pages_per_slot=4, policy=FP32_POLICY, use_flash=False,
            cache_dtype=jnp.float32, steps_per_sync=k,
        )
        for uid, ids in enumerate([[1, 5, 9, 3], [1, 7, 11], [1, 42, 17, 23, 8]]):
            b.submit(Request(uid, _embeds(params, np.asarray(ids)[None])[0],
                             max_new_tokens=7, eos_token_ids=(-1,),
                             repetition_penalty=1.3))
        done = b.run()
        assert len(b.pool.free) == 31  # all pages returned
        return {r.uid: r.tokens for r in done}

    assert run(1) == run(4)


def test_paged_overlong_prompt_rejected_not_crash():
    """A prompt needing more pages than a slot can hold is rejected at
    admission (clamping would crash _insert_pages / corrupt prompt KV)."""
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)

    def emb(ids):
        return np.asarray(
            internlm2.embed_tokens(params, jnp.asarray(np.asarray(ids)[None]), jnp.float32)
        )[0]

    b = PagedBatcher(
        params, CFG, num_slots=2, num_pages=16, page_size=64,
        max_pages_per_slot=2, policy=FP32_POLICY, use_flash=False,
    )
    rng = np.random.RandomState(5)
    too_long = Request(  # bucket 256 > 2 pages x 64
        uid=0, embeds=emb(rng.randint(10, 900, 200)), max_new_tokens=4,
        eos_token_ids=(-1,),
    )
    ok = Request(uid=1, embeds=emb([1, 5, 9]), max_new_tokens=4, eos_token_ids=(-1,))
    b.submit(too_long)
    b.submit(ok)
    done = b.run()
    by_uid = {r.uid: r for r in done}
    assert by_uid[0].error is not None and by_uid[0].tokens == []
    assert by_uid[1].error is None and len(by_uid[1].tokens) >= 1
