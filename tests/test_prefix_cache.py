"""Prefix KV cache: chunked prefill over a cached prompt prefix.

The reference re-prefills the entire transcript every chat turn
(modeling_internvl_chat.py:290-344); the serving prefix cache computes the
shared prefix KV once and prefills only the per-request suffix. These tests
pin (a) prefill_with_prefix math against the full prefill, (b) the causally
offset flash kernel, (c) the ContinuousBatcher end-to-end hit path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.kernels.attention import attention_reference, flash_attention
from callireader_tpu.models import internlm2
from callireader_tpu.runtime.serving import ContinuousBatcher, Request

CFG = callireader_tiny().llm


def _params():
    return internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _embeds(params, ids):
    return np.asarray(internlm2.embed_tokens(params, jnp.asarray(ids), jnp.float32))


def test_flash_attention_q_offset_matches_reference():
    """Causal masking with the q block positioned mid-sequence (interpret
    mode so the Pallas path runs on CPU)."""
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    B, Hq, Hkv, D = 2, 4, 2, 16
    Sk, Sq, off = 48, 16, 32  # q rows sit at positions [32, 48)
    q = jax.random.normal(kq, (B, Hq, Sq, D), jnp.float32)
    k = jax.random.normal(kk, (B, Hkv, Sk, D), jnp.float32)
    v = jax.random.normal(kv, (B, Hkv, Sk, D), jnp.float32)
    ref = attention_reference(q, k, v, causal=True, q_offset=off)
    out = flash_attention(q, k, v, causal=True, q_offset=off, interpret=True,
                          block_q=16, block_k=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def _full_and_chunked(params, prefix_ids, suffix_ids, pad=0, max_len=64):
    """Run the full-prompt prefill and the prefix-chunked prefill over the
    same (optionally left-padded) prompt; returns both (logits, cache)."""
    P, SL = len(prefix_ids), len(suffix_ids)
    all_ids = np.asarray(prefix_ids + suffix_ids)
    full_e = _embeds(params, np.concatenate([np.zeros(pad, np.int64), all_ids])[None])
    full_mask = np.ones((1, pad + P + SL), np.int32)
    full_mask[0, :pad] = 0
    lf, cf = internlm2.prefill(
        params, CFG, inputs_embeds=jnp.asarray(full_e),
        attention_mask=jnp.asarray(full_mask), max_len=max_len,
        policy=FP32_POLICY, use_flash=False, cache_dtype=jnp.float32,
    )

    pe = _embeds(params, np.asarray(prefix_ids)[None])
    _, pc = internlm2.prefill(
        params, CFG, inputs_embeds=jnp.asarray(pe), max_len=P,
        policy=FP32_POLICY, use_flash=False, cache_dtype=jnp.float32,
    )
    se = _embeds(params, np.concatenate([np.zeros(pad, np.int64), np.asarray(suffix_ids)])[None])
    smask = np.ones((1, pad + SL), np.int32)
    smask[0, :pad] = 0
    lc, cc = internlm2.prefill_with_prefix(
        params, CFG, inputs_embeds=jnp.asarray(se),
        attention_mask=jnp.asarray(smask),
        prefix_k=pc.k[:, 0], prefix_v=pc.v[:, 0], max_len=max_len,
        policy=FP32_POLICY, use_flash=False, cache_dtype=jnp.float32,
    )
    return (lf, cf), (lc, cc)


def test_prefill_with_prefix_matches_full_prefill():
    params = _params()
    prefix = [1, 5, 9, 3, 7, 2, 11, 4]
    suffix = [6, 8, 10, 12]
    (lf, cf), (lc, cc) = _full_and_chunked(params, prefix, suffix)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lf), atol=1e-4, rtol=1e-4)
    S = len(prefix) + len(suffix)
    np.testing.assert_allclose(
        np.asarray(cc.k[:, :, :, :S]), np.asarray(cf.k[:, :, :, :S]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cc.v[:, :, :, :S]), np.asarray(cf.v[:, :, :, :S]), atol=1e-5
    )


def test_prefill_with_prefix_left_padded_rows():
    """The chunked cache region must land at [padlen, P+S) — the contiguous
    left-padded layout the multislot decode's starts/lengths expect."""
    params = _params()
    prefix = [1, 5, 9, 3, 7, 2, 11, 4]
    suffix = [6, 8, 10]
    pad = 5
    (lf, cf), (lc, cc) = _full_and_chunked(params, prefix, suffix, pad=pad)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(lf), atol=1e-4, rtol=1e-4)
    lo, hi = pad, pad + len(prefix) + len(suffix)
    np.testing.assert_allclose(
        np.asarray(cc.k[:, :, :, lo:hi]), np.asarray(cf.k[:, :, :, lo:hi]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cc.v[:, :, :, lo:hi]), np.asarray(cf.v[:, :, :, lo:hi]), atol=1e-5
    )


def test_batcher_prefix_cache_token_parity():
    """Requests sharing a registered prefix decode to the same tokens as a
    batcher with no prefix cache; the non-matching request is unaffected."""
    params = _params()
    rng = np.random.default_rng(0)
    prefix_ids = [1] + list(rng.integers(2, 50, size=19))
    prompts = [
        prefix_ids + list(rng.integers(2, 50, size=n)) for n in (3, 5, 7)
    ] + [[1, 42, 17, 23]]  # no prefix match

    def run(register: bool):
        b = ContinuousBatcher(
            params, CFG, num_slots=4, max_len=256, policy=FP32_POLICY,
            use_flash=False, cache_dtype=jnp.float32,
        )
        if register:
            got = b.register_prefix(
                _embeds(params, np.asarray(prefix_ids)[None])[0], quantum=4
            )
            assert got == 20
        for uid, ids in enumerate(prompts):
            b.submit(Request(uid, _embeds(params, np.asarray(ids)[None])[0],
                             max_new_tokens=6, eos_token_ids=(-1,)))
        done = b.run()
        return {r.uid: r.tokens for r in done}, b.prefix_hits

    base, hits0 = run(register=False)
    cached, hits1 = run(register=True)
    assert hits0 == 0 and hits1 == 3
    assert cached == base


def test_register_prefix_quantum_and_dedup():
    params = _params()
    b = ContinuousBatcher(
        params, CFG, num_slots=2, max_len=256, policy=FP32_POLICY,
        use_flash=False, cache_dtype=jnp.float32,
    )
    e = _embeds(params, np.arange(1, 11)[None])[0]  # 10 rows
    assert b.register_prefix(e, quantum=4) == 8  # floored to the quantum
    assert b.register_prefix(e, quantum=4) == 8  # dedup: no second entry
    assert len(b.prefixes) == 1
    assert b.register_prefix(e[:3], quantum=4) == 0  # too short


def test_register_prefix_clamped_to_capacity():
    """A prompt longer than the batcher's cache must register a CLAMPED
    prefix (hits need suffix room; the old code crashed inside prefill)."""
    params = _params()
    b = ContinuousBatcher(
        params, CFG, num_slots=2, max_len=64, policy=FP32_POLICY,
        use_flash=False, cache_dtype=jnp.float32,
    )
    e = _embeds(params, (np.arange(100) % 50 + 1)[None])[0]  # 100 > max_len
    assert b.register_prefix(e, quantum=16) == 48  # min(100, 64-16) floor 16
    assert b.prefixes[0].plen == 48


def test_distinct_prefixes_same_length_same_admission_batch():
    """Two conversations whose registered prefixes have the SAME quantized
    length must not collapse into one admission group — each request has to
    prefill over ITS OWN prefix KV (the bug keyed groups by (bucket, plen)
    and ran everyone over the first entry's KV)."""
    params = _params()
    rng = np.random.default_rng(7)
    pre_a = [1] + list(rng.integers(2, 50, size=19))
    pre_b = [2] + list(rng.integers(2, 50, size=19))  # same length, different
    prompts = [
        pre_a + list(rng.integers(2, 50, size=5)),
        pre_b + list(rng.integers(2, 50, size=5)),
        pre_a + list(rng.integers(2, 50, size=7)),
        pre_b + list(rng.integers(2, 50, size=7)),
    ]

    def run(register: bool):
        b = ContinuousBatcher(
            params, CFG, num_slots=4, max_len=256, policy=FP32_POLICY,
            use_flash=False, cache_dtype=jnp.float32,
        )
        if register:
            assert b.register_prefix(_embeds(params, np.asarray(pre_a)[None])[0], quantum=4) == 20
            assert b.register_prefix(_embeds(params, np.asarray(pre_b)[None])[0], quantum=4) == 20
        for uid, ids in enumerate(prompts):
            b.submit(Request(uid, _embeds(params, np.asarray(ids)[None])[0],
                             max_new_tokens=6, eos_token_ids=(-1,)))
        done = b.run()
        return {r.uid: r.tokens for r in done}, b.prefix_hits

    base, _ = run(register=False)
    cached, hits = run(register=True)
    assert hits == 4  # every request hit its own prefix
    assert cached == base


def test_register_prefix_incremental_extension():
    """Registering a prompt that extends an already-registered prefix must
    prefill only the delta (chunked over the base KV) and still produce a
    KV-identical entry — multi-turn auto-registration then costs one suffix
    prefill per turn, not a whole-transcript prefill."""
    params = _params()
    rng = np.random.default_rng(3)
    base_ids = [1] + list(rng.integers(2, 50, size=7))      # plen 8
    full_ids = base_ids + list(rng.integers(2, 50, size=8))  # plen 16

    b = ContinuousBatcher(
        params, CFG, num_slots=2, max_len=256, policy=FP32_POLICY,
        use_flash=False, cache_dtype=jnp.float32,
    )
    assert b.register_prefix(_embeds(params, np.asarray(base_ids)[None])[0], quantum=4) == 8
    assert b.register_prefix(_embeds(params, np.asarray(full_ids)[None])[0], quantum=4) == 16
    assert len(b.prefixes) == 2
    assert ("ext", 8, 8) in b._prefill_prefix_cache  # the delta program ran

    # the extended entry's KV must equal a from-scratch registration's
    b2 = ContinuousBatcher(
        params, CFG, num_slots=2, max_len=256, policy=FP32_POLICY,
        use_flash=False, cache_dtype=jnp.float32,
    )
    assert b2.register_prefix(_embeds(params, np.asarray(full_ids)[None])[0], quantum=4) == 16
    ext = max(b.prefixes, key=lambda e: e.plen)
    scratch = b2.prefixes[0]
    np.testing.assert_allclose(np.asarray(ext.k), np.asarray(scratch.k), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ext.v), np.asarray(scratch.v), atol=1e-4)

    # and end-to-end: a request over the long prefix decodes to parity
    tail = list(rng.integers(2, 50, size=5))
    req_ids = full_ids + tail
    b.submit(Request(0, _embeds(params, np.asarray(req_ids)[None])[0],
                     max_new_tokens=6, eos_token_ids=(-1,)))
    got = {r.uid: r.tokens for r in b.run()}
    b3 = ContinuousBatcher(
        params, CFG, num_slots=2, max_len=256, policy=FP32_POLICY,
        use_flash=False, cache_dtype=jnp.float32,
    )
    b3.submit(Request(0, _embeds(params, np.asarray(req_ids)[None])[0],
                      max_new_tokens=6, eos_token_ids=(-1,)))
    assert got == {r.uid: r.tokens for r in b3.run()}


def test_scheduler_loop_auto_prefix_multiturn():
    """HTTP front end with --prefix-cache: turn 1 registers its prompt's
    prefix; turn 2 (same conversation, history grown) hits it and produces
    the same answer as an uncached loop."""
    from callireader_tpu.cli.common import build_engine
    from callireader_tpu.runtime.http_server import SchedulerLoop

    engine = build_engine(preset="callireader-tiny", random_init_ok=True)

    def ask(loop, spec):
        sess = loop.submit(dict(spec), stream=False)
        kind, payload = sess.events.get(timeout=300)
        assert kind == "done", payload
        return payload["text"]

    def run_conversation(prefix_cache: bool):
        batcher = ContinuousBatcher(
            engine.params["llm"], engine.cfg.llm, num_slots=2, max_len=512,
            policy=engine.policy, use_flash=False,
        )
        loop = SchedulerLoop(engine, batcher, prefix_cache=prefix_cache).start()
        try:
            # a long-ish first question so the registered prefix clears the
            # 128-token quantum
            q1 = "请逐字解释这幅书法作品的内容与章法布局。" * 8
            a1 = ask(loop, {"question": q1, "max_new_tokens": 4})
            a2 = ask(loop, {
                "question": "它的作者是谁?", "history": [(q1, a1)],
                "max_new_tokens": 4,
            })
            return a1, a2, loop.n_prefix_registered, batcher.prefix_hits
        finally:
            loop.shutdown()

    a1, a2, n_reg, hits = run_conversation(prefix_cache=True)
    b1, b2, n_reg0, hits0 = run_conversation(prefix_cache=False)
    assert (a1, a2) == (b1, b2)
    assert n_reg0 == 0 and hits0 == 0
    assert n_reg >= 1
    assert hits >= 1  # turn 2 reused turn 1's registered prefix


def test_paged_batcher_prefix_cache_token_parity():
    """Same contract on the paged scheduler: prefix hits prefill only the
    suffix, the prefix KV lands in the request's own pages, tokens match."""
    from callireader_tpu.runtime.paged_cache import PagedBatcher

    params = _params()
    rng = np.random.default_rng(1)
    prefix_ids = [1] + list(rng.integers(2, 50, size=19))
    prompts = [
        prefix_ids + list(rng.integers(2, 50, size=n)) for n in (3, 6)
    ] + [[1, 9, 2, 7]]  # no prefix match

    def run(register: bool):
        b = PagedBatcher(
            params, CFG, num_slots=3, num_pages=16, page_size=64,
            max_pages_per_slot=4, policy=FP32_POLICY, use_flash=False,
            cache_dtype=jnp.float32,
        )
        if register:
            assert b.register_prefix(
                _embeds(params, np.asarray(prefix_ids)[None])[0], quantum=4
            ) == 20
        for uid, ids in enumerate(prompts):
            b.submit(Request(uid, _embeds(params, np.asarray(ids)[None])[0],
                             max_new_tokens=6, eos_token_ids=(-1,)))
        done = b.run()
        return {r.uid: r.tokens for r in done}, b.prefix_hits

    base, _ = run(register=False)
    cached, hits = run(register=True)
    assert hits == 2
    assert cached == base
