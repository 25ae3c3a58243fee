"""Paged-pool lazy growth + preemption.

vLLM semantics the reference lacks entirely (it has no serving layer): pages
are allocated as decode grows, and when the pool runs dry mid-decode the
youngest request is preempted — its pages freed, its request requeued with the
generated tokens folded into the prompt embeds — instead of crashing the
scheduler with MemoryError. Every request still completes, with the same
greedy tokens as an uncontended run.
"""

import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.runtime.paged_cache import PagedBatcher
from callireader_tpu.runtime.serving import Request

CFG = callireader_tiny().llm


def _params():
    import jax

    return internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _embeds(params, ids):
    return np.asarray(internlm2.embed_tokens(params, jnp.asarray(ids), jnp.float32))


def _run(params, prompts, max_new, repetition_penalty=1.0, **kw):
    b = PagedBatcher(
        params, CFG, policy=FP32_POLICY, use_flash=False,
        cache_dtype=jnp.float32, **kw,
    )
    for uid, ids in enumerate(prompts):
        b.submit(Request(uid, _embeds(params, np.asarray(ids)[None])[0],
                         max_new_tokens=max_new, eos_token_ids=(-1,),
                         repetition_penalty=repetition_penalty))
    done = b.run()
    assert all(r.error is None for r in done), [r.error for r in done]
    return {r.uid: r.tokens for r in done}, b


def test_lazy_growth_allocates_only_live_pages():
    """Admission takes only the prompt's pages; generation grows page by
    page — HBM scales with live tokens, not with max_new_tokens."""
    params = _params()
    rng = np.random.default_rng(0)
    prompts = [[1] + list(rng.integers(2, 50, size=10))]
    tokens, b = _run(
        params, prompts, max_new=8, num_slots=2, num_pages=32,
        page_size=64, max_pages_per_slot=8,
    )
    assert len(tokens[0]) == 8
    # prompt bucket 128 = 2 pages + 1 growth page for 8 generated tokens;
    # a max_new-sized preallocation would have taken 3+ pages up front and
    # never returned the difference until retirement
    assert len(b.pool.free) == 31  # all pages returned after the drain
    assert b.n_preempted == 0


def test_oversubscribed_pool_preempts_and_completes_with_parity():
    """Soak: the pool is deliberately too small for all requests' growth.
    The scheduler must preempt (never crash), every request must complete,
    and greedy tokens must match an uncontended run."""
    params = _params()
    rng = np.random.default_rng(1)
    prompts = [
        [1] + list(rng.integers(2, 50, size=12)),
        [2] + list(rng.integers(2, 50, size=14)),
        [3] + list(rng.integers(2, 50, size=16)),
    ]
    max_new = 96  # prompt bucket 128 (2 pages) + 96 tokens -> grows to 4 pages

    # uncontended reference: a big pool, no preemption possible
    base, b0 = _run(
        params, prompts, max_new, num_slots=3, num_pages=64,
        page_size=64, max_pages_per_slot=8,
    )
    assert b0.n_preempted == 0

    # contended: 9 usable pages for 3 requests needing 4 pages each at peak
    got, b1 = _run(
        params, prompts, max_new, num_slots=3, num_pages=10,
        page_size=64, max_pages_per_slot=8, alloc_watermark=1,
    )
    assert b1.n_preempted >= 1  # the pool really was oversubscribed
    assert len(b1.pool.free) == 9
    assert got == base


def test_preemption_windowed_mode():
    """Same contract under steps_per_sync > 1 (the fused k-step decode)."""
    params = _params()
    rng = np.random.default_rng(2)
    prompts = [
        [1] + list(rng.integers(2, 50, size=12)),
        [2] + list(rng.integers(2, 50, size=14)),
        [3] + list(rng.integers(2, 50, size=16)),
    ]
    max_new = 96
    base, _ = _run(
        params, prompts, max_new, num_slots=3, num_pages=64,
        page_size=64, max_pages_per_slot=8, steps_per_sync=4,
    )
    got, b = _run(
        params, prompts, max_new, num_slots=3, num_pages=10,
        page_size=64, max_pages_per_slot=8, steps_per_sync=4,
        alloc_watermark=1,
    )
    assert b.n_preempted >= 1
    assert len(b.pool.free) == 9
    assert got == base


def test_preemption_windowed_repetition_penalty_parity():
    """A preempted-then-resumed request's post-prefill seed token must go
    through the repetition penalty against the re-marked seen rows (not a raw
    argmax), or the resumed generation diverges from the uncontended run."""
    params = _params()
    rng = np.random.default_rng(4)
    prompts = [
        [1] + list(rng.integers(2, 50, size=12)),
        [2] + list(rng.integers(2, 50, size=14)),
        [3] + list(rng.integers(2, 50, size=16)),
    ]
    max_new = 96
    base, b0 = _run(
        params, prompts, max_new, repetition_penalty=1.5, num_slots=3,
        num_pages=64, page_size=64, max_pages_per_slot=8, steps_per_sync=4,
    )
    assert b0.n_preempted == 0
    got, b = _run(
        params, prompts, max_new, repetition_penalty=1.5, num_slots=3,
        num_pages=10, page_size=64, max_pages_per_slot=8, steps_per_sync=4,
        alloc_watermark=1,
    )
    assert b.n_preempted >= 1
    assert got == base


def test_windowed_resumed_seed_respects_penalty():
    """Surgical pin for the windowed-mode seed pick: admit a resumed request
    whose already-generated token IS the post-prefill argmax — with a strong
    repetition penalty the seed must switch away from it (raw argmax would
    repeat it), and windowed mode must agree with the per-tick path."""
    import jax

    params = _params()
    rng = np.random.default_rng(5)
    prompt = [1] + list(rng.integers(2, 50, size=12))
    emb = _embeds(params, np.asarray(prompt)[None])[0]
    logits, _ = internlm2.prefill(
        params, CFG, inputs_embeds=jnp.asarray(emb)[None], max_len=128,
        policy=FP32_POLICY, use_flash=False,
    )
    seed_tok = int(np.asarray(jnp.argmax(logits[0])))  # prefill -> (B, V)

    def run(steps_per_sync):
        b = PagedBatcher(
            params, CFG, num_slots=1, num_pages=16, page_size=64,
            max_pages_per_slot=4, policy=FP32_POLICY, use_flash=False,
            cache_dtype=jnp.float32, steps_per_sync=steps_per_sync,
        )
        req = Request(0, emb.copy(), max_new_tokens=6, eos_token_ids=(-1,),
                      repetition_penalty=8.0)
        req.tokens = [seed_tok]  # resumed: this id was already generated
        b.submit(req)
        done = b.run()
        assert done[0].error is None
        return done[0].tokens

    per_tick = run(1)
    # scenario validity: the penalty really does veto the raw argmax
    assert per_tick[1] != seed_tok
    assert run(4) == per_tick


def test_resumed_overflow_retires_with_tokens():
    """A resumed request whose grown prompt no longer fits a slot is retired
    as length-finished KEEPING its generated tokens — never silently
    discarded. A fresh request in the same spot is still rejected."""
    params = _params()
    b = PagedBatcher(
        params, CFG, num_slots=2, num_pages=16, page_size=64,
        max_pages_per_slot=2,  # slot capacity: 128 tokens
        policy=FP32_POLICY, use_flash=False, cache_dtype=jnp.float32,
    )
    ids = np.arange(2, 142)[None]  # 140 rows -> bucket 256 > capacity 128
    big = _embeds(params, ids)[0]
    resumed = Request(0, big, max_new_tokens=8, eos_token_ids=(-1,))
    resumed.tokens = [11, 12, 13]  # as _preempt leaves it: output folded in
    b.submit(resumed)
    fresh = Request(1, big.copy(), max_new_tokens=8, eos_token_ids=(-1,))
    b.submit(fresh)
    done = b.run()
    by_uid = {r.uid: r for r in done}
    assert by_uid[0].error is None
    assert by_uid[0].tokens == [11, 12, 13]
    assert by_uid[1].error is not None and by_uid[1].tokens == []
    assert len(b.pool.free) == 15  # nothing leaked


def test_pool_too_small_for_one_request_fails_request_not_server():
    """When nothing is preemptible and the pool itself cannot hold one
    request's growth, the request fails with an error — the server survives
    and the pages all come back."""
    params = _params()
    rng = np.random.default_rng(3)
    prompts = [[1] + list(rng.integers(2, 50, size=12))]
    b = PagedBatcher(
        params, CFG, num_slots=2, num_pages=3, page_size=64,
        max_pages_per_slot=8, policy=FP32_POLICY, use_flash=False,
        cache_dtype=jnp.float32,
    )
    b.submit(Request(0, _embeds(params, np.asarray(prompts[0])[None])[0],
                     max_new_tokens=200, eos_token_ids=(-1,)))
    done = b.run()
    assert len(done) == 1
    assert done[0].error is not None and "exhaust" in done[0].error
    assert len(b.pool.free) == 2  # everything released
