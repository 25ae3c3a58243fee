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


def _run(params, prompts, max_new, **kw):
    b = PagedBatcher(
        params, CFG, policy=FP32_POLICY, use_flash=False,
        cache_dtype=jnp.float32, **kw,
    )
    for uid, ids in enumerate(prompts):
        b.submit(Request(uid, _embeds(params, np.asarray(ids)[None])[0],
                         max_new_tokens=max_new, eos_token_ids=(-1,)))
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
