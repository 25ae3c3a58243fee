"""Continuous batching: token parity with the fused single-request path,
slot reuse, mixed prompt lengths."""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.runtime import generate as gen
from callireader_tpu.runtime.serving import ContinuousBatcher, Request

CFG = callireader_tiny().llm


def _params():
    return internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def _embeds(params, ids):
    return np.asarray(internlm2.embed_tokens(params, jnp.asarray(ids), jnp.float32))


def _reference_tokens(params, ids, n, rep=1.0):
    e = _embeds(params, np.asarray(ids)[None])
    toks, lengths = gen.generate_from_embeds(
        params, CFG, jnp.asarray(e), jnp.ones((1, len(ids)), jnp.int32),
        gen_cfg=gen.GenerateConfig(
            max_new_tokens=n, eos_token_ids=(-1,), repetition_penalty=rep
        ),
        max_cache_len=256, policy=FP32_POLICY, use_flash=False,
    )
    return list(np.asarray(toks)[0, : int(lengths[0])])


def test_matches_single_request_path():
    params = _params()
    batcher = ContinuousBatcher(
        params, CFG, num_slots=3, max_len=256, policy=FP32_POLICY,
        use_flash=False, cache_dtype=jnp.float32,
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
        expected = _reference_tokens(params, ids, 6)
        assert by_uid[uid] == expected, (uid, by_uid[uid], expected)


def test_slots_refill_from_queue():
    params = _params()
    batcher = ContinuousBatcher(
        params, CFG, num_slots=2, max_len=256, policy=FP32_POLICY,
        use_flash=False, cache_dtype=jnp.float32,
    )
    # 5 requests through 2 slots
    for uid in range(5):
        ids = [1, 10 + uid]
        batcher.submit(
            Request(uid, _embeds(params, np.asarray(ids)[None])[0],
                    max_new_tokens=3, eos_token_ids=(-1,))
        )
    done = batcher.run()
    assert sorted(r.uid for r in done) == [0, 1, 2, 3, 4]
    for r in done:
        assert len(r.tokens) == 3


def test_repetition_penalty_parity():
    params = _params()
    batcher = ContinuousBatcher(
        params, CFG, num_slots=1, max_len=256, policy=FP32_POLICY,
        use_flash=False, cache_dtype=jnp.float32,
    )
    ids = [1, 5, 9, 3]
    batcher.submit(
        Request(0, _embeds(params, np.asarray(ids)[None])[0],
                max_new_tokens=6, eos_token_ids=(-1,), repetition_penalty=1.5)
    )
    done = batcher.run()
    assert done[0].tokens == _reference_tokens(params, ids, 6, rep=1.5)


def test_windowed_matches_single_step():
    """steps_per_sync>1 produces identical greedy tokens to the 1-step path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.core.config import callireader_tiny
    from callireader_tpu.core.dtypes import FP32_POLICY
    from callireader_tpu.models import internlm2
    from callireader_tpu.runtime.serving import ContinuousBatcher, Request

    cfg = callireader_tiny().llm
    params = internlm2.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    prompts = [[1, 5, 9, 3], [1, 7, 11], [1, 42, 17, 23, 8]]

    def run(k):
        b = ContinuousBatcher(
            params, cfg, num_slots=2, max_len=256, policy=FP32_POLICY,
            use_flash=False, cache_dtype=jnp.float32, steps_per_sync=k,
        )
        for uid, ids in enumerate(prompts):
            e = np.asarray(internlm2.embed_tokens(params, jnp.asarray([ids]), jnp.float32))[0]
            b.submit(Request(uid, e, max_new_tokens=7, eos_token_ids=(-1,),
                             repetition_penalty=1.3))
        return {r.uid: r.tokens for r in b.run()}

    assert run(1) == run(4)


def test_mixed_bucket_admissions():
    """Prompts landing in different buckets admit correctly through the
    grouped multi-row prefill, in both batchers and both sync modes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.core.config import callireader_tiny
    from callireader_tpu.core.dtypes import FP32_POLICY
    from callireader_tpu.models import internlm2
    from callireader_tpu.runtime.paged_cache import PagedBatcher
    from callireader_tpu.runtime.serving import ContinuousBatcher, Request

    cfg = callireader_tiny().llm
    params = internlm2.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.RandomState(3)
    prompts = [
        [1, 5, 9],                                  # small bucket
        list(rng.randint(10, 900, 150)),            # larger bucket
        [1, 7, 11, 13],                             # small bucket again
        list(rng.randint(10, 900, 140)),            # larger bucket again
    ]

    def run(make):
        b = make()
        for uid, ids in enumerate(prompts):
            e = np.asarray(internlm2.embed_tokens(params, jnp.asarray([ids]), jnp.float32))[0]
            b.submit(Request(uid, e, max_new_tokens=5, eos_token_ids=(-1,)))
        done = b.run()
        assert len(done) == 4
        return {r.uid: r.tokens for r in done}

    base = run(lambda: ContinuousBatcher(
        params, cfg, num_slots=4, max_len=512, policy=FP32_POLICY,
        use_flash=False, cache_dtype=jnp.float32))
    for make in (
        lambda: ContinuousBatcher(params, cfg, num_slots=4, max_len=512,
                                  policy=FP32_POLICY, use_flash=False,
                                  cache_dtype=jnp.float32, steps_per_sync=4),
        lambda: PagedBatcher(params, cfg, num_slots=4, num_pages=64, page_size=64,
                             max_pages_per_slot=8, policy=FP32_POLICY,
                             use_flash=False, cache_dtype=jnp.float32),
        lambda: PagedBatcher(params, cfg, num_slots=4, num_pages=64, page_size=64,
                             max_pages_per_slot=8, policy=FP32_POLICY,
                             use_flash=False, cache_dtype=jnp.float32,
                             steps_per_sync=4),
    ):
        assert run(make) == base


def test_overlong_prompt_rejected_not_crash():
    """A prompt whose bucket exceeds max_len (or leaves no windowed headroom)
    fails just that request at admission; the server keeps serving."""
    params = _params()
    batcher = ContinuousBatcher(
        params, CFG, num_slots=2, max_len=256, policy=FP32_POLICY,
        use_flash=False, steps_per_sync=4,
    )
    rng = np.random.RandomState(3)
    # bucket 256 + window 4 > 256 -> rejected
    too_long = Request(
        uid=0, embeds=_embeds(params, np.asarray(rng.randint(10, 900, 200))[None])[0],
        max_new_tokens=8, eos_token_ids=(-1,),
    )
    ok = Request(
        uid=1, embeds=_embeds(params, np.asarray([1, 5, 9])[None])[0],
        max_new_tokens=6, eos_token_ids=(-1,),
    )
    batcher.submit(too_long)
    batcher.submit(ok)
    done = batcher.run()
    by_uid = {r.uid: r for r in done}
    assert by_uid[0].error is not None and by_uid[0].tokens == []
    assert by_uid[1].error is None and len(by_uid[1].tokens) == 6
