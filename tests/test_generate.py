"""On-device generation loop: greedy vs step-by-step equivalence, eos stop,
repetition penalty semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.runtime import generate as gen

CFG = callireader_tiny().llm


def _embed(params, ids):
    return np.asarray(jnp.take(params["tok_embeddings"], jnp.asarray(ids), axis=0))


def test_greedy_matches_manual_loop():
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    ids = np.array([[1, 5, 9, 3]], np.int32)
    embeds = jnp.asarray(_embed(params, ids))
    mask = jnp.ones(ids.shape, jnp.int32)
    gcfg = gen.GenerateConfig(max_new_tokens=6, eos_token_ids=(99999,), repetition_penalty=1.0)

    tokens, lengths = gen.generate_from_embeds(
        params, CFG, embeds, mask, gen_cfg=gcfg, max_cache_len=16,
        policy=FP32_POLICY, use_flash=False,
    )
    # manual greedy loop through prefill/decode
    last, cache = internlm2.prefill(
        params, CFG, input_ids=jnp.asarray(ids), max_len=16,
        policy=FP32_POLICY, cache_dtype=jnp.float32, use_flash=False,
    )
    manual = []
    for _ in range(6):
        t = int(jnp.argmax(last, axis=-1)[0])
        manual.append(t)
        last, cache = internlm2.decode_step(
            params, CFG, input_ids=jnp.full((1, 1), t, jnp.int32), cache=cache,
            policy=FP32_POLICY,
        )
    assert list(np.asarray(tokens)[0]) == manual
    assert int(lengths[0]) == 6


def test_eos_stops_and_pads():
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    ids = np.array([[1, 5, 9, 3]], np.int32)
    embeds = jnp.asarray(_embed(params, ids))
    mask = jnp.ones(ids.shape, jnp.int32)

    # find the first greedily generated token and declare it eos
    g0 = gen.GenerateConfig(max_new_tokens=4, eos_token_ids=(99999,))
    toks, _ = gen.generate_from_embeds(
        params, CFG, embeds, mask, gen_cfg=g0, max_cache_len=16,
        policy=FP32_POLICY, use_flash=False,
    )
    first = int(np.asarray(toks)[0, 0])

    g1 = gen.GenerateConfig(max_new_tokens=4, eos_token_ids=(first,), pad_token_id=2)
    toks1, len1 = gen.generate_from_embeds(
        params, CFG, embeds, mask, gen_cfg=g1, max_cache_len=16,
        policy=FP32_POLICY, use_flash=False,
    )
    assert int(len1[0]) == 1
    out = np.asarray(toks1)[0]
    assert out[0] == first and np.all(out[1:] == 2)


def test_repetition_penalty_changes_output():
    logits = jnp.asarray(np.array([[2.0, 1.9, -1.0]], np.float32))
    seen = jnp.asarray(np.array([[True, False, False]]))
    out = gen._apply_repetition_penalty(logits, seen, 2.0)
    np.testing.assert_allclose(np.asarray(out), np.array([[1.0, 1.9, -1.0]]), atol=1e-6)
    # negative logits are multiplied
    out2 = gen._apply_repetition_penalty(
        jnp.asarray(np.array([[-2.0]], np.float32)), jnp.asarray(np.array([[True]])), 2.0
    )
    np.testing.assert_allclose(np.asarray(out2), np.array([[-4.0]]), atol=1e-6)


def test_left_padded_batch_rows_independent():
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    ids_a = np.array([1, 5, 9, 3], np.int32)
    ids_b = np.array([1, 7], np.int32)
    pe = _embed(params, ids_a[None])  # (1,4,E)
    pad_vec = _embed(params, np.array([[2]], np.int32))[0, 0]
    embeds, mask = gen.pad_embeds_left(
        [_embed(params, ids_a[None])[0], _embed(params, ids_b[None])[0]], pad_vec, bucket=8
    )
    gcfg = gen.GenerateConfig(max_new_tokens=3, eos_token_ids=(99999,))
    toks, _ = gen.generate_from_embeds(
        params, CFG, jnp.asarray(embeds), jnp.asarray(mask), gen_cfg=gcfg,
        max_cache_len=16, policy=FP32_POLICY, use_flash=False,
    )
    # row a alone must produce identical tokens
    toks_a, _ = gen.generate_from_embeds(
        params, CFG, jnp.asarray(pe), jnp.ones((1, 4), jnp.int32), gen_cfg=gcfg,
        max_cache_len=16, policy=FP32_POLICY, use_flash=False,
    )
    np.testing.assert_array_equal(np.asarray(toks)[0], np.asarray(toks_a)[0])
