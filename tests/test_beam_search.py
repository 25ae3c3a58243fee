"""Beam search parity surface (HF generate's num_beams knob).

The reference inherits num_beams from HF generate but always passes 1
(/root/reference/inference.py:92-96, evaluate.py:416-420);
beam_generate_from_embeds closes the API-surface gap TPU-natively. Pins:
  - num_beams=1 reduces exactly to the greedy path
  - the beam-4 result's teacher-forced sequence logprob is no worse than
    greedy's (the point of beaming)
  - eos retires beams (lengths < T, pad after) and the repetition-penalty
    variant runs the same on-device loop
"""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import LLMConfig
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.runtime import generate as gen

CFG = LLMConfig(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=1,
    max_position_embeddings=256,
)
T = 8


def _setup(seed=0):
    params = internlm2.init_params(jax.random.PRNGKey(seed), CFG, jnp.float32)
    ids = np.random.RandomState(seed).randint(3, 120, (1, 11)).astype(np.int32)
    emb = internlm2.embed_tokens(params, jnp.asarray(ids), jnp.float32)
    mask = jnp.ones(ids.shape, jnp.int32)
    return params, ids, emb, mask


def _run(params, emb, mask, k, penalty=1.0, eos=(-1,)):
    gc = gen.GenerateConfig(max_new_tokens=T, eos_token_ids=eos,
                            repetition_penalty=penalty, num_beams=k)
    fn = gen.beam_generate_from_embeds if k > 1 else gen.generate_from_embeds
    toks, lens = fn(params, CFG, emb, mask, gen_cfg=gc,
                    max_cache_len=emb.shape[1] + T, use_flash=False,
                    policy=FP32_POLICY)
    return np.asarray(toks)[0], int(np.asarray(lens)[0])


def _seq_logprob(params, ids, toks, n):
    """Teacher-forced sum logprob of ``toks[:n]`` after prompt ``ids``."""
    full = np.concatenate([ids[0], toks[:n]])[None].astype(np.int32)
    emb = internlm2.embed_tokens(params, jnp.asarray(full), jnp.float32)
    logits = internlm2.forward(
        params, CFG, inputs_embeds=emb, use_flash=False, policy=FP32_POLICY
    )
    lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    S = ids.shape[1]
    pos = np.arange(S - 1, S - 1 + n)
    return float(np.asarray(lp)[pos, toks[:n]].sum())


def test_one_beam_equals_greedy():
    params, ids, emb, mask = _setup(0)
    g_toks, g_len = _run(params, emb, mask, 1)
    # num_beams=1 through the beam code path itself
    gc = gen.GenerateConfig(max_new_tokens=T, eos_token_ids=(-1,), num_beams=1)
    b_toks, b_lens = gen.beam_generate_from_embeds(
        params, CFG, emb, mask, gen_cfg=gc, max_cache_len=emb.shape[1] + T,
        use_flash=False, policy=FP32_POLICY)
    assert np.array_equal(np.asarray(b_toks)[0], g_toks)
    assert int(np.asarray(b_lens)[0]) == g_len == T


def test_beam_logprob_no_worse_than_greedy():
    params, ids, emb, mask = _setup(1)
    g_toks, g_len = _run(params, emb, mask, 1)
    b_toks, b_len = _run(params, emb, mask, 4)
    assert b_len == g_len == T  # no eos configured
    g_lp = _seq_logprob(params, ids, g_toks, g_len)
    b_lp = _seq_logprob(params, ids, b_toks, b_len)
    assert b_lp >= g_lp - 1e-4, (b_lp, g_lp)


def test_beam_eos_and_penalty():
    params, ids, emb, mask = _setup(2)
    g_toks, _ = _run(params, emb, mask, 1)
    eos = (int(g_toks[2]),)  # a token the model actually wants to emit
    b_toks, b_len = _run(params, emb, mask, 4, eos=eos)
    assert b_len <= T
    if b_len < T:  # pad after retirement
        assert (b_toks[b_len:] == 2).all()
    # repetition-penalty beams: same loop compiles and returns a full row
    p_toks, p_len = _run(params, emb, mask, 4, penalty=1.5)
    assert p_len == T and p_toks.shape == (T,)
    # the penalty must actually bite: no immediate self-repeat runs of 3
    assert not any(p_toks[i] == p_toks[i + 1] == p_toks[i + 2]
                   for i in range(T - 2))
