"""Autoregressive generation, fully on-device.

Replaces HF ``model.generate`` as used by the reference
(modeling_internvl_chat.py:1111-1120: inputs_embeds + KV cache + greedy +
repetition_penalty + eos stop). TPU-native: the entire decode loop is a single
``lax.while_loop`` inside one jit — zero per-step host round trips, static
shapes via prompt-length bucketing.

HF-semantics notes preserved:
  - generate() was called with inputs_embeds only, so the repetition penalty
    sees generated tokens only (HF builds an empty input_ids in that case).
  - penalty rule: score<0 ? score*p : score/p  (HF RepetitionPenaltyLogitsProcessor)
  - stop on any of the template's eos ids; finished rows emit pad.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from callireader_tpu.core.config import LLMConfig
from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.models import internlm2

# 3584 exists for the flagship OCR shape: a full 11-tile page + ~110 chars x 3
# pseudo tokens lands at ~3.2k ids, which otherwise pads 28% into 4096 (prefill
# FLOPs + decode-step KV reads both scale with the bucket).
PROMPT_BUCKETS = (128, 256, 512, 1024, 2048, 3072, 3584, 4096, 6144, 8192)


def bucket_length(n: int, buckets: Sequence[int] = PROMPT_BUCKETS) -> int:
    for b in buckets:
        if b >= n:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 1024
    eos_token_ids: Tuple[int, ...] = (92542,)
    pad_token_id: int = 2
    repetition_penalty: float = 1.0
    do_sample: bool = False
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    # >1: beam search (beam_generate_from_embeds), single prompt only — the
    # reference inherits num_beams from HF generate but always sets 1
    # (inference.py:92-96, evaluate.py:416-420)
    num_beams: int = 1


def _apply_repetition_penalty(logits: jax.Array, seen: jax.Array, penalty: float) -> jax.Array:
    """logits (B, V) f32; seen (B, V) bool."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(seen, penalized, logits)


def _sample(logits: jax.Array, gen_cfg: GenerateConfig, key: jax.Array) -> jax.Array:
    if not gen_cfg.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.maximum(gen_cfg.temperature, 1e-6)
    if gen_cfg.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -gen_cfg.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if gen_cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < gen_cfg.top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "gen_cfg", "max_cache_len", "use_flash", "policy", "mesh"),
    donate_argnames=(),
)
def generate_from_embeds(
    params,
    cfg: LLMConfig,
    inputs_embeds: jax.Array,  # (B, S, E) — already bucketed/padded on the left
    attention_mask: jax.Array,  # (B, S) 1=valid
    *,
    gen_cfg: GenerateConfig,
    max_cache_len: int,
    rng: Optional[jax.Array] = None,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
    mesh=None,  # tensor>1: head-sharded flash kernels (parallel/tp_attention)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens (B, max_new_tokens) int32 — pad after eos,
    lengths (B,) int32 — generated count incl. eos)."""
    B, S, _ = inputs_embeds.shape
    V = cfg.vocab_size
    T = gen_cfg.max_new_tokens

    last_logits, cache = internlm2.prefill(
        params, cfg,
        inputs_embeds=inputs_embeds,
        attention_mask=attention_mask,
        max_len=max_cache_len,
        policy=policy,
        use_flash=use_flash,
        mesh=mesh,
    )

    # KV validity for decode: prompt slots where mask==1, then growth region.
    kv_valid = jnp.zeros((B, max_cache_len), jnp.int32)
    kv_valid = jax.lax.dynamic_update_slice(kv_valid, attention_mask.astype(jnp.int32), (0, 0))

    eos_ids = jnp.asarray(gen_cfg.eos_token_ids, jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step_fn(state):
        cache, logits, seen, tokens, done, lengths, kv_valid, i, key = state
        logits = _apply_repetition_penalty(logits, seen, gen_cfg.repetition_penalty)
        key, sub = jax.random.split(key)
        next_tok = _sample(logits, gen_cfg, sub)
        next_tok = jnp.where(done, gen_cfg.pad_token_id, next_tok)

        is_eos = jnp.any(next_tok[:, None] == eos_ids[None, :], axis=-1)
        lengths = jnp.where(done, lengths, lengths + 1)
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, i))
        seen = seen.at[jnp.arange(B), next_tok].set(jnp.where(done, seen[jnp.arange(B), next_tok], True))
        new_done = jnp.logical_or(done, is_eos)

        # mark the slot we are about to write as attendable
        slot = jnp.arange(max_cache_len)[None, :]
        kv_valid = jnp.where(slot == cache.length, 1, kv_valid)

        logits, cache = internlm2.decode_step(
            params, cfg,
            input_ids=next_tok[:, None],
            cache=cache,
            kv_valid_mask=kv_valid,
            policy=policy,
            use_flash=use_flash,
            mesh=mesh,
        )
        return cache, logits, seen, tokens, new_done, lengths, kv_valid, i + 1, key

    def cond_fn(state):
        _, _, _, _, done, _, _, i, _ = state
        return jnp.logical_and(i < T, jnp.logical_not(jnp.all(done)))

    init = (
        cache,
        last_logits,
        jnp.zeros((B, V), jnp.bool_),
        jnp.full((B, T), gen_cfg.pad_token_id, jnp.int32),
        jnp.zeros((B,), jnp.bool_),
        jnp.zeros((B,), jnp.int32),
        kv_valid,
        jnp.zeros((), jnp.int32),
        rng,
    )
    state = jax.lax.while_loop(cond_fn, step_fn, init)
    tokens, lengths = state[3], state[5]
    return tokens, lengths


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "gen_cfg", "max_cache_len", "use_flash", "policy", "mesh"),
)
def beam_generate_from_embeds(
    params,
    cfg: LLMConfig,
    inputs_embeds: jax.Array,  # (1, S, E) — beams only ever serve one prompt
    attention_mask: jax.Array,  # (1, S)
    *,
    gen_cfg: GenerateConfig,
    max_cache_len: int,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
    mesh=None,
) -> Tuple[jax.Array, jax.Array]:
    """Beam search over ``gen_cfg.num_beams`` beams, fully on-device.

    Matches HF generate for the knobs the reference exposes (num_beams with
    do_sample=False, length_penalty 1.0: final ranking is sum-logprob /
    length; repetition penalty per beam over its own generated ids). This is
    the fixed-beam-slot variant (the t5x/JAX idiom): a finished beam keeps
    occupying its slot with a frozen score and re-emits pad, so shapes stay
    static inside one lax.while_loop; the loop ends when every slot is
    finished or at max_new_tokens. The prompt prefills ONCE — the KV cache is
    tiled across beams and reordered by beam parent each step with a
    batch-axis gather (k small, the gather is HBM-cheap next to the weight
    reads).

    Returns (tokens (1, T), lengths (1,)) — the best beam under the
    length-normalized score, same contract as generate_from_embeds.
    """
    k = gen_cfg.num_beams
    B, S, _ = inputs_embeds.shape
    assert B == 1, "beam search serves a single prompt (HF parity)"
    T = gen_cfg.max_new_tokens
    V = cfg.vocab_size
    neg_inf = jnp.float32(-1e30)

    last_logits, cache = internlm2.prefill(
        params, cfg, inputs_embeds=inputs_embeds, attention_mask=attention_mask,
        max_len=max_cache_len, policy=policy, use_flash=use_flash, mesh=mesh,
    )
    cache = internlm2.KVCache(
        k=jnp.repeat(cache.k, k, axis=1),
        v=jnp.repeat(cache.v, k, axis=1),
        length=cache.length,
    )
    logits = jnp.repeat(last_logits, k, axis=0)  # (k, V)
    kv_valid = jnp.repeat(
        jax.lax.dynamic_update_slice(
            jnp.zeros((1, max_cache_len), jnp.int32),
            attention_mask.astype(jnp.int32), (0, 0),
        ),
        k, axis=0,
    )
    eos_ids = jnp.asarray(gen_cfg.eos_token_ids, jnp.int32)
    pad_col = jax.nn.one_hot(gen_cfg.pad_token_id, V, dtype=jnp.float32) > 0

    def step_fn(state):
        cache, logits, seen, scores, tokens, done, lengths, kv_valid, i = state
        lp = jax.nn.log_softmax(
            _apply_repetition_penalty(
                logits.astype(jnp.float32), seen, gen_cfg.repetition_penalty
            ),
            axis=-1,
        )
        # live beams fan out over the vocab; a finished beam contributes
        # exactly one candidate — itself extended by pad at frozen score
        cand = jnp.where(
            done[:, None],
            jnp.where(pad_col[None, :], scores[:, None], neg_inf),
            scores[:, None] + lp,
        )
        top_scores, top_idx = jax.lax.top_k(cand.reshape(-1), k)
        parent = (top_idx // V).astype(jnp.int32)
        tok = (top_idx % V).astype(jnp.int32)

        # reorder every per-beam state by parent (incl. the KV cache rows)
        cache = internlm2.KVCache(
            k=jnp.take(cache.k, parent, axis=1),
            v=jnp.take(cache.v, parent, axis=1),
            length=cache.length,
        )
        seen = jnp.take(seen, parent, axis=0)
        tokens = jnp.take(tokens, parent, axis=0)
        done = jnp.take(done, parent, axis=0)
        lengths = jnp.take(lengths, parent, axis=0)
        kv_valid = jnp.take(kv_valid, parent, axis=0)

        is_eos = jnp.any(tok[:, None] == eos_ids[None, :], axis=-1)
        tok = jnp.where(done, gen_cfg.pad_token_id, tok)
        lengths = jnp.where(done, lengths, lengths + 1)
        tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, i))
        rows = jnp.arange(k)
        seen = seen.at[rows, tok].set(jnp.where(done, seen[rows, tok], True))
        new_done = jnp.logical_or(done, is_eos)

        slot = jnp.arange(max_cache_len)[None, :]
        kv_valid = jnp.where(slot == cache.length, 1, kv_valid)
        logits, cache = internlm2.decode_step(
            params, cfg, input_ids=tok[:, None], cache=cache,
            kv_valid_mask=kv_valid, policy=policy, use_flash=use_flash,
            mesh=mesh,
        )
        return cache, logits, seen, top_scores, tokens, new_done, lengths, kv_valid, i + 1

    def cond_fn(state):
        done, i = state[5], state[8]
        return jnp.logical_and(i < T, jnp.logical_not(jnp.all(done)))

    init = (
        cache,
        logits,
        jnp.zeros((k, V), jnp.bool_),
        # only beam 0 is live at step 0 (all beams are the same prompt):
        # -inf twins would otherwise duplicate the top candidate k times
        jnp.concatenate([jnp.zeros((1,), jnp.float32),
                         jnp.full((k - 1,), neg_inf)]),
        jnp.full((k, T), gen_cfg.pad_token_id, jnp.int32),
        jnp.zeros((k,), jnp.bool_),
        jnp.zeros((k,), jnp.int32),
        kv_valid,
        jnp.zeros((), jnp.int32),
    )
    state = jax.lax.while_loop(cond_fn, step_fn, init)
    scores, tokens, lengths = state[3], state[4], state[6]
    # HF final ranking: sum logprob / length**length_penalty, penalty 1.0
    norm = scores / jnp.maximum(lengths.astype(jnp.float32), 1.0)
    best = jnp.argmax(norm)
    return tokens[best][None], lengths[best][None]


def pad_embeds_left(
    embeds_list, pad_embed, bucket: Optional[int] = None
):
    """Host helper: left-pad a list of (S_i, E) numpy arrays to a common
    bucketed length. Returns (embeds (B, S, E), mask (B, S))."""
    import numpy as np

    max_len = max(e.shape[0] for e in embeds_list)
    S = bucket_length(max_len) if bucket is None else bucket
    E = embeds_list[0].shape[-1]
    B = len(embeds_list)
    out = np.tile(np.asarray(pad_embed, dtype=embeds_list[0].dtype)[None, None, :], (B, S, 1))
    mask = np.zeros((B, S), np.int32)
    for i, e in enumerate(embeds_list):
        out[i, S - e.shape[0]:] = e
        mask[i, S - e.shape[0]:] = 1
    return out, mask
