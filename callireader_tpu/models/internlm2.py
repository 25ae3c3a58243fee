"""InternLM2-style decoder-only LLM, TPU-native.

Architecture parity with the reference implementation
(/root/reference/InternVL/modeling_internlm2.py):
  - GQA attention with fused-wqkv semantics (:281-430) — stored here as split
    wq/wk/wv (the weight converter de-interleaves the reference layout
    ``(h_kv, groups+2, d)``, :364-373).
  - RoPE, rotate-half convention, theta from config (:147-258). Dynamic-NTK
    rescaling kicks in only beyond ``max_position_embeddings`` (:216-233).
  - SwiGLU MLP w1/w3/w2 (:250-264), RMSNorm fp32 (:135-144), untied lm head.

TPU-native design choices (not in the reference):
  - Layers are scan-stacked: params carry a leading ``[num_layers]`` axis and
    the forward uses ``jax.lax.scan`` — O(1) compile time in depth.
  - KV cache is a preallocated static-shape buffer updated with
    ``dynamic_update_slice`` inside jit; HF's growing-tensor cache would
    recompile every step under XLA.
  - Three entry points with distinct static structure so XLA compiles each
    once: ``forward`` (training/no-cache), ``prefill`` (offset-0 cache fill,
    Pallas flash kernel), ``decode_step`` (single token, traced offset).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from callireader_tpu.core.config import LLMConfig
from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.kernels.attention import attention_reference, flash_attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init / sharding annotations
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: LLMConfig, dtype=jnp.bfloat16) -> Params:
    """Random-init a parameter pytree (layers stacked on axis 0)."""
    L, E, M = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    V = cfg.vocab_size
    ks = jax.random.split(key, 9)
    init = jax.nn.initializers.normal(0.02)

    def w(k, shape):
        return init(k, shape, jnp.float32).astype(dtype)

    return {
        "tok_embeddings": w(ks[0], (V, E)),
        "layers": {
            "attn_norm": jnp.ones((L, E), dtype),
            "ffn_norm": jnp.ones((L, E), dtype),
            "wq": w(ks[1], (L, E, Hq * D)),
            "wk": w(ks[2], (L, E, Hkv * D)),
            "wv": w(ks[3], (L, E, Hkv * D)),
            "wo": w(ks[4], (L, Hq * D, E)),
            "w1": w(ks[5], (L, E, M)),
            "w3": w(ks[6], (L, E, M)),
            "w2": w(ks[7], (L, M, E)),
        },
        "norm": jnp.ones((E,), dtype),
        "output": w(ks[8], (V, E)),  # untied lm head
    }


def logical_axes(cfg: LLMConfig) -> Params:
    """Logical sharding annotations, same tree structure as params."""
    del cfg
    return {
        "tok_embeddings": ("vocab", "embed"),
        "layers": {
            "attn_norm": ("stack", "norm"),
            "ffn_norm": ("stack", "norm"),
            "wq": ("stack", "embed", "qkv"),
            "wk": ("stack", "embed", "qkv"),
            "wv": ("stack", "embed", "qkv"),
            "wo": ("stack", "qkv", "embed"),
            "w1": ("stack", "embed", "mlp"),
            "w3": ("stack", "embed", "mlp"),
            "w2": ("stack", "mlp", "embed"),
        },
        "norm": ("norm",),
        "output": ("vocab", "embed"),
    }


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float, policy: DTypePolicy) -> jax.Array:
    xf = x.astype(policy.norm_dtype)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y.astype(x.dtype) * weight.astype(x.dtype)).astype(policy.compute_dtype)


def rope_inv_freq(cfg: LLMConfig, kv_seq_len: int) -> jnp.ndarray:
    """Inverse frequencies; dynamic-NTK base rescale past the training window
    (modeling_internlm2.py:216-233). ``kv_seq_len`` is static."""
    base = cfg.rope_theta
    if cfg.rope_scaling_type == "dynamic" and kv_seq_len > cfg.max_position_embeddings:
        f = cfg.rope_scaling_factor
        base = base * (
            (f * kv_seq_len / cfg.max_position_embeddings) - (f - 1)
        ) ** (cfg.head_dim / (cfg.head_dim - 2))
    return 1.0 / (base ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim))


def rope_cos_sin(positions: jax.Array, inv_freq: jnp.ndarray) -> Tuple[jax.Array, jax.Array]:
    """positions (B, S) int -> cos/sin (B, S, head_dim), rotate-half layout."""
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (B,S,D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def cos_sin_for(cfg: LLMConfig, positions: jax.Array, kv_seq_len: int):
    """RoPE tables honoring the configured scaling: "linear" divides positions
    by the factor (sft.py:161-184 _prepare_for_long_context_training);
    "dynamic" rescales the base past the window (rope_inv_freq).

    ``kv_seq_len`` is the static upper bound (cache capacity). The dynamic-NTK
    rescale itself is gated on the RUNTIME sequence length (max position + 1,
    traced), matching the reference's recompute-on-growth semantics
    (modeling_internlm2.py:216-233) — a cache allocated beyond
    max_position_embeddings must not change frequencies for short sequences."""
    pos = positions.astype(jnp.float32)
    if cfg.rope_scaling_type == "linear":
        pos = pos / cfg.rope_scaling_factor
    if cfg.rope_scaling_type == "dynamic" and kv_seq_len > cfg.max_position_embeddings:
        f = cfg.rope_scaling_factor
        mpe = float(cfg.max_position_embeddings)
        seq = jnp.max(positions).astype(jnp.float32) + 1.0
        base = jnp.where(
            seq > mpe,
            cfg.rope_theta
            * ((f * seq / mpe) - (f - 1)) ** (cfg.head_dim / (cfg.head_dim - 2)),
            cfg.rope_theta,
        )
        inv_freq = 1.0 / (
            base ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32) / cfg.head_dim)
        )
        return rope_cos_sin(pos, inv_freq)
    return rope_cos_sin(pos, rope_inv_freq(cfg, kv_seq_len))


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x (B, H, S, D); cos/sin (B, S, D). rotate_half convention."""
    cos = cos[:, None].astype(jnp.float32)
    sin = sin[:, None].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos + rotated * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class KVCache:
    k: jax.Array  # (L, B, Hkv, max_len, D)
    v: jax.Array
    length: jax.Array  # () int32 — number of valid positions

    @classmethod
    def create(cls, cfg: LLMConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32))

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


jax.tree_util.register_dataclass(KVCache, data_fields=["k", "v", "length"], meta_fields=[])


# ---------------------------------------------------------------------------
# core layer stack
# ---------------------------------------------------------------------------


import os as _os

# int8 decode-matmul kernel dispatch: None = auto (TPU, few rows), "0"/"1"
# force off/on (tests run it in interpret mode on CPU via "interpret")
_INT8_KERNEL_MAX_ROWS = 32


def _int8_kernel_wanted(rows: int) -> Optional[str]:
    """'' = pallas on device, 'interpret' = pallas interpret, None = XLA.

    The env var is read per call (dispatch happens at trace time, off the hot
    path) so flipping CALLIREADER_INT8_KERNEL after import still takes effect.
    """
    mode = _os.environ.get("CALLIREADER_INT8_KERNEL")
    if mode == "0":
        return None
    if mode == "interpret":
        return "interpret"
    if mode == "1" or (
        rows <= _INT8_KERNEL_MAX_ROWS
        and jax.default_backend() == "tpu"
    ):
        return ""
    return None


def _int8_mm(h, q, scale, *, out_last: int):
    """Dispatch h @ dequant(q, scale): the Pallas fused-dequant kernel when
    the matmul is HBM-bound (decode: few rows) so weight bytes are read as
    int8, else the XLA form. ``scale`` is per-out-channel, any broadcastable
    shape."""
    rows = 1
    for d in h.shape[:-1]:
        rows *= d
    mode = _int8_kernel_wanted(rows)
    if mode is not None and q.shape[-1] % 128 == 0 and q.shape[0] % 128 == 0:
        from callireader_tpu.kernels.int8_matmul import int8_matmul

        y = int8_matmul(h.reshape(rows, h.shape[-1]), q,
                        scale.reshape(out_last), interpret=(mode == "interpret"))
        return y.reshape(*h.shape[:-1], out_last)
    return (h @ q.astype(h.dtype)) * scale.reshape(out_last).astype(h.dtype)


def _int8_mm_stacked(h, q, scale, layer):
    """h @ dequant(q[layer], scale[layer]) with q the FULL (L, K, N) stacked
    int8 array: inside the decode layer-scan the per-iteration weight slice
    feeding a pallas custom call cannot fuse, so XLA copies each layer's
    weights HBM->HBM every token (~3x the int8 bytes). The stacked kernel
    addresses q in place via scalar-prefetch layer indexing instead."""
    L, K, N = q.shape
    rows = 1
    for d in h.shape[:-1]:
        rows *= d
    mode = _int8_kernel_wanted(rows)
    if mode is not None and N % 128 == 0 and K % 128 == 0:
        from callireader_tpu.kernels.int8_matmul import int8_matmul_stacked

        y = int8_matmul_stacked(
            h.reshape(rows, K), q, scale.reshape(L, N), layer,
            interpret=(mode == "interpret"),
        )
        return y.reshape(*h.shape[:-1], N)
    ql = jax.lax.dynamic_index_in_dim(q, layer, 0, keepdims=False)
    sl = jax.lax.dynamic_index_in_dim(scale.reshape(L, N), layer, 0,
                                      keepdims=False)
    return (h @ ql.astype(h.dtype)) * sl.astype(h.dtype)


def _split_stacked_int8(layers):
    """Partition the scan-stacked layer pytree: int8 weight leaves (``*_q``
    and their matching ``*_scale``) are hoisted OUT of the scanned operand
    and returned separately so ``lax.scan`` never materializes a
    per-iteration HBM->HBM copy of them. The scan body re-injects them whole
    (full (L, K, N) arrays) together with a ``_layer_idx`` so _proj addresses
    the resting weights in place via the scalar-prefetch stacked kernel
    (kernels/int8_matmul.py::int8_matmul_stacked). CALLIREADER_INT8_STACKED=0
    disables hoisting (A/B + fallback knob): the scan then slices per-layer
    weights and _proj uses the 2-D kernel."""
    if _os.environ.get("CALLIREADER_INT8_STACKED") == "0":
        return layers, {}
    stacked = {
        k: v for k, v in layers.items()
        if k.endswith("_q")
        or (k.endswith("_scale") and k[: -len("_scale")] + "_q" in layers)
    }
    if not stacked:
        return layers, stacked
    return {k: v for k, v in layers.items() if k not in stacked}, stacked


def _proj(p, h, name: str):
    """Linear with optional LoRA adapter leaves ``{name}_lora_a/b`` (+scale,
    train/lora.py) and optional int8 weight-only quantization ``{name}_q`` +
    ``{name}_scale`` (runtime/quantize.py): y = (h @ q) * scale, via the
    fused-dequant Pallas kernel on the decode path. A 3-D ``{name}_q`` plus
    a ``_layer_idx`` entry (decode layer-scan, see ``_split_stacked_int8``)
    selects the stacked-weight kernel."""
    q = p.get(f"{name}_q")
    if q is not None:
        li = p.get("_layer_idx")
        if q.ndim == 3 and li is not None:
            y = _int8_mm_stacked(h, q, p[f"{name}_scale"], li)
        else:
            y = _int8_mm(h, q, p[f"{name}_scale"], out_last=q.shape[-1])
    else:
        y = h @ p[name].astype(h.dtype)
    a = p.get(f"{name}_lora_a")
    if a is not None:
        b = p[f"{name}_lora_b"]
        scale = p["lora_scale"].astype(h.dtype)
        y = y + ((h @ a.astype(h.dtype)) @ b.astype(h.dtype)) * scale
    return y


def _qkv(p, h, cfg: LLMConfig):
    B, S, _ = h.shape
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    if "wqkv_q" in p:
        # fused int8 QKV (runtime/quantize.fuse_llm_int8): one kernel launch,
        # column-split equals the three separate matmuls exactly
        y = _proj(p, h, "wqkv")
        q, k, v = jnp.split(y, [Hq * D, (Hq + Hkv) * D], axis=-1)
    else:
        q = _proj(p, h, "wq")
        k = _proj(p, h, "wk")
        v = _proj(p, h, "wv")
    q = q.reshape(B, S, Hq, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
    return q, k, v


def _mlp(p, x, cfg: LLMConfig, policy: DTypePolicy):
    h = rms_norm(x, p["ffn_norm"], cfg.rms_norm_eps, policy)
    if "w13_q" in p:
        y = _proj(p, h, "w13")
        g, up = jnp.split(y, 2, axis=-1)
        gate = jax.nn.silu(g)
    else:
        gate = jax.nn.silu(_proj(p, h, "w1"))
        up = _proj(p, h, "w3")
    return x + _proj(p, gate * up, "w2")


def _run_layers(params, cfg, x, cos, sin, attn_fn, policy, remat: bool = False):
    """Scan over stacked layers. ``attn_fn(q, k, v, layer_idx) -> (ctx, new_ck, new_cv)``."""
    layers, stacked = _split_stacked_int8(params["layers"])

    def body(carry, scanned):
        x, idx = carry
        p = dict(scanned, **stacked, _layer_idx=idx) if stacked else scanned
        h = rms_norm(x, p["attn_norm"], cfg.rms_norm_eps, policy)
        q, k, v = _qkv(p, h, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ctx, new_ck, new_cv = attn_fn(q, k, v, idx)
        B, S = x.shape[:2]
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, -1)
        x = x + _proj(p, ctx, "wo")
        x = _mlp(p, x, cfg, policy)
        return (x, idx + 1), (new_ck, new_cv)

    if remat:
        body = jax.checkpoint(body)
    (x, _), kv = jax.lax.scan(body, (x, jnp.zeros((), jnp.int32)), layers)
    return x, kv


def embed_tokens(params, input_ids, dtype=jnp.bfloat16):
    """Token embedding lookup, int8-aware (rows dequantized post-gather)."""
    if "tok_embeddings_q" in params:
        rows = jnp.take(params["tok_embeddings_q"], input_ids, axis=0).astype(dtype)
        scale = jnp.take(params["tok_embeddings_scale"], input_ids, axis=0).astype(dtype)
        return rows * scale
    return jnp.take(params["tok_embeddings"], input_ids, axis=0).astype(dtype)


def _embed(params, input_ids, inputs_embeds, policy):
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, input_ids, policy.compute_dtype)
    return inputs_embeds.astype(policy.compute_dtype)


def _logits(params, x, policy, cfg: Optional[LLMConfig] = None):
    if "output_q" in params:
        q = params["output_q"]  # (V, E) torch lm-head layout
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        mode = _int8_kernel_wanted(rows)
        if mode is not None and q.shape[0] % 128 == 0 and q.shape[1] % 128 == 0:
            # fused-dequant head matmul: the V x E int8 (~380 MB on the 8B)
            # is the single biggest per-decode-step weight read
            from callireader_tpu.kernels.int8_matmul import int8_matmul_nt

            y = int8_matmul_nt(
                x.reshape(rows, x.shape[-1]), q,
                params["output_scale"][:, 0],
                interpret=(mode == "interpret"),
            ).reshape(*x.shape[:-1], q.shape[0]).astype(policy.logits_dtype)
        else:
            y = x @ q.T.astype(x.dtype)
            y = (y * params["output_scale"][:, 0].astype(x.dtype)).astype(
                policy.logits_dtype)
    else:
        y = (x @ params["output"].T.astype(x.dtype)).astype(policy.logits_dtype)
    if cfg is not None and cfg.real_vocab_size is not None and cfg.real_vocab_size < y.shape[-1]:
        # padded vocab rows (pad_vocab) must never win argmax/sampling
        pad_mask = jnp.arange(y.shape[-1]) >= cfg.real_vocab_size
        y = jnp.where(pad_mask, jnp.finfo(y.dtype).min, y)
    return y


def pad_vocab(params: Params, cfg: LLMConfig, multiple: int) -> Tuple[Params, LLMConfig]:
    """Zero-pad the vocab tables to a multiple of ``multiple`` so the "vocab"
    logical axis shards evenly over the tensor mesh axis (92553 is odd; the
    replication fallback costs ~1.5 GB/chip in bf16 on the 8B). The returned
    config records ``real_vocab_size`` so _logits masks the pad rows."""
    if cfg.vocab_size % multiple == 0:
        return params, cfg
    V = cfg.vocab_size
    Vp = -(-V // multiple) * multiple
    out = dict(params)
    for name in ("tok_embeddings", "output", "tok_embeddings_q", "output_q",
                 "tok_embeddings_scale", "output_scale"):
        if name in out:
            w = out[name]
            out[name] = jnp.pad(w, ((0, Vp - V),) + ((0, 0),) * (w.ndim - 1))
    return out, dataclasses.replace(
        cfg, vocab_size=Vp,
        real_vocab_size=cfg.real_vocab_size if cfg.real_vocab_size is not None else V,
    )


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    cfg: LLMConfig,
    *,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
    interpret: bool = False,
    remat: bool = False,
    return_hidden: bool = False,
    attn_override=None,
) -> jax.Array:
    """Full-sequence forward (training / eval). Returns logits (B,S,V) fp32,
    or final hidden states if ``return_hidden``.

    ``attn_override(q, k, v) -> ctx`` replaces the attention primitive — used
    by the sequence-parallel trainer to drop in the Ulysses shard_map kernel
    (parallel/ulysses.py) while everything else stays identical."""
    x = _embed(params, input_ids, inputs_embeds, policy)
    B, S, _ = x.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    cos, sin = cos_sin_for(cfg, positions, S)
    if use_flash is None:
        use_flash = jax.devices()[0].platform == "tpu"

    def attn_fn(q, k, v, idx):
        del idx
        if attn_override is not None:
            ctx = attn_override(q, k, v)
        elif use_flash:
            # differentiable variant (custom VJP, kernels/attention_bwd.py) —
            # training at 8k context cannot materialize S^2 attention
            from callireader_tpu.kernels.attention_bwd import flash_attention_trainable

            ctx = flash_attention_trainable(
                q, k, v, segment_ids, segment_ids, True, None, 512, 512, interpret
            )
        else:
            ctx = attention_reference(
                q, k, v, causal=True,
                q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            )
        return ctx, jnp.zeros((), x.dtype), jnp.zeros((), x.dtype)

    x, _ = _run_layers(params, cfg, x, cos, sin, attn_fn, policy, remat=remat)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps, policy)
    if return_hidden:
        return x
    return _logits(params, x, policy, cfg)


def prefill(
    params: Params,
    cfg: LLMConfig,
    *,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,  # (B, S) 1=valid (left-padded)
    max_len: int = 2048,
    cache_dtype=jnp.bfloat16,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
    interpret: bool = False,
    mesh=None,
) -> Tuple[jax.Array, KVCache]:
    """Process the prompt, build a fresh KV cache of capacity ``max_len``.

    Returns (last_logits (B, V), cache). Left-padding via ``attention_mask``:
    padded positions get segment id -1 (never attended) and position 0.
    ``mesh`` with tensor > 1 routes the flash kernel through the
    head-sharded shard_map wrapper (parallel/tp_attention.py).
    """
    x = _embed(params, input_ids, inputs_embeds, policy)
    B, S, _ = x.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    attention_mask = attention_mask.astype(jnp.int32)

    # positions count valid tokens only (HF generate semantics with padding)
    positions = jnp.clip(jnp.cumsum(attention_mask, axis=1) - 1, 0, None)
    segment_ids = jnp.where(attention_mask > 0, 0, -1).astype(jnp.int32)

    cos, sin = cos_sin_for(cfg, positions, max(S, 1))
    if use_flash is None:
        use_flash = jax.devices()[0].platform == "tpu"

    cache = KVCache.create(cfg, B, max_len, cache_dtype)

    def attn_fn(q, k, v, idx):
        if use_flash:
            from callireader_tpu.parallel.tp_attention import (
                flash_attention_tp, tp_active,
            )

            if tp_active(mesh):
                ctx = flash_attention_tp(
                    q, k, v, mesh, causal=True,
                    q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
                    interpret=interpret,
                )
            else:
                ctx = flash_attention(
                    q, k, v, causal=True,
                    q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
                    interpret=interpret,
                )
        else:
            ctx = attention_reference(
                q, k, v, causal=True,
                q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            )
        pad = max_len - S
        ck = jnp.pad(k.astype(cache_dtype), ((0, 0), (0, 0), (0, pad), (0, 0)))
        cv = jnp.pad(v.astype(cache_dtype), ((0, 0), (0, 0), (0, pad), (0, 0)))
        return ctx, ck, cv

    x, (ck, cv) = _run_layers(params, cfg, x, cos, sin, attn_fn, policy)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps, policy)
    last_logits = _logits(params, x[:, -1:, :], policy, cfg)[:, 0]

    cache = KVCache(k=ck, v=cv, length=jnp.asarray(S, jnp.int32))
    return last_logits, cache


def prefill_with_prefix(
    params: Params,
    cfg: LLMConfig,
    *,
    inputs_embeds: jax.Array,     # (B, S, E) suffix rows, left-padded
    attention_mask: jax.Array,    # (B, S) 1=valid
    prefix_k: jax.Array,          # (L, Hkv, P, D) cached prefix KV (RoPE'd at positions 0..P-1)
    prefix_v: jax.Array,
    max_len: int = 2048,
    cache_dtype=jnp.bfloat16,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
    interpret: bool = False,
    mesh=None,
) -> Tuple[jax.Array, KVCache]:
    """Chunked prefill over an already-computed prefix KV (the serving prefix
    cache): only the suffix tokens run through the layers; their queries attend
    the prefix in full and each other causally. Skips the prefix's share of the
    prompt FLOPs entirely — the HF reference re-prefills the whole transcript
    every chat turn (modeling_internvl_chat.py:290-344 rebuilds and re-runs the
    full prompt per call).

    Returns (last_logits (B, V), cache) whose per-row region is laid out
    ``[pad | prefix | suffix]`` occupying ``[padlen, P + S)`` — exactly the
    contiguous left-padded region the multislot decode expects, so downstream
    bookkeeping (starts/lengths) is unchanged.
    """
    x = inputs_embeds.astype(policy.compute_dtype)
    B, S, _ = x.shape
    P = prefix_k.shape[2]
    attention_mask = attention_mask.astype(jnp.int32)

    # suffix positions continue the prefix's 0..P-1 (valid tokens only)
    positions = P + jnp.clip(jnp.cumsum(attention_mask, axis=1) - 1, 0, None)
    q_seg = jnp.where(attention_mask > 0, 0, -1).astype(jnp.int32)
    kv_seg = jnp.concatenate([jnp.zeros((B, P), jnp.int32), q_seg], axis=1)

    cos, sin = cos_sin_for(cfg, positions, P + S)
    if use_flash is None:
        use_flash = jax.devices()[0].platform == "tpu"

    def attn_fn(q, k, v, idx):
        pk = jax.lax.dynamic_index_in_dim(prefix_k, idx, 0, keepdims=False)
        pv = jax.lax.dynamic_index_in_dim(prefix_v, idx, 0, keepdims=False)
        kf = jnp.concatenate(
            [jnp.broadcast_to(pk[None].astype(k.dtype), (B,) + pk.shape), k], axis=2
        )
        vf = jnp.concatenate(
            [jnp.broadcast_to(pv[None].astype(v.dtype), (B,) + pv.shape), v], axis=2
        )
        if use_flash:
            from callireader_tpu.parallel.tp_attention import (
                flash_attention_tp, tp_active,
            )

            if tp_active(mesh):
                ctx = flash_attention_tp(
                    q, kf, vf, mesh, causal=True,
                    q_segment_ids=q_seg, kv_segment_ids=kv_seg,
                    interpret=interpret, q_offset=P,
                )
            else:
                ctx = flash_attention(
                    q, kf, vf, causal=True,
                    q_segment_ids=q_seg, kv_segment_ids=kv_seg,
                    interpret=interpret, q_offset=P,
                )
        else:
            ctx = attention_reference(
                q, kf, vf, causal=True,
                q_segment_ids=q_seg, kv_segment_ids=kv_seg, q_offset=P,
            )
        return ctx, kf.astype(cache_dtype), vf.astype(cache_dtype)

    x, (ck, cv) = _run_layers(params, cfg, x, cos, sin, attn_fn, policy)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps, policy)
    last_logits = _logits(params, x[:, -1:, :], policy, cfg)[:, 0]

    # ck/cv are (L, B, Hkv, P+S, D) laid out [prefix | pad | suffix] per row
    # (suffix rows were left-padded). Rearrange each row to the contiguous
    # [pad | prefix | suffix] layout via a per-row gather: output column j
    # reads prefix[j - padlen] inside [padlen, padlen+P) and the original
    # column j beyond (suffix token t sits at P + padlen + t both before and
    # after). Columns below padlen are dead (outside [start, length)).
    padlen = jnp.sum(attention_mask == 0, axis=1)  # (B,)
    j = jnp.arange(P + S)[None]  # (1, P+S)
    gidx = jnp.where(
        j < padlen[:, None] + P,
        jnp.clip(j - padlen[:, None], 0, P - 1),
        j,
    )  # (B, P+S)

    def gather_row(c, gi):  # c (L, Hkv, P+S, D), gi (P+S,)
        return jnp.take(c, gi, axis=2)

    ck = jax.vmap(gather_row, in_axes=(1, 0), out_axes=1)(ck, gidx)
    cv = jax.vmap(gather_row, in_axes=(1, 0), out_axes=1)(cv, gidx)
    pad = max_len - (P + S)
    ck = jnp.pad(ck, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    cv = jnp.pad(cv, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    return last_logits, KVCache(k=ck, v=cv, length=jnp.asarray(P + S, jnp.int32))


def decode_step_multislot(
    params: Params,
    cfg: LLMConfig,
    *,
    input_ids: jax.Array,  # (B, 1) — one in-flight token per slot
    cache_k: jax.Array,  # (L, B, Hkv, max_len, D)
    cache_v: jax.Array,
    lengths: jax.Array,  # (B,) valid tokens per slot (write position)
    active: jax.Array,  # (B,) bool — inactive slots produce garbage, ignored
    starts: Optional[jax.Array] = None,  # (B,) first attendable cache position
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
    mesh=None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Continuous-batching decode: every slot advances one token at its own
    position. Returns (logits (B, V), cache_k, cache_v). The caller updates
    lengths for active slots. Per-slot K/V writes are batched scatters."""
    x = _embed(params, input_ids, None, policy)
    B, S, _ = x.shape
    max_len = cache_k.shape[3]
    positions = (lengths if starts is None else lengths - starts)[:, None]  # (B, 1)
    cos, sin = cos_sin_for(cfg, positions, max_len)

    if use_flash is None:
        use_flash = jax.devices()[0].platform == "tpu"
    slot_pos = jnp.arange(max_len)[None, :]
    valid = slot_pos <= lengths[:, None]
    if starts is not None:
        # left-padded prompts: positions before `starts` hold masked pad k/v
        valid = jnp.logical_and(valid, slot_pos >= starts[:, None])
    kv_valid = valid.astype(jnp.int32)
    kv_seg = jnp.where(valid, 0, -9).astype(jnp.int32)
    q_seg = jnp.zeros((B, S), jnp.int32)
    batch_idx = jnp.arange(B)

    layers, stacked = _split_stacked_int8(params["layers"])

    def body(carry, p):
        x, ck, cv, idx = carry
        if stacked:
            p = dict(p, **stacked, _layer_idx=idx)
        h = rms_norm(x, p["attn_norm"], cfg.rms_norm_eps, policy)
        q, k, v = _qkv(p, h, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        # scatter new token k/v at (idx, b, :, lengths[b], :) for every slot
        ck = ck.at[idx, batch_idx, :, lengths, :].set(k[:, :, 0, :].astype(ck.dtype))
        cv = cv.at[idx, batch_idx, :, lengths, :].set(v[:, :, 0, :].astype(cv.dtype))
        if use_flash:
            from callireader_tpu.kernels.decode_attention import flash_decode
            from callireader_tpu.parallel.tp_attention import flash_decode_tp, tp_active

            if tp_active(mesh):
                ctx = flash_decode_tp(q, ck, cv, idx, kv_valid, mesh, interpret=interpret)
            else:
                ctx = flash_decode(q, ck, cv, idx, kv_valid, interpret=interpret)
        else:
            layer_k = jax.lax.dynamic_index_in_dim(ck, idx, 0, keepdims=False)
            layer_v = jax.lax.dynamic_index_in_dim(cv, idx, 0, keepdims=False)
            ctx = attention_reference(
                q, layer_k.astype(q.dtype), layer_v.astype(q.dtype),
                causal=False, q_segment_ids=q_seg, kv_segment_ids=kv_seg,
            )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, -1)
        x = x + _proj(p, ctx, "wo")
        x = _mlp(p, x, cfg, policy)
        return (x, ck, cv, idx + 1), None

    (x, ck, cv, _), _ = jax.lax.scan(
        body, (x, cache_k, cache_v, jnp.zeros((), jnp.int32)), layers
    )
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps, policy)
    logits = _logits(params, x, policy, cfg)[:, 0]
    del active  # masking is the caller's concern; kept in the API for clarity
    return logits, ck, cv


def decode_step(
    params: Params,
    cfg: LLMConfig,
    *,
    input_ids: Optional[jax.Array] = None,  # (B, 1)
    inputs_embeds: Optional[jax.Array] = None,  # (B, 1, E)
    cache: KVCache,
    kv_valid_mask: Optional[jax.Array] = None,  # (B, max_len) 1=attendable
    positions: Optional[jax.Array] = None,  # (B, 1)
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
    mesh=None,
    interpret: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """One autoregressive step. Returns (logits (B, V), updated cache)."""
    if use_flash is None:
        use_flash = jax.devices()[0].platform == "tpu"
    x = _embed(params, input_ids, inputs_embeds, policy)
    B, S, _ = x.shape
    max_len = cache.max_len
    if positions is None:
        positions = jnp.broadcast_to(cache.length[None, None], (B, S))
    cos, sin = cos_sin_for(cfg, positions, max_len)

    slot = jnp.arange(max_len)[None, :]
    if kv_valid_mask is None:
        kv_valid_mask = (slot <= cache.length).astype(jnp.int32)
        kv_valid_mask = jnp.broadcast_to(kv_valid_mask, (B, max_len))
    else:
        # the freshly written position must be attendable
        kv_valid_mask = jnp.where(slot == cache.length, 1, kv_valid_mask)
    kv_seg = jnp.where(kv_valid_mask > 0, 0, -9).astype(jnp.int32)
    q_seg = jnp.zeros((B, S), jnp.int32)

    # Cache is threaded through the layer scan as a carry and updated with a
    # single-token dynamic_update_slice — XLA aliases loop carries, so each
    # step writes O(B*Hkv*D) bytes instead of rebuilding the (L, ..., max_len)
    # buffers (which costs ~full-cache HBM traffic per token).
    layers, stacked = _split_stacked_int8(params["layers"])

    def body(carry, p):
        x, ck, cv, idx = carry
        if stacked:
            p = dict(p, **stacked, _layer_idx=idx)
        h = rms_norm(x, p["attn_norm"], cfg.rms_norm_eps, policy)
        q, k, v = _qkv(p, h, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ck = jax.lax.dynamic_update_slice(
            ck, k[None].astype(ck.dtype), (idx, 0, 0, cache.length, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, v[None].astype(cv.dtype), (idx, 0, 0, cache.length, 0)
        )
        if use_flash:
            from callireader_tpu.kernels.decode_attention import flash_decode
            from callireader_tpu.parallel.tp_attention import flash_decode_tp, tp_active

            if tp_active(mesh):
                ctx = flash_decode_tp(
                    q, ck, cv, idx, kv_valid_mask, mesh, interpret=interpret
                )
            else:
                ctx = flash_decode(q, ck, cv, idx, kv_valid_mask, interpret=interpret)
        else:
            layer_k = jax.lax.dynamic_index_in_dim(ck, idx, 0, keepdims=False)
            layer_v = jax.lax.dynamic_index_in_dim(cv, idx, 0, keepdims=False)
            ctx = attention_reference(
                q, layer_k.astype(q.dtype), layer_v.astype(q.dtype),
                causal=False,  # masking fully handled by kv_seg validity
                q_segment_ids=q_seg, kv_segment_ids=kv_seg,
            )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, -1)
        x = x + _proj(p, ctx, "wo")
        x = _mlp(p, x, cfg, policy)
        return (x, ck, cv, idx + 1), None

    (x, ck, cv, _), _ = jax.lax.scan(
        body, (x, cache.k, cache.v, jnp.zeros((), jnp.int32)), layers
    )
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps, policy)
    logits = _logits(params, x, policy, cfg)[:, 0]
    return logits, KVCache(k=ck, v=cv, length=cache.length + 1)


def prepare_long_context(cfg: LLMConfig, max_length: int) -> LLMConfig:
    """Enlarge the usable context with linear RoPE scaling, the
    `_prepare_for_long_context_training` recipe (train/xtuner/model/sft.py:
    161-184, reward.py:186): factor = ceil(max_length / max_position_embeddings),
    applied only when the target exceeds the native window."""
    import dataclasses as _dc
    import math as _math

    if max_length <= cfg.max_position_embeddings:
        return cfg
    factor = float(_math.ceil(max_length / cfg.max_position_embeddings))
    return _dc.replace(
        cfg, rope_scaling_type="linear", rope_scaling_factor=factor,
        max_position_embeddings=max_length,
    )
