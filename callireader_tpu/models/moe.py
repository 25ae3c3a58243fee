"""Mixtral-style sparse-MoE decoder, TPU-native with expert parallelism.

Parity target: the reference vendors torch modeling files for MoE *training*
(train/xtuner/model/modeling_mixtral.py, modeling_deepseek.py — top-k softmax
routing over SwiGLU experts, load-balancing aux loss) but has no expert
parallelism at all (SURVEY.md §2c). Here experts are a first-class sharded
axis: expert weights carry an "expert" logical axis mapped to the mesh, and
routing is expressed densely (token->expert one-hot matmuls) so GSPMD
partitions expert compute with no host-side dispatch.

The attention stack (GQA + RoPE + RMSNorm) is shared with internlm2.py; only
the MLP is swapped for the routed expert layer.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from callireader_tpu.core.config import LLMConfig
from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.kernels.attention import attention_reference, flash_attention
from callireader_tpu.models import internlm2

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    llm: LLMConfig = dataclasses.field(default_factory=LLMConfig)
    num_experts: int = 8
    num_experts_per_tok: int = 2
    router_aux_loss_coef: float = 0.02


def moe_tiny() -> MoEConfig:
    return MoEConfig(
        llm=LLMConfig(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        ),
        num_experts=4,
        num_experts_per_tok=2,
    )


def init_params(key: jax.Array, cfg: MoEConfig, dtype=jnp.bfloat16) -> Params:
    llm = cfg.llm
    L, E, M, X = llm.num_hidden_layers, llm.hidden_size, llm.intermediate_size, cfg.num_experts
    Hq, Hkv, D = llm.num_attention_heads, llm.num_key_value_heads, llm.head_dim
    V = llm.vocab_size
    ks = jax.random.split(key, 10)
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
            "router": w(ks[5], (L, E, X)),
            "w1": w(ks[6], (L, X, E, M)),  # gate, per expert
            "w3": w(ks[7], (L, X, E, M)),  # up
            "w2": w(ks[8], (L, X, M, E)),  # down
        },
        "norm": jnp.ones((E,), dtype),
        "output": w(ks[9], (V, E)),
    }


def logical_axes(cfg: MoEConfig) -> Params:
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
            "router": ("stack", "embed", None),
            "w1": ("stack", "expert", "embed", "mlp"),
            "w3": ("stack", "expert", "embed", "mlp"),
            "w2": ("stack", "expert", "mlp", "embed"),
        },
        "norm": ("norm",),
        "output": ("vocab", "embed"),
    }


def _moe_mlp(p, x, cfg: MoEConfig, policy: DTypePolicy):
    """Routed SwiGLU experts, dense formulation: every expert processes every
    token, scaled by its (mostly-zero) routing weight. At CalliReader scales
    the MXU prefers this over scatter/gather; an all_to_all token-dispatch
    variant can drop in behind the same params when expert count grows.
    Returns (out, router_probs (T, X))."""
    X, K = cfg.num_experts, cfg.num_experts_per_tok
    B, S, E = x.shape
    h = internlm2.rms_norm(x, p["ffn_norm"], cfg.llm.rms_norm_eps, policy)
    flat = h.reshape(B * S, E)

    logits = (flat @ p["router"].astype(flat.dtype)).astype(jnp.float32)  # (T, X)
    probs = jax.nn.softmax(logits, axis=-1)
    topk_vals, topk_idx = jax.lax.top_k(probs, K)
    topk_vals = topk_vals / jnp.sum(topk_vals, axis=-1, keepdims=True)  # renorm (mixtral)
    # (T, X) weights, zero outside the top-k
    weight = jnp.zeros_like(probs)
    weight = jax.vmap(lambda w, i, v: w.at[i].set(v))(weight, topk_idx, topk_vals)

    gate = jax.nn.silu(jnp.einsum("te,xem->txm", flat, p["w1"].astype(flat.dtype)))
    up = jnp.einsum("te,xem->txm", flat, p["w3"].astype(flat.dtype))
    expert_out = jnp.einsum("txm,xme->txe", gate * up, p["w2"].astype(flat.dtype))
    out = jnp.einsum("txe,tx->te", expert_out, weight.astype(flat.dtype))
    return x + out.reshape(B, S, E), probs


def load_balancing_loss(all_probs: jax.Array, cfg: MoEConfig) -> jax.Array:
    """Switch-style aux loss: E * sum(mean_prob * mean_top1_assignment)."""
    X = cfg.num_experts
    mean_prob = all_probs.mean(axis=0)  # (X,)
    assign = jax.nn.one_hot(jnp.argmax(all_probs, axis=-1), X).mean(axis=0)
    return X * jnp.sum(mean_prob * assign)


def forward(
    params: Params,
    cfg: MoEConfig,
    *,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
    return_aux_loss: bool = False,
) -> jax.Array | Tuple[jax.Array, jax.Array]:
    llm = cfg.llm
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["tok_embeddings"], input_ids, axis=0)
    x = inputs_embeds.astype(policy.compute_dtype)
    B, S, _ = x.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(S)[None, :], (B, S))
    cos, sin = internlm2.rope_cos_sin(positions, internlm2.rope_inv_freq(llm, S))
    if use_flash is None:
        use_flash = jax.devices()[0].platform == "tpu"

    def body(carry, p):
        x = carry
        h = internlm2.rms_norm(x, p["attn_norm"], llm.rms_norm_eps, policy)
        q, k, v = internlm2._qkv(p, h, llm)
        q = internlm2.apply_rope(q, cos, sin)
        k = internlm2.apply_rope(k, cos, sin)
        if use_flash:
            ctx = flash_attention(
                q, k, v, causal=True, q_segment_ids=segment_ids, kv_segment_ids=segment_ids
            )
        else:
            ctx = attention_reference(
                q, k, v, causal=True, q_segment_ids=segment_ids, kv_segment_ids=segment_ids
            )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, -1)
        x = x + ctx @ p["wo"].astype(ctx.dtype)
        x, probs = _moe_mlp(p, x, cfg, policy)
        return x, probs

    x, all_probs = jax.lax.scan(body, x, params["layers"])
    x = internlm2.rms_norm(x, params["norm"], llm.rms_norm_eps, policy)
    logits = (x @ params["output"].T.astype(x.dtype)).astype(policy.logits_dtype)
    if return_aux_loss:
        aux = load_balancing_loss(all_probs.reshape(-1, cfg.num_experts), cfg)
        return logits, cfg.router_aux_loss_coef * aux
    return logits
