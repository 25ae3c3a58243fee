"""Perceiver resampler ("CalliAlign" core).

Parity target: /root/reference/models/perceiver_resampler.py:8-100.
(B, 256, 4096) image-patch features -> (B, 3, 4096) pseudo-text embeddings.

Per layer: cross-attention where 3 learned queries attend over
concat(media, learns) (reference :37), residual; LayerNorm-MLP, residual.
Final LayerNorm. Learned queries are a (num_learns, dim) parameter.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from callireader_tpu.core.config import ResamplerConfig
from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.models.internvit import layer_norm

Params = Dict[str, Any]
LN_EPS = 1e-5  # torch nn.LayerNorm default


def init_params(key: jax.Array, cfg: ResamplerConfig, dtype=jnp.bfloat16) -> Params:
    E = cfg.dim
    inner = cfg.dim_head * cfg.heads
    L = cfg.depth
    ks = jax.random.split(key, 7)
    init = jax.nn.initializers.normal(0.02)

    def w(k, shape):
        return init(k, shape, jnp.float32).astype(dtype)

    out = {} if cfg.out_dim is None else {
        "out_kernel": w(ks[6], (E, cfg.out_dim)),
        "out_bias": jnp.zeros((cfg.out_dim,), dtype),
    }
    return {
        **out,
        "learns": jax.random.normal(ks[0], (cfg.num_learns, E), jnp.float32).astype(dtype),
        "layers": {
            "norm_media_scale": jnp.ones((L, E), dtype),
            "norm_media_bias": jnp.zeros((L, E), dtype),
            "norm_learns_scale": jnp.ones((L, E), dtype),
            "norm_learns_bias": jnp.zeros((L, E), dtype),
            "to_q": w(ks[1], (L, E, inner)),
            "to_kv": w(ks[2], (L, E, 2 * inner)),
            "to_out": w(ks[3], (L, inner, E)),
            "ff_norm_scale": jnp.ones((L, E), dtype),
            "ff_norm_bias": jnp.zeros((L, E), dtype),
            "ff1": w(ks[4], (L, E, cfg.ff_mult * E)),
            "ff1_bias": jnp.zeros((L, cfg.ff_mult * E), dtype),
            "ff2": w(ks[5], (L, cfg.ff_mult * E, E)),
            "ff2_bias": jnp.zeros((L, E), dtype),
        },
        "norm_scale": jnp.ones((E,), dtype),
        "norm_bias": jnp.zeros((E,), dtype),
    }


def logical_axes(cfg: ResamplerConfig) -> Params:
    out = {} if cfg.out_dim is None else {
        "out_kernel": ("embed", None), "out_bias": (None,),
    }
    return {
        **out,
        "learns": (None, "embed"),
        "layers": {
            "norm_media_scale": ("stack", "norm"), "norm_media_bias": ("stack", "norm"),
            "norm_learns_scale": ("stack", "norm"), "norm_learns_bias": ("stack", "norm"),
            "to_q": ("stack", "embed", "qkv"),
            "to_kv": ("stack", "embed", "qkv"),
            "to_out": ("stack", "qkv", "embed"),
            "ff_norm_scale": ("stack", "norm"), "ff_norm_bias": ("stack", "norm"),
            "ff1": ("stack", "embed", "mlp"), "ff1_bias": ("stack", "mlp"),
            "ff2": ("stack", "mlp", "embed"), "ff2_bias": ("stack", "norm"),
        },
        "norm_scale": ("norm",), "norm_bias": ("norm",),
    }


LORA_MATS = ("to_q", "to_kv", "to_out", "ff1", "ff2")


def forward(
    params: Params,
    cfg: ResamplerConfig,
    x: jax.Array,  # (B, N, E) media features
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
    lora: Params = None,
    lora_scale: float = 1.0,
) -> jax.Array:
    """-> (B, num_learns, E).

    ``lora``: optional {name_a: (L, in, r), name_b: (L, r, out)} deltas for
    the LORA_MATS matrices, applied functionally (h@A)@B — used by CalliAlign
    training (train/callialign_train.py) so the 1.1 GB full matrices never
    materialize; inference merges the deltas into params once at load."""
    B = x.shape[0]
    H, Dh = cfg.heads, cfg.dim_head
    scale = Dh**-0.5
    x = x.astype(policy.compute_dtype)
    learns = jnp.broadcast_to(params["learns"].astype(x.dtype), (B, cfg.num_learns, cfg.dim))

    def mm(h, p, l, name):
        out = h @ p[name].astype(h.dtype)
        if l is not None:
            d = (h.astype(jnp.float32) @ l[name + "_a"]) @ l[name + "_b"]
            out = out + (lora_scale * d).astype(out.dtype)
        return out

    def body(learns, pl):
        p, l = pl
        xm = layer_norm(x, p["norm_media_scale"], p["norm_media_bias"], LN_EPS, policy)
        ln = layer_norm(learns, p["norm_learns_scale"], p["norm_learns_bias"], LN_EPS, policy)

        q = mm(ln, p, l, "to_q")  # (B, n, inner)
        kv_in = jnp.concatenate([xm, ln], axis=1)  # (B, N+n, E)
        kv = mm(kv_in, p, l, "to_kv")
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(B, t.shape[1], H, Dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        sim = jnp.einsum("bhid,bhjd->bhij", (q * scale).astype(jnp.float32), k.astype(jnp.float32))
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, H * Dh)
        learns = mm(out, p, l, "to_out") + learns

        h = layer_norm(learns, p["ff_norm_scale"], p["ff_norm_bias"], LN_EPS, policy)
        h = mm(h, p, l, "ff1") + p["ff1_bias"].astype(h.dtype)
        h = jax.nn.gelu(h, approximate=False)
        h = mm(h, p, l, "ff2") + p["ff2_bias"].astype(h.dtype)
        return learns + h, None

    learns, _ = jax.lax.scan(body, learns, (params["layers"], lora))
    learns = layer_norm(learns, params["norm_scale"], params["norm_bias"], LN_EPS, policy)
    if cfg.out_dim is not None:
        # compact-tower VQ projection: dim -> the 4096-dim token-table space
        learns = (learns @ params["out_kernel"].astype(learns.dtype)
                  + params["out_bias"].astype(learns.dtype))
    return learns


# ---------------------------------------------------------------------------
# MLP-resampler ablation variants (reference perceiver_resampler.py:102-154;
# not on the main CalliAlign path, kept for checkpoint/ablation parity)
# ---------------------------------------------------------------------------


def init_ff2(key, input_dim: int, output_dim: int, mult: int = 4, dtype=jnp.float32) -> Params:
    """FeedForward_2: LayerNorm -> Linear(in, in*mult) -> GELU -> Linear(in*mult, out)."""
    k1, k2 = jax.random.split(key)
    init = jax.nn.initializers.normal(0.02)
    return {
        "norm_scale": jnp.ones((input_dim,), dtype),
        "norm_bias": jnp.zeros((input_dim,), dtype),
        "w1": init(k1, (input_dim, input_dim * mult), jnp.float32).astype(dtype),
        "b1": jnp.zeros((input_dim * mult,), dtype),
        "w2": init(k2, (input_dim * mult, output_dim), jnp.float32).astype(dtype),
        "b2": jnp.zeros((output_dim,), dtype),
    }


def ff2(params: Params, x: jax.Array, *, policy: DTypePolicy = DEFAULT_POLICY) -> jax.Array:
    h = layer_norm(x, params["norm_scale"], params["norm_bias"], LN_EPS, policy)
    h = h @ params["w1"].astype(h.dtype) + params["b1"].astype(h.dtype)
    h = jax.nn.gelu(h, approximate=False)
    return h @ params["w2"].astype(h.dtype) + params["b2"].astype(h.dtype)


def init_mlp_resampler(key, num_tokens: int = 256, mult: int = 4, dtype=jnp.float32) -> Params:
    """MLP variant: squeezes the 256 patch tokens down to 3 along the token
    axis (reference :102-115 permutes, runs two FeedForward_2 over tokens)."""
    k1, k2 = jax.random.split(key)
    return {
        "ff1": init_ff2(k1, num_tokens, num_tokens, mult, dtype),
        "ff2": init_ff2(k2, num_tokens, 3, mult, dtype),
    }


def mlp_resampler(params: Params, x: jax.Array, *, policy: DTypePolicy = DEFAULT_POLICY) -> jax.Array:
    """(B, N, E) -> (B, 3, E): token-axis MLP."""
    h = x.transpose(0, 2, 1)  # (B, E, N)
    h = ff2(params["ff1"], h, policy=policy)
    h = ff2(params["ff2"], h, policy=policy)
    return h.transpose(0, 2, 1)


def init_mlp_6763(key, input_dim: int, output_dim: int, mult: int = 2, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "ff1": init_ff2(k1, input_dim, output_dim, mult, dtype),
        "ff2": init_ff2(k2, output_dim, output_dim, mult, dtype),
    }


def mlp_6763(params: Params, x: jax.Array, *, policy: DTypePolicy = DEFAULT_POLICY) -> jax.Array:
    """(B, N, E) -> (B, output_dim): flatten then two FeedForward_2 blocks
    (reference :117-128; classifier-style ablation head)."""
    b = x.shape[0]
    h = x.reshape(b, -1)
    h = ff2(params["ff1"], h, policy=policy)
    return ff2(params["ff2"], h, policy=policy)
