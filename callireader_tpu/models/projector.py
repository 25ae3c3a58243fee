"""Pixel-shuffle projector ("mlp1").

Parity target: modeling_internvl_chat.py:283-319 (pixel_shuffle, extract_feature)
and :185-190 (mlp1 = LayerNorm -> Linear -> GELU -> Linear).

Maps ViT hidden states (B, 1+1024, 1024) -> 256 LLM-space tokens (B, 256, 4096):
drop CLS, reshape to 32x32, pixel-shuffle x0.5 (ps v2 = permute back), mlp1.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from callireader_tpu.core.config import VLMConfig
from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.models.internvit import layer_norm

Params = Dict[str, Any]


def init_params(
    key: jax.Array,
    cfg: VLMConfig,
    dtype=jnp.bfloat16,
    *,
    vit_hidden: int = 0,
    out_dim: int = 0,
) -> Params:
    """``vit_hidden``/``out_dim`` override the tile-tower dims for the
    compact char-path projector (cfg.char_vision -> resampler dim); 0 = the
    reference mlp1 shapes (modeling_internvl_chat.py:185-190)."""
    vit_e = vit_hidden or cfg.vision.hidden_size
    llm_e = out_dim or cfg.llm.hidden_size
    in_dim = vit_e * int(1 / cfg.downsample_ratio) ** 2
    k1, k2 = jax.random.split(key)
    init = jax.nn.initializers.normal(0.02)
    return {
        "ln_scale": jnp.ones((in_dim,), dtype),
        "ln_bias": jnp.zeros((in_dim,), dtype),
        "fc1_kernel": init(k1, (in_dim, llm_e), jnp.float32).astype(dtype),
        "fc1_bias": jnp.zeros((llm_e,), dtype),
        "fc2_kernel": init(k2, (llm_e, llm_e), jnp.float32).astype(dtype),
        "fc2_bias": jnp.zeros((llm_e,), dtype),
    }


def logical_axes(cfg: VLMConfig) -> Params:
    del cfg
    return {
        "ln_scale": ("norm",), "ln_bias": ("norm",),
        "fc1_kernel": ("vit_mlp", "embed"), "fc1_bias": ("norm",),
        "fc2_kernel": ("embed", "mlp"), "fc2_bias": ("norm",),
    }


def pixel_shuffle(x: jax.Array, scale_factor: float, ps_version: str = "v2") -> jax.Array:
    """x (N, W, H, C) -> (N, W*s, H*s, C/s^2). Mirrors the reference's
    view/permute dance (modeling_internvl_chat.py:283-297) exactly."""
    n, w, h, c = x.shape
    x = x.reshape(n, w, int(h * scale_factor), int(c / scale_factor))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(n, int(h * scale_factor), int(w * scale_factor), int(c / (scale_factor**2)))
    if ps_version != "v1":
        x = x.transpose(0, 2, 1, 3)
    return x


def extract_feature(
    projector_params: Params,
    vit_hidden: jax.Array,  # (B, 1+S, E_vit), includes CLS
    cfg: VLMConfig,
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
) -> jax.Array:
    """-> (B, num_image_token, E_llm)."""
    x = vit_hidden[:, 1:, :]  # drop CLS
    B, S, E = x.shape
    hw = int(S**0.5)
    x = x.reshape(B, hw, hw, E)
    x = pixel_shuffle(x, cfg.downsample_ratio, cfg.ps_version)
    x = x.reshape(B, -1, x.shape[-1])

    p = projector_params
    x = layer_norm(x, p["ln_scale"], p["ln_bias"], 1e-5, policy)
    x = x @ p["fc1_kernel"].astype(x.dtype) + p["fc1_bias"].astype(x.dtype)
    x = jax.nn.gelu(x, approximate=False)
    x = x @ p["fc2_kernel"].astype(x.dtype) + p["fc2_bias"].astype(x.dtype)
    return x
