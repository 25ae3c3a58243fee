"""InternViT-style vision encoder, TPU-native.

Parity target: /root/reference/InternVL/modeling_intern_vit.py
  - conv patch embed + CLS token + interpolated pos embeds (:138-179)
  - pre-norm encoder layers with layer-scale ls1/ls2 (:271-300)
  - packed-QKV flash attention, non-causal (:40-101, :182-253)

TPU-native choices:
  - NHWC image layout; the stride==kernel conv is expressed as a patch
    reshape + single matmul (one big MXU op instead of an implicit im2col).
  - layers scan-stacked as in internlm2.py.
  - attention via the shared Pallas flash kernel (non-causal path).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from callireader_tpu.core.config import VisionConfig
from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.kernels.attention import attention_reference, flash_attention

Params = Dict[str, Any]


def init_params(key: jax.Array, cfg: VisionConfig, dtype=jnp.bfloat16) -> Params:
    L, E, M = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    P, C = cfg.patch_size, cfg.num_channels
    n_pos = cfg.num_patches + 1
    ks = jax.random.split(key, 8)
    init = jax.nn.initializers.normal(cfg.initializer_range)

    def w(k, shape):
        return init(k, shape, jnp.float32).astype(dtype)

    return {
        "patch_embed": {
            "kernel": w(ks[0], (C * P * P, E)),  # (c*kh*kw, E), torch order
            "bias": jnp.zeros((E,), dtype),
        },
        "cls_token": w(ks[1], (1, 1, E)),
        "pos_embed": w(ks[2], (1, n_pos, E)),
        "layers": {
            "norm1_scale": jnp.ones((L, E), dtype),
            "norm1_bias": jnp.zeros((L, E), dtype),
            "norm2_scale": jnp.ones((L, E), dtype),
            "norm2_bias": jnp.zeros((L, E), dtype),
            "qkv_kernel": w(ks[3], (L, E, 3 * E)),
            "qkv_bias": jnp.zeros((L, 3 * E), dtype),
            "proj_kernel": w(ks[4], (L, E, E)),
            "proj_bias": jnp.zeros((L, E), dtype),
            "fc1_kernel": w(ks[5], (L, E, M)),
            "fc1_bias": jnp.zeros((L, M), dtype),
            "fc2_kernel": w(ks[6], (L, M, E)),
            "fc2_bias": jnp.zeros((L, E), dtype),
            "ls1": jnp.ones((L, E), dtype),
            "ls2": jnp.ones((L, E), dtype),
        },
    }


def logical_axes(cfg: VisionConfig) -> Params:
    del cfg
    lx = {
        "norm1_scale": ("stack", "norm"), "norm1_bias": ("stack", "norm"),
        "norm2_scale": ("stack", "norm"), "norm2_bias": ("stack", "norm"),
        "qkv_kernel": ("stack", "vit_embed", "qkv"), "qkv_bias": ("stack", "qkv"),
        "proj_kernel": ("stack", "qkv", "vit_embed"), "proj_bias": ("stack", "norm"),
        "fc1_kernel": ("stack", "vit_embed", "vit_mlp"), "fc1_bias": ("stack", "vit_mlp"),
        "fc2_kernel": ("stack", "vit_mlp", "vit_embed"), "fc2_bias": ("stack", "norm"),
        "ls1": ("stack", "norm"), "ls2": ("stack", "norm"),
    }
    return {
        "patch_embed": {"kernel": ("patch", "vit_embed"), "bias": ("norm",)},
        "cls_token": (None, None, "vit_embed"),
        "pos_embed": (None, None, "vit_embed"),
        "layers": lx,
    }


def layer_norm(x, scale, bias, eps, policy: DTypePolicy):
    xf = x.astype(policy.norm_dtype)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(policy.norm_dtype) + bias.astype(policy.norm_dtype)).astype(
        policy.compute_dtype
    )


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_uint8(pixel_values: jax.Array, dtype=jnp.float32) -> jax.Array:
    """On-device ImageNet normalization of raw uint8 NHWC tiles. Keeping
    host->device transfers in uint8 quarters the PCIe/DMA traffic vs f32."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype)
    std = jnp.asarray(IMAGENET_STD, dtype)
    x = pixel_values.astype(dtype) / 255.0
    return (x - mean) / std


def _patchify(pixel_values: jax.Array, patch: int) -> jax.Array:
    """NHWC (B,H,W,C) -> (B, H/p * W/p, C*p*p) with torch conv flatten order
    (c, kh, kw)."""
    B, H, W, C = pixel_values.shape
    x = pixel_values.reshape(B, H // patch, patch, W // patch, patch, C)
    # -> (B, gh, gw, C, kh, kw)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, (H // patch) * (W // patch), C * patch * patch)


def interp_pos_embed(pos_embed: jax.Array, grid_h: int, grid_w: int, base_grid: int) -> jax.Array:
    """Bicubic-resize patch position embeddings (CLS kept as-is).
    pos_embed (1, 1+base*base, E) -> (1, 1+gh*gw, E)."""
    if grid_h == base_grid and grid_w == base_grid:
        return pos_embed
    cls, rest = pos_embed[:, :1], pos_embed[:, 1:]
    E = rest.shape[-1]
    grid = rest.reshape(1, base_grid, base_grid, E).astype(jnp.float32)
    resized = jax.image.resize(grid, (1, grid_h, grid_w, E), method="bicubic")
    resized = resized.reshape(1, grid_h * grid_w, E).astype(pos_embed.dtype)
    return jnp.concatenate([cls, resized], axis=1)


VIT_LORA_MATS = ("qkv", "proj", "fc1", "fc2")


def forward(
    params: Params,
    cfg: VisionConfig,
    pixel_values: jax.Array,  # (B, H, W, C) NHWC
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
    interpret: bool = False,
    remat: bool = False,
    attn_impl: Optional[str] = None,  # None=auto | single_pass | packed | reference
    lora: Params = None,
    lora_scale: float = 1.0,
) -> jax.Array:
    """Returns last hidden state (B, 1+num_patches, E).

    ``lora``: optional {name_a: (L, in, r), name_b: (L, r, out)} deltas for
    the VIT_LORA_MATS matrices, applied functionally like resampler.forward's
    — CalliAlign training adapts the char-path ViT this way (the reference
    deploys a separate char-path ViT as params/vit_model.pt,
    config/configu.py:7 + models/model.py:20-30); inference merges the deltas
    into a dedicated ``char_vision`` tree once at load."""
    B, H, W, _ = pixel_values.shape
    P = cfg.patch_size
    gh, gw = H // P, W // P
    base = cfg.image_size // P

    if pixel_values.dtype == jnp.uint8:
        pixel_values = normalize_uint8(pixel_values, policy.norm_dtype)
    x = _patchify(pixel_values.astype(policy.compute_dtype), P)
    x = x @ params["patch_embed"]["kernel"].astype(x.dtype)
    x = x + params["patch_embed"]["bias"].astype(x.dtype)

    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    pos = interp_pos_embed(params["pos_embed"], gh, gw, base)
    x = x + pos.astype(x.dtype)

    if use_flash is None:
        use_flash = jax.devices()[0].platform == "tpu"
    Hn, Dh = cfg.num_attention_heads, cfg.head_dim
    S = x.shape[1]
    if attn_impl is None:
        from callireader_tpu.kernels.vit_attention import MAX_SINGLE_PASS_KV

        if not use_flash:
            attn_impl = "reference"
        elif -(-S // 128) * 128 <= MAX_SINGLE_PASS_KV and Dh % 64 == 0:
            # ViT rows are short (448px tile -> S=1025): one head's K/V fits
            # VMEM, so the whole-row kernels are eligible (no online-softmax
            # state, no lane-misaligned head slicing; vit_attention.py
            # header). Fused-loop A/B on v5e (scripts/bench_vit.py
            # --attn-impl both, 64 tiles): nomax 200.0 tiles/s vs packed
            # 192.6 vs single_pass 187.6 — the max-free kernel is the
            # real-TPU default; interpret mode keeps the single-pass kernel
            # (rowmax-shifted, tight-parity `precise` path for tests).
            attn_impl = "single_pass" if interpret else "nomax"
        else:
            attn_impl = "packed"
    if attn_impl == "packed" and not interpret and (Hn * Dh) % 128:
        # Mosaic requires the packed kernel's E-wide column blocks to be
        # lane-aligned (E % 128, packed_qkv_attention.py:146-150); tiny/test
        # widths fall back to the XLA reference path on real TPU.
        attn_impl = "reference"

    def _mm(p, h, name, l=None):
        """Layer linear, int8-aware: dispatches on ``{name}_kernel_q`` +
        ``{name}_kernel_scale`` (runtime/quantize.quantize_vit_int8). Unlike
        the LLM's weight-only path (decode is HBM-bound, so halving weight
        bytes is the whole win), the ViT encode is MXU-compute-bound — so
        the quantized path runs W8A8: activations are dynamically quantized
        per token (absmax/127) and the matmul executes as int8 x int8 ->
        int32 on the MXU (2x bf16 throughput), then rescales by (act_scale
        x per-out-channel weight scale). GELU/LN/attention stay bf16."""
        def _delta(out):
            if l is None:
                return out
            # delta in compute dtype: an fp32 cast of h (B x 1025 x E rows)
            # costs ~2x activation HBM for no benefit — the MXU accumulates
            # in fp32 either way
            d = (h @ l[f"{name}_a"].astype(h.dtype)) @ l[f"{name}_b"].astype(h.dtype)
            return out + (lora_scale * d).astype(out.dtype)

        q = p.get(f"{name}_kernel_q")
        if q is None:
            return _delta(
                h @ p[f"{name}_kernel"].astype(h.dtype)
            ) + p[f"{name}_bias"].astype(h.dtype)
        amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        hs = jnp.maximum(amax.astype(jnp.float32), 1e-6) / 127.0
        hq = jnp.clip(jnp.round(h.astype(jnp.float32) / hs), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            hq, q,
            (((hq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * hs * p[f"{name}_kernel_scale"]
        return _delta(y.astype(h.dtype)) + p[f"{name}_bias"].astype(h.dtype)

    def body(carry, pl):
        p, l = pl
        x = carry
        h = layer_norm(x, p["norm1_scale"], p["norm1_bias"], cfg.layer_norm_eps, policy)
        qkv = _mm(p, h, "qkv", l)
        if attn_impl == "single_pass":
            from callireader_tpu.kernels.vit_attention import (
                attention_from_packed_qkv,
            )

            ctx = attention_from_packed_qkv(qkv, Hn, interpret=interpret)
        elif attn_impl == "nomax":
            from callireader_tpu.kernels.vit_attention import (
                attention_from_packed_qkv_nomax,
            )

            ctx = attention_from_packed_qkv_nomax(qkv, Hn, interpret=interpret)
        elif attn_impl == "packed":
            # packed-QKV kernel: consumes (B, S, 3E) directly, zero transposes.
            # Fused-loop A/B inside the full 12-layer ViT on v5e (64 tiles):
            # packed kernel 322ms vs chunked-einsum 439ms vs full-einsum
            # 624ms. (An attention-only microbench that consumes one output
            # row says the opposite — XLA dead-code-eliminates the unused
            # einsum rows while a pallas_call is opaque; never trust
            # sliced-output microbenchmarks.)
            from callireader_tpu.kernels.packed_qkv_attention import (
                flash_attention_packed_qkv,
            )

            ctx = flash_attention_packed_qkv(qkv, Hn, interpret=interpret)
        else:
            qkv = qkv.reshape(B, S, 3, Hn, Dh)
            q = qkv[:, :, 0].transpose(0, 2, 1, 3)
            k = qkv[:, :, 1].transpose(0, 2, 1, 3)
            v = qkv[:, :, 2].transpose(0, 2, 1, 3)
            ctx = attention_reference(q, k, v, causal=False)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, Hn * Dh)
        ctx = _mm(p, ctx, "proj", l)
        x = x + ctx * p["ls1"].astype(ctx.dtype)

        h = layer_norm(x, p["norm2_scale"], p["norm2_bias"], cfg.layer_norm_eps, policy)
        h = _mm(p, h, "fc1", l)
        h = jax.nn.gelu(h, approximate=False)
        h = _mm(p, h, "fc2", l)
        x = x + h * p["ls2"].astype(h.dtype)
        return x, None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, (params["layers"], lora))
    return x
