"""Weight-only int8 quantization for serving.

No reference equivalent at inference time (the reference offers 4-bit NF4 only
for QLoRA *training* via bitsandbytes, train/xtuner/model/internvl.py:50-71).
On TPU, weight-only int8 is the deployment lever that matters: decode is HBM
-bandwidth-bound, so halving weight bytes halves ms/token, and it shrinks the
8B flagship (~16.6 GB bf16) under a single v5e chip's 16 GB HBM.

Scheme: symmetric per-output-channel absmax scales.
  w (.., in, out)  ->  q int8 (.., in, out), scale f32 (.., 1, out)
  y = (h @ q) * scale          (exact algebra; MXU reads int8 from HBM)

Quantized leaves ride the same pytree as ``{name}_q`` + ``{name}_scale``; the
projection helper (models/internlm2._proj) and embed/logits paths dispatch on
their presence, so LoRA adapters, scan stacking and sharding all compose.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

QUANT_TARGETS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def quantize_weight(w: jax.Array, axis: int = -1):
    """Symmetric absmax int8 along all dims except ``axis`` (the out-channel
    dim keeps its own scale)."""
    wf = w.astype(jnp.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    absmax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_weight(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quantize_llm_int8(
    llm_params: Dict[str, Any],
    *,
    targets: Sequence[str] = QUANT_TARGETS,
    quantize_embeddings: bool = True,
) -> Dict[str, Any]:
    """Returns a new LLM pytree with int8 projection weights. Per-layer
    stacked weights (L, in, out) get per-(layer, out) scales."""
    out = dict(llm_params)
    layers = dict(llm_params["layers"])
    for name in targets:
        w = layers.pop(name)
        # (L, in, out): scale per (L, 1, out)
        wf = w.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        layers[f"{name}_q"] = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        layers[f"{name}_scale"] = scale.astype(jnp.float32)
    out["layers"] = layers

    if quantize_embeddings:
        for name in ("tok_embeddings", "output"):
            w = out.pop(name)  # (V, E)
            wf = w.astype(jnp.float32)
            absmax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)  # per-row
            scale = jnp.maximum(absmax, 1e-8) / 127.0
            out[f"{name}_q"] = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
            out[f"{name}_scale"] = scale.astype(jnp.float32)
    return out


VIT_QUANT_TARGETS = ("qkv", "proj", "fc1", "fc2")


def quantize_vit_int8(
    vision_params: Dict[str, Any],
    *,
    targets: Sequence[str] = VIT_QUANT_TARGETS,
) -> Dict[str, Any]:
    """int8 weight-only for the ViT tower's scan-stacked layer linears
    (``{name}_kernel`` (L, in, out) -> ``{name}_kernel_q`` + per-(layer,
    out-channel) ``{name}_kernel_scale``). The char-crop ViT encode is the
    dominant device stage of the OCR pipeline (~65% of the batch interval),
    so halving its weight HBM traffic and running int8 MXU matmuls is the
    serving lever; patch_embed / norms / layer-scales stay bf16 (tiny, and
    the input projection sets the numeric floor). Dispatch:
    models/internvit.forward's _mm."""
    out = dict(vision_params)
    layers = dict(out["layers"])
    for name in targets:
        w = layers.pop(f"{name}_kernel")
        wf = w.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        layers[f"{name}_kernel_q"] = jnp.clip(
            jnp.round(wf / scale), -127, 127
        ).astype(jnp.int8)
        layers[f"{name}_kernel_scale"] = scale.astype(jnp.float32)
    out["layers"] = layers
    return out


def quantized_vit_logical_axes(
    axes: Dict[str, Any], params: Dict[str, Any]
) -> Dict[str, Any]:
    """Extend a ViT logical-axis tree for quantized leaves."""
    layers = dict(axes["layers"])
    for name in VIT_QUANT_TARGETS:
        if f"{name}_kernel_q" in params["layers"]:
            base = layers.pop(f"{name}_kernel", ("stack", "vit_embed", None))
            layers[f"{name}_kernel_q"] = base
            layers[f"{name}_kernel_scale"] = ("stack", None, base[-1])
    out = dict(axes)
    out["layers"] = layers
    return out


def dequantize_llm_int8(
    llm_params: Dict[str, Any],
    *,
    targets: Sequence[str] = QUANT_TARGETS,
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Inverse of quantize_llm_int8: fold ``{name}_q``/``{name}_scale`` leaves
    back to dense weights (lossy — returns the int8 rounding of the original).
    Used by the deployable export after QLoRA training, where adapters must
    merge into a dense base (train/lora.merge_lora)."""
    out = dict(llm_params)
    layers = dict(out["layers"])
    for name in targets:
        q = layers.pop(f"{name}_q", None)
        if q is None:
            continue
        scale = layers.pop(f"{name}_scale")
        layers[name] = (q.astype(jnp.float32) * scale).astype(dtype)
    out["layers"] = layers
    for name in ("tok_embeddings", "output"):
        q = out.pop(f"{name}_q", None)
        if q is None:
            continue
        scale = out.pop(f"{name}_scale")
        out[name] = (q.astype(jnp.float32) * scale).astype(dtype)
    return out


def quantized_logical_axes(axes: Dict[str, Any], params: Dict[str, Any]) -> Dict[str, Any]:
    """Extend an LLM logical-axis tree for quantized leaves."""
    layers = dict(axes["layers"])
    for name in QUANT_TARGETS:
        if f"{name}_q" in params["layers"]:
            base = layers.pop(name, ("stack", "embed", "mlp"))
            layers[f"{name}_q"] = base
            layers[f"{name}_scale"] = ("stack", None, base[-1])
    out = dict(axes)
    out["layers"] = layers
    for name in ("tok_embeddings", "output"):
        if f"{name}_q" in params:
            base = out.pop(name, ("vocab", "embed"))
            out[f"{name}_q"] = base
            out[f"{name}_scale"] = ("vocab", None)
    return out


def param_bytes(tree: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))
