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


def fuse_llm_int8(llm_params: Dict[str, Any]) -> Dict[str, Any]:
    """Concatenate int8 Q/K/V (and gate/up) projections along the out axis
    into single fused leaves ``wqkv_q`` / ``w13_q``.

    Decode is per-pallas-call overhead-sensitive: 7 projection kernel
    launches per layer x 32 layers dominates the gap to the HBM roofline
    once weights stream as int8. Fusing drops that to 4 launches/layer with
    EXACT numerics — per-out-channel scales concatenate losslessly, and the
    matmul columns are independent, so splitting the fused output equals the
    separate matmuls bit-for-bit.

    Single-device serving only: the fused out axis interleaves q/k/v head
    groups, which does not shard cleanly over a tensor mesh axis — callers
    must not fuse when tensor parallelism is active. Skipped (returns the
    tree unchanged) when LoRA adapter leaves are present, since adapters
    attach to the unfused names. One-time device concat; checkpoints always
    store the unfused layout."""
    layers = llm_params.get("layers", {})
    if any(k.endswith("_lora_a") for k in layers):
        return llm_params
    layers = dict(layers)
    changed = False
    for fused, parts in (("wqkv", ("wq", "wk", "wv")), ("w13", ("w1", "w3"))):
        if f"{fused}_q" in layers or not all(f"{p}_q" in layers for p in parts):
            continue
        layers[f"{fused}_q"] = jnp.concatenate(
            [layers.pop(f"{p}_q") for p in parts], axis=-1)
        layers[f"{fused}_scale"] = jnp.concatenate(
            [layers.pop(f"{p}_scale") for p in parts], axis=-1)
        changed = True
    if not changed:
        return llm_params
    out = dict(llm_params)
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
    # fused single-chip leaves (fuse_llm_int8): the concatenated out axis
    # crosses q/k/v (gate/up) boundaries, so it must stay unsharded — fusion
    # is gated to meshes without tensor parallelism
    for fused, dropped in (("wqkv", ("wq", "wk", "wv")), ("w13", ("w1", "w3"))):
        if f"{fused}_q" in params["layers"]:
            for p in dropped:
                layers.pop(p, None)
            layers[f"{fused}_q"] = ("stack", "embed", None)
            layers[f"{fused}_scale"] = ("stack", None, None)
    out = dict(axes)
    out["layers"] = layers
    for name in ("tok_embeddings", "output"):
        if f"{name}_q" in params:
            base = out.pop(name, ("vocab", "embed"))
            out[f"{name}_q"] = base
            out[f"{name}_scale"] = ("vocab", None)
    return out


def init_llm_int8_device(
    key: jax.Array, cfg, *, dtype=jnp.bfloat16, fused: bool = False
) -> Dict[str, Any]:
    """Random-init the LLM DIRECTLY as int8+scales, one leaf at a time on
    device. quantize_llm_int8(init_params(...)) needs the full bf16 tree
    resident first — 15.5 GB for the 8B flagship, which is exactly what int8
    single-chip serving exists to avoid. Here each stacked leaf is generated
    bf16, reduced to absmax scales, and rounded to int8 inside ONE jitted
    program (XLA frees the bf16 intermediate at program exit), so peak HBM is
    accumulated-int8 + one bf16 leaf (~3.8 GB for the 8B mlp stack).
    Same tree structure/dtypes as quantize_llm_int8 output (different RNG
    stream — random weights are for pipeline/perf testing only).
    ``fused``: emit the fuse_llm_int8 layout (wqkv_q / w13_q) directly —
    per-out-channel scales make joint quantization of the fused leaf exactly
    equivalent to quantize-then-concatenate, without the concat's transient
    HBM copy (3.8 GB on the 8B)."""
    import functools

    L, E, M = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    V = cfg.vocab_size

    @functools.partial(jax.jit, static_argnames=("shape", "scale_axes"))
    def _qleaf(k, shape, scale_axes):
        w = jax.random.normal(k, shape, dtype) * jnp.asarray(0.02, dtype)
        wf = w.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(wf), axis=scale_axes, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    ks = jax.random.split(key, 9)
    if fused:
        shapes = {
            "wqkv": (L, E, (Hq + 2 * Hkv) * D), "wo": (L, Hq * D, E),
            "w13": (L, E, 2 * M), "w2": (L, M, E),
        }
        targets = ("wqkv", "wo", "w13", "w2")
    else:
        shapes = {
            "wq": (L, E, Hq * D), "wk": (L, E, Hkv * D), "wv": (L, E, Hkv * D),
            "wo": (L, Hq * D, E), "w1": (L, E, M), "w3": (L, E, M),
            "w2": (L, M, E),
        }
        targets = QUANT_TARGETS
    layers: Dict[str, Any] = {
        "attn_norm": jnp.ones((L, E), dtype),
        "ffn_norm": jnp.ones((L, E), dtype),
    }
    for i, name in enumerate(targets):
        q, s = _qleaf(ks[i], shapes[name], (1,))
        layers[f"{name}_q"] = q
        layers[f"{name}_scale"] = s
    out: Dict[str, Any] = {"layers": layers, "norm": jnp.ones((E,), dtype)}
    for j, name in enumerate(("tok_embeddings", "output")):
        q, s = _qleaf(ks[7 + j], (V, E), (1,))
        out[f"{name}_q"] = q
        out[f"{name}_scale"] = s
    return out


def param_bytes(tree: Any) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))
