"""LLaVA-family VLM wrapper: vision tower + depth-N GELU MLP projector + LLM.

Parity target: train/xtuner/model/llava.py — LLaVAModel composes a CLIP-style
vision tower, a ``ProjectorModel`` (depth-2 GELU MLP, :51-74) and an LLM, and
splices projected patch features into the text embedding sequence at the
``<image>`` placeholder via ``prepare_inputs_labels_for_multimodal`` (:302;
xtuner/model/utils.py). Here the splice is a static-shape JAX program: each
row's single image placeholder expands to ``n_patches`` feature rows, padded
left to a fixed bucket so one compiled program serves the whole dataset.

The vision tower reuses models/internvit.py (any ViT emitting (B, N, C)
features works); the LLM is models/internlm2.py. visual_select_layer and
'patch'/'cls_patch' feature selection follow llava.py:76,299.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.models import internlm2

Params = Dict[str, Any]

IMAGE_TOKEN_INDEX = -200  # llava constant: the placeholder id in input_ids


def init_projector(key: jax.Array, visual_hidden: int, llm_hidden: int,
                   depth: int = 2, dtype=jnp.bfloat16) -> Params:
    """mlp{depth}x_gelu projector (llava.py:51-74): Linear -> (GELU, Linear)*."""
    ks = jax.random.split(key, depth)
    init = jax.nn.initializers.normal(0.02)
    layers = []
    d_in = visual_hidden
    for i in range(depth):
        layers.append({
            "kernel": init(ks[i], (d_in, llm_hidden), jnp.float32).astype(dtype),
            "bias": jnp.zeros((llm_hidden,), dtype),
        })
        d_in = llm_hidden
    return {"layers": layers}


def projector_logical_axes(depth: int = 2) -> Params:
    return {"layers": [
        {"kernel": ("embed", "mlp"), "bias": ("mlp",)} for _ in range(depth)
    ]}


def project(params: Params, feats: jax.Array) -> jax.Array:
    h = feats
    for i, layer in enumerate(params["layers"]):
        if i:
            h = jax.nn.gelu(h, approximate=False)
        h = h @ layer["kernel"].astype(h.dtype) + layer["bias"].astype(h.dtype)
    return h


def select_features(hidden_states: jax.Array, select_type: str = "patch") -> jax.Array:
    """llava visual feature selection: drop CLS ('patch') or keep it
    ('cls_patch'); hidden_states (B, 1+N, C) with CLS first."""
    if select_type == "patch":
        return hidden_states[:, 1:]
    if select_type == "cls_patch":
        return hidden_states
    raise ValueError(select_type)


def prepare_inputs_labels_for_multimodal(
    llm_params: Params,
    cfg,
    input_ids: jax.Array,      # (B, S) with one IMAGE_TOKEN_INDEX per row
    image_feats: jax.Array,    # (B, n_patch, llm_hidden) projected features
    labels: Optional[jax.Array] = None,   # (B, S)
    *,
    ignore_index: int = -100,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Expand each row's image placeholder into its n_patch feature rows.

    Static-shape equivalent of xtuner/model/utils.py's per-row Python loop:
    output length S' = S - 1 + n_patch for every row. Returns
    (inputs_embeds (B,S',E), labels' (B,S') or None, position mask (B,S')).
    Image rows get ignore_index labels (llava semantics).
    """
    B, S = input_ids.shape
    n_patch = image_feats.shape[1]
    S2 = S - 1 + n_patch

    img_pos = jnp.argmax((input_ids == IMAGE_TOKEN_INDEX).astype(jnp.int32), axis=1)  # (B,)
    safe_ids = jnp.where(input_ids == IMAGE_TOKEN_INDEX, 0, input_ids)
    text_embeds = internlm2.embed_tokens(llm_params, safe_ids, compute_dtype)
    image_feats = image_feats.astype(compute_dtype)

    # target index for every source text token: j if j < pos else j + n_patch - 1
    j = jnp.arange(S)[None, :]
    tgt_text = jnp.where(j < img_pos[:, None], j, j + n_patch - 1)  # (B, S)
    # scatter text rows (the placeholder row is overwritten by image rows below)
    out = jnp.zeros((B, S2, text_embeds.shape[-1]), compute_dtype)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, S))
    out = out.at[bidx, tgt_text].set(text_embeds)
    # scatter image rows at pos..pos+n_patch-1
    kimg = jnp.arange(n_patch)[None, :]
    tgt_img = img_pos[:, None] + kimg  # (B, n_patch)
    bidx2 = jnp.broadcast_to(jnp.arange(B)[:, None], (B, n_patch))
    out = out.at[bidx2, tgt_img].set(image_feats)

    new_labels = None
    if labels is not None:
        lab = jnp.full((B, S2), ignore_index, labels.dtype)
        lab = lab.at[bidx, tgt_text].set(labels)
        lab = lab.at[bidx2, tgt_img].set(ignore_index)
        new_labels = lab

    mask = jnp.ones((B, S2), jnp.int32)
    return out, new_labels, mask


def init_llava_params(key: jax.Array, cfg, dtype=jnp.bfloat16,
                      projector_depth: int = 2) -> Params:
    """Full LLaVA parameter tree: vision tower + projector + LLM."""
    from callireader_tpu.models import internvit

    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "vit": internvit.init_params(k1, cfg.vision, dtype),
        "projector": init_projector(
            k2, cfg.vision.hidden_size, cfg.llm.hidden_size, projector_depth, dtype
        ),
        "llm": internlm2.init_params(k3, cfg.llm, dtype),
    }


def llava_loss(
    params: Params,
    cfg,
    pixel_values: jax.Array,   # (B, H, W, 3)
    input_ids: jax.Array,      # (B, S)
    labels: jax.Array,         # (B, S)
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
    visual_select: str = "patch",
    freeze_vit: bool = True,
    use_flash: bool = False,
) -> jax.Array:
    """Training forward: ViT -> select -> project -> splice -> LLM CE loss
    (llava.py:280-350 semantics)."""
    from callireader_tpu.models import internvit

    feats = internvit.forward(
        params["vit"], cfg.vision, pixel_values, policy=policy, use_flash=use_flash
    )
    if freeze_vit:
        feats = jax.lax.stop_gradient(feats)
    feats = project(params["projector"], select_features(feats, visual_select))
    embeds, lab, _ = prepare_inputs_labels_for_multimodal(
        params["llm"], cfg.llm, input_ids, feats, labels,
        compute_dtype=policy.compute_dtype,
    )
    logits = internlm2.forward(
        params["llm"], cfg.llm, inputs_embeds=embeds, policy=policy,
        use_flash=use_flash,
    )
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = lab[:, 1:]
    valid = shift_labels != -100
    onehot_ce = -jax.nn.log_softmax(shift_logits, axis=-1)
    tok = jnp.take_along_axis(
        onehot_ce, jnp.maximum(shift_labels, 0)[..., None], axis=-1
    )[..., 0]
    return jnp.sum(jnp.where(valid, tok, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
