"""Checkpoint save/resume + export back to the reference's deployable format.

Replaces, TPU-natively:
  - mmengine CheckpointHook + DeepSpeed save/load/resume
    (engine/_strategy/deepspeed.py:33-61, e-IT.py:150-155)  -> orbax, which
    writes sharded arrays directly from device memory (no ZeRO shard
    consolidation step needed — zero_to_any_dtype.py's 696 lines disappear).
  - convert_to_official.py:15-38 (merge LoRA -> save_pretrained)  ->
    ``export_reference_format`` writes a model.safetensors set with the
    reference's key names (fused wqkv etc.) so the torch stack can load it.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import LLMConfig, VLMConfig
from callireader_tpu.runtime.weights import fuse_wqkv
from callireader_tpu.train.e_it import TrainState


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _flatten(tree: Any) -> Dict[str, Any]:
    """Pytree -> {"a/b/0/c": leaf}; None leaves (frozen-partition holes) are
    dropped (orbax's sharding metadata mishandles None members)."""
    out: Dict[str, Any] = {}
    flat = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: x is None
    )[0]
    for path, leaf in flat:
        if leaf is None:
            continue
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path)
        out[key] = leaf
    return out


def _unflatten_into(template: Any, flat: Dict[str, Any]) -> Any:
    leaves_with_path = jax.tree_util.tree_flatten_with_path(
        template, is_leaf=lambda x: x is None
    )[0]
    treedef = jax.tree_util.tree_structure(template, is_leaf=lambda x: x is None)
    new_leaves = []
    for path, leaf in leaves_with_path:
        if leaf is None:
            new_leaves.append(None)
            continue
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path)
        new_leaves.append(flat[key])
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_train_state(path: str, state: TrainState, metadata: Optional[Dict] = None) -> None:
    path = os.path.abspath(path)
    payload = _flatten(
        {"trainable": state.trainable, "opt_state": state.opt_state, "step": state.step}
    )
    _ckptr().save(os.path.join(path, "state"), payload, force=True)
    if metadata is not None:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    path = os.path.abspath(path)
    tmpl_tree = {
        "trainable": template.trainable,
        "opt_state": template.opt_state,
        "step": template.step,
    }
    tmpl_flat = _flatten(tmpl_tree)
    import orbax.checkpoint as ocp

    restore_args = ocp.checkpoint_utils.construct_restore_args(tmpl_flat)
    restored_flat = _ckptr().restore(
        os.path.join(path, "state"), item=tmpl_flat, restore_args=restore_args
    )
    # pin restored leaves to the template's exact shardings (orbax may land
    # them on a single device otherwise)
    restored_flat = {
        k: jax.device_put(v, tmpl_flat[k].sharding)
        if hasattr(tmpl_flat[k], "sharding")
        else v
        for k, v in restored_flat.items()
    }
    restored = _unflatten_into(tmpl_tree, restored_flat)
    return TrainState(restored["trainable"], restored["opt_state"], restored["step"])


def save_params(path: str, params: Any) -> None:
    _ckptr().save(os.path.abspath(path), params, force=True)


def restore_params(path: str, template: Any) -> Any:
    return _ckptr().restore(os.path.abspath(path), item=template)


# ---------------------------------------------------------------------------
# export to reference (torch/safetensors) format
# ---------------------------------------------------------------------------


def llm_to_reference_sd(llm_params: Dict[str, Any], cfg: LLMConfig) -> Dict[str, np.ndarray]:
    """Our pytree -> reference key names (inverse of weights.convert_llm)."""
    p = {k: np.asarray(v, np.float32) for k, v in llm_params.items() if k != "layers"}
    layers = {k: np.asarray(v, np.float32) for k, v in llm_params["layers"].items()}
    sd: Dict[str, np.ndarray] = {
        "language_model.model.tok_embeddings.weight": p["tok_embeddings"],
        "language_model.model.norm.weight": p["norm"],
        "language_model.output.weight": p["output"],
    }
    L = cfg.num_hidden_layers
    for i in range(L):
        pre = f"language_model.model.layers.{i}."
        sd[pre + "attention.wqkv.weight"] = fuse_wqkv(
            layers["wq"][i], layers["wk"][i], layers["wv"][i], cfg
        )
        sd[pre + "attention.wo.weight"] = layers["wo"][i].T
        sd[pre + "attention_norm.weight"] = layers["attn_norm"][i]
        sd[pre + "ffn_norm.weight"] = layers["ffn_norm"][i]
        sd[pre + "feed_forward.w1.weight"] = layers["w1"][i].T
        sd[pre + "feed_forward.w3.weight"] = layers["w3"][i].T
        sd[pre + "feed_forward.w2.weight"] = layers["w2"][i].T
    return sd


def vit_to_reference_sd(vit_params: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    layers = {k: np.asarray(v, np.float32) for k, v in vit_params["layers"].items()}
    pe = vit_params["patch_embed"]
    E = np.asarray(pe["kernel"]).shape[1]
    P = cfg.patch_size
    sd = {
        "vision_model.embeddings.patch_embedding.weight": np.asarray(
            pe["kernel"], np.float32
        ).T.reshape(E, cfg.num_channels, P, P),
        "vision_model.embeddings.patch_embedding.bias": np.asarray(pe["bias"], np.float32),
        "vision_model.embeddings.class_embedding": np.asarray(vit_params["cls_token"], np.float32),
        "vision_model.embeddings.position_embedding": np.asarray(vit_params["pos_embed"], np.float32),
    }
    names = {
        "norm1_scale": "norm1.weight", "norm1_bias": "norm1.bias",
        "norm2_scale": "norm2.weight", "norm2_bias": "norm2.bias",
        "qkv_bias": "attn.qkv.bias", "proj_bias": "attn.proj.bias",
        "fc1_bias": "mlp.fc1.bias", "fc2_bias": "mlp.fc2.bias",
        "ls1": "ls1", "ls2": "ls2",
    }
    transposed = {
        "qkv_kernel": "attn.qkv.weight", "proj_kernel": "attn.proj.weight",
        "fc1_kernel": "mlp.fc1.weight", "fc2_kernel": "mlp.fc2.weight",
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"vision_model.encoder.layers.{i}."
        for ours, theirs in names.items():
            sd[pre + theirs] = layers[ours][i]
        for ours, theirs in transposed.items():
            sd[pre + theirs] = layers[ours][i].T
    return sd


def projector_to_reference_sd(proj: Dict[str, Any]) -> Dict[str, np.ndarray]:
    g = lambda k: np.asarray(proj[k], np.float32)
    return {
        "mlp1.0.weight": g("ln_scale"),
        "mlp1.0.bias": g("ln_bias"),
        "mlp1.1.weight": g("fc1_kernel").T,
        "mlp1.1.bias": g("fc1_bias"),
        "mlp1.3.weight": g("fc2_kernel").T,
        "mlp1.3.bias": g("fc2_bias"),
    }


def resampler_to_reference_sd(res: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    """Inverse of weights.convert_resampler: our stacked pytree -> the
    deployed checkpoint's ``resampler.*`` keys (torch PerceiverResampler
    module layout, reference models/perceiver_resampler.py:54-100)."""
    g = lambda k: np.asarray(res[k], np.float32)
    lay = {k: np.asarray(v, np.float32) for k, v in res["layers"].items()}
    sd: Dict[str, np.ndarray] = {
        "resampler.learns": g("learns"),
        "resampler.norm.weight": g("norm_scale"),
        "resampler.norm.bias": g("norm_bias"),
    }
    plain = {
        "norm_media_scale": "0.norm_media.weight", "norm_media_bias": "0.norm_media.bias",
        "norm_learns_scale": "0.norm_learns.weight", "norm_learns_bias": "0.norm_learns.bias",
        "ff_norm_scale": "1.net.0.weight", "ff_norm_bias": "1.net.0.bias",
        "ff1_bias": "1.net.1.bias", "ff2_bias": "1.net.3.bias",
    }
    transposed = {
        "to_q": "0.to_q.weight", "to_kv": "0.to_kv.weight", "to_out": "0.to_out.weight",
        "ff1": "1.net.1.weight", "ff2": "1.net.3.weight",
    }
    for i in range(cfg.depth):
        pre = f"resampler.layers.{i}."
        for ours, theirs in plain.items():
            sd[pre + theirs] = lay[ours][i]
        for ours, theirs in transposed.items():
            sd[pre + theirs] = lay[ours][i].T
    return sd


def orderformer_to_reference_sd(of: Dict[str, Any], num_layers: int) -> Dict[str, np.ndarray]:
    """Inverse of weights.convert_orderformer: torch nn.TransformerEncoder
    state-dict layout (reference models/model.py:210-226), for
    params/orderformer.pth."""
    g = lambda k: np.asarray(of[k], np.float32)
    lay = {k: np.asarray(v, np.float32) for k, v in of["layers"].items()}
    sd: Dict[str, np.ndarray] = {
        "embedding.weight": g("embed_kernel").T,
        "embedding.bias": g("embed_bias"),
        "decoder.weight": g("decode_kernel").T,
        "decoder.bias": g("decode_bias"),
    }
    plain = {
        "in_proj_bias": "self_attn.in_proj_bias",
        "out_proj_bias": "self_attn.out_proj.bias",
        "norm1_scale": "norm1.weight", "norm1_bias": "norm1.bias",
        "norm2_scale": "norm2.weight", "norm2_bias": "norm2.bias",
        "ff1_bias": "linear1.bias", "ff2_bias": "linear2.bias",
    }
    transposed = {
        "in_proj_kernel": "self_attn.in_proj_weight",
        "out_proj_kernel": "self_attn.out_proj.weight",
        "ff1_kernel": "linear1.weight", "ff2_kernel": "linear2.weight",
    }
    for i in range(num_layers):
        pre = f"transformer_encoder.layers.{i}."
        for ours, theirs in plain.items():
            sd[pre + theirs] = lay[ours][i]
        for ours, theirs in transposed.items():
            sd[pre + theirs] = lay[ours][i].T
    return sd


def detector_to_ultralytics_sd(det: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of detector_weights.convert_yolov8: emit an ultralytics-layout
    state dict (keys ``model.N...``) whose BN folds back to our convs exactly
    — identity BatchNorm (gamma=1, mean=0, var=1-eps) carries the bias, so
    fold_bn(w, 1, b, 0, 1-eps) == (w, b)."""
    from callireader_tpu.runtime.detector_weights import BN_EPS

    sd: Dict[str, np.ndarray] = {}

    def conv_block(prefix: str, blk: Dict[str, np.ndarray]) -> None:
        w = np.asarray(blk["w"], np.float32).transpose(3, 2, 0, 1)  # HWIO->OIHW
        cout = w.shape[0]
        sd[f"{prefix}.conv.weight"] = np.ascontiguousarray(w)
        sd[f"{prefix}.bn.weight"] = np.ones(cout, np.float32)
        sd[f"{prefix}.bn.bias"] = np.asarray(blk["b"], np.float32)
        sd[f"{prefix}.bn.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.bn.running_var"] = np.full(cout, 1.0 - BN_EPS, np.float32)

    def plain_conv(prefix: str, blk: Dict[str, np.ndarray]) -> None:
        w = np.asarray(blk["w"], np.float32).transpose(3, 2, 0, 1)
        sd[f"{prefix}.weight"] = np.ascontiguousarray(w)
        sd[f"{prefix}.bias"] = np.asarray(blk["b"], np.float32)

    def c2f(prefix: str, node: Dict[str, Any]) -> None:
        conv_block(f"{prefix}.cv1", node["cv1"])
        conv_block(f"{prefix}.cv2", node["cv2"])
        for i, blk in enumerate(node["blocks"]):
            conv_block(f"{prefix}.m.{i}.cv1", blk["cv1"])
            conv_block(f"{prefix}.m.{i}.cv2", blk["cv2"])

    bb, neck, head = det["backbone"], det["neck"], det["head"]
    conv_block("model.0", bb["stem"])
    conv_block("model.1", bb["down1"])
    c2f("model.2", bb["c2f1"])
    conv_block("model.3", bb["down2"])
    c2f("model.4", bb["c2f2"])
    conv_block("model.5", bb["down3"])
    c2f("model.6", bb["c2f3"])
    conv_block("model.7", bb["down4"])
    c2f("model.8", bb["c2f4"])
    conv_block("model.9.cv1", bb["sppf"]["cv1"])
    conv_block("model.9.cv2", bb["sppf"]["cv2"])
    c2f("model.12", neck["c2f_p4"])
    c2f("model.15", neck["c2f_p3"])
    conv_block("model.16", neck["down_p3"])
    c2f("model.18", neck["c2f_n4"])
    conv_block("model.19", neck["down_p4"])
    c2f("model.21", neck["c2f_n5"])
    for i, name in enumerate(("p3", "p4", "p5")):
        for branch, key in (("box", "cv2"), ("cls", "cv3")):
            b = head[name][branch]
            conv_block(f"model.22.{key}.{i}.0", b["cv1"])
            conv_block(f"model.22.{key}.{i}.1", b["cv2"])
            plain_conv(f"model.22.{key}.{i}.2", b["out"])
    return sd


def export_full_reference_checkpoint(
    params: Dict[str, Any],
    cfg: VLMConfig,
    out_dir: str,
    *,
    max_shard_bytes: Optional[int] = None,
) -> str:
    """Write a COMPLETE on-disk reference checkpoint directory: safetensors
    shards + model.safetensors.index.json (llm/vision/mlp1/resampler/
    normed_emb) plus every torch side file of config/configu.py:7-13,61-62 —
    params/{gauss_norm_mu_sigma.pth, gauss_norm.pth, token_embedding.pth,
    mlp1.pth, vit_model.pt, callialign.pth, orderformer.pth, best.pt}.

    This is the deployable layout cli inference can boot from end-to-end
    (build_engine --checkpoint auto-discovers the side files), and the
    ingestion dry-run the environment's lack of real weights otherwise
    forbids: export a pytree -> disk -> convert_reference_checkpoint must
    reproduce it (tests/test_checkpoint_ingestion.py)."""
    import torch

    os.makedirs(os.path.join(out_dir, "params"), exist_ok=True)
    export_reference_format(params, cfg, out_dir, max_shard_bytes=max_shard_bytes)

    def to_torch(obj):
        if isinstance(obj, dict):
            return {k: to_torch(v) for k, v in obj.items()}
        return torch.from_numpy(np.array(obj, np.float32))

    def tsave(obj, name):
        torch.save(to_torch(obj), os.path.join(out_dir, "params", name))

    align = params.get("align", {})
    if "mu" in align:
        ms = np.stack([np.asarray(align["mu"], np.float32),
                       np.asarray(align["sigma"], np.float32)], axis=1)
        tsave({"weight": ms}, "gauss_norm_mu_sigma.pth")
    if "normed_emb" in align:
        tsave({"weight": np.asarray(align["normed_emb"], np.float32)}, "gauss_norm.pth")
    tsave({"weight": np.asarray(params["llm"]["tok_embeddings"], np.float32)},
          "token_embedding.pth")
    tsave(projector_to_reference_sd(params["projector"]), "mlp1.pth")
    tsave({k[len("vision_model."):]: v for k, v in
           vit_to_reference_sd(params["vision"], cfg.vision).items()}, "vit_model.pt")
    if "resampler" in params:
        tsave({k[len("resampler."):]: v for k, v in
               resampler_to_reference_sd(params["resampler"], cfg.resampler).items()},
              "callialign.pth")
    if "orderformer" in params:
        tsave(orderformer_to_reference_sd(params["orderformer"],
                                          cfg.orderformer.num_layers),
              "orderformer.pth")
    if "detector" in params:
        tsave({"model": detector_to_ultralytics_sd(params["detector"])}, "best.pt")
    return out_dir


def export_reference_format(
    params: Dict[str, Any],
    cfg: VLMConfig,
    out_dir: str,
    *,
    merge_lora_first: bool = True,
    max_shard_bytes: Optional[int] = None,
) -> str:
    """Write model.safetensors with the reference's key layout (the
    'convert_to_official' deployable export)."""
    from safetensors.numpy import save_file

    from callireader_tpu.train.lora import merge_lora

    llm = params["llm"]
    if any(k.endswith("_q") for k in llm["layers"]):
        # QLoRA-trained base: fold int8 back to dense bf16 so the adapters
        # can merge and the export carries reference-layout dense tensors
        from callireader_tpu.runtime.quantize import dequantize_llm_int8

        llm = dequantize_llm_int8(llm)
    if merge_lora_first and any("_lora_" in k for k in llm["layers"]):
        llm = merge_lora(llm)

    sd: Dict[str, np.ndarray] = {}
    sd.update(llm_to_reference_sd(llm, cfg.llm))
    sd.update(vit_to_reference_sd(params["vision"], cfg.vision))
    sd.update(projector_to_reference_sd(params["projector"]))
    if "resampler" in params:
        sd.update(resampler_to_reference_sd(params["resampler"], cfg.resampler))
    if "align" in params:
        sd["normed_emb.weight"] = np.asarray(params["align"]["normed_emb"], np.float32)

    os.makedirs(out_dir, exist_ok=True)
    # safetensors serializes raw buffers: transposed views must be materialized
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}

    # shard by size (tools/model_converters/split.py parity); single file when
    # everything fits
    shards: list[Dict[str, np.ndarray]] = [{}]
    size = 0
    for k, v in sd.items():
        if max_shard_bytes and size + v.nbytes > max_shard_bytes and shards[-1]:
            shards.append({})
            size = 0
        shards[-1][k] = v
        size += v.nbytes

    weight_map = {}
    if len(shards) == 1:
        path = os.path.join(out_dir, "model.safetensors")
        save_file(shards[0], path)
        weight_map = {k: "model.safetensors" for k in sd}
    else:
        n = len(shards)
        for i, shard in enumerate(shards):
            name = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
            save_file(shard, os.path.join(out_dir, name))
            weight_map.update({k: name for k in shard})
        path = os.path.join(out_dir, f"model-00001-of-{n:05d}.safetensors")

    index = {
        "metadata": {"total_size": int(sum(v.nbytes for v in sd.values()))},
        "weight_map": weight_map,
    }
    with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
        json.dump(index, f, indent=2)
    return path


def consolidate_safetensors_dtype(src_dir: str, out_dir: str, dtype: Optional[str] = "float32",
                                  max_shard_bytes: Optional[int] = None) -> str:
    """Re-write a safetensors export with all float tensors cast to ``dtype``
    and optionally resharded.

    TPU-native stand-in for the reference's ZeRO-shard consolidation
    (train/xtuner/utils/zero_to_any_dtype.py:1-696): sharded JAX training
    state is already consolidated by orbax on restore, so the remaining job
    is the dtype cast + reshard of the deployable export. Also covers
    tools/model_converters/split.py when ``max_shard_bytes`` is set.
    """
    import glob

    from safetensors.numpy import load_file, save_file

    target = None if dtype is None else np.dtype(
        jnp.bfloat16 if dtype == "bfloat16" else dtype
    )

    def is_float(v):
        return np.issubdtype(v.dtype, np.floating) or v.dtype == jnp.bfloat16

    sd: Dict[str, np.ndarray] = {}
    for path in sorted(glob.glob(os.path.join(src_dir, "*.safetensors"))):
        for k, v in load_file(path).items():
            sd[k] = v.astype(target) if target is not None and is_float(v) else v

    os.makedirs(out_dir, exist_ok=True)
    shards: list = [{}]
    size = 0
    for k, v in sd.items():
        if max_shard_bytes and size + v.nbytes > max_shard_bytes and shards[-1]:
            shards.append({})
            size = 0
        shards[-1][k] = np.ascontiguousarray(v)
        size += v.nbytes
    weight_map = {}
    if len(shards) == 1:
        save_file(shards[0], os.path.join(out_dir, "model.safetensors"))
        weight_map = {k: "model.safetensors" for k in sd}
    else:
        n = len(shards)
        for i, shard in enumerate(shards):
            name = f"model-{i + 1:05d}-of-{n:05d}.safetensors"
            save_file(shard, os.path.join(out_dir, name))
            weight_map.update({k: name for k in shard})
    with open(os.path.join(out_dir, "model.safetensors.index.json"), "w") as f:
        json.dump({"metadata": {"total_size": int(sum(v.nbytes for v in sd.values()))},
                   "weight_map": weight_map}, f, indent=2)
    return out_dir
