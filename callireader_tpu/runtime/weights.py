"""Checkpoint ingestion: reference torch/safetensors layouts -> JAX pytrees.

The deployed reference checkpoint (InternVL/model.safetensors.index.json) holds:
  language_model.model.layers.N.attention.{wqkv,wo}.weight   (fused GQA qkv)
  language_model.model.layers.N.feed_forward.{w1,w2,w3}.weight
  language_model.model.{norm,tok_embeddings}.weight, language_model.output.weight
  vision_model.embeddings.*, vision_model.encoder.layers.N.*
  mlp1.{0,1,3}.*          (LayerNorm, Linear, GELU, Linear)
  resampler.*             (perceiver layers, learns, final norm)
  normed_emb.weight       (normalized token-embedding VQ table)
plus side files (config/configu.py:7-13):
  gauss_norm_mu_sigma.pth {'weight': (V, 2)}  -> mu, sigma
  orderformer.pth          torch TransformerEncoder state dict
  best.pt                  ultralytics YOLO checkpoint

Everything is converted to numpy first; torch is only required for .pth/pickle
payloads (it is a build/convert-time dependency, never on the TPU hot path).

The fused-wqkv de-interleave mirrors modeling_internlm2.py:364-373:
rows are laid out per-kv-head as [G query heads | k | v] x head_dim.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import numpy as np

from callireader_tpu.core.config import LLMConfig, ResamplerConfig, VisionConfig, VLMConfig


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor
    return x.detach().to("cpu").float().numpy()


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors shards in a directory into one dict."""
    from safetensors import safe_open

    out: Dict[str, np.ndarray] = {}
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        shards = sorted(set(json.load(open(index))["weight_map"].values()))
    else:
        shards = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="numpy") as f:
            for k in f.keys():
                t = f.get_tensor(k)
                if t.dtype == np.dtype("bfloat16") if hasattr(np, "bfloat16") else False:
                    t = t.astype(np.float32)
                out[k] = t
    return out


def load_torch_pth(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        k = k[len("module."):] if k.startswith("module.") else k
        try:
            out[k] = _np(v)
        except Exception:
            pass
    return out


def _stack(sd: Dict[str, np.ndarray], pattern: str, num: int) -> np.ndarray:
    return np.stack([sd[pattern.format(i)] for i in range(num)])


# ---------------------------------------------------------------------------
# LLM
# ---------------------------------------------------------------------------


def split_wqkv(wqkv: np.ndarray, cfg: LLMConfig):
    """(out=(Hq+2Hkv)*D, E) torch layout -> wq (E, Hq*D), wk, wv (E, Hkv*D)."""
    Hkv, G, D = cfg.num_key_value_heads, cfg.num_query_groups, cfg.head_dim
    E = wqkv.shape[1]
    w = wqkv.reshape(Hkv, G + 2, D, E)
    wq = w[:, :G].reshape(Hkv * G * D, E).T
    wk = w[:, G].reshape(Hkv * D, E).T
    wv = w[:, G + 1].reshape(Hkv * D, E).T
    return wq, wk, wv


def fuse_wqkv(wq: np.ndarray, wk: np.ndarray, wv: np.ndarray, cfg: LLMConfig) -> np.ndarray:
    """Inverse of split_wqkv (for exporting back to reference format)."""
    Hkv, G, D = cfg.num_key_value_heads, cfg.num_query_groups, cfg.head_dim
    E = wq.shape[0]
    q = wq.T.reshape(Hkv, G, D, E)
    k = wk.T.reshape(Hkv, 1, D, E)
    v = wv.T.reshape(Hkv, 1, D, E)
    return np.concatenate([q, k, v], axis=1).reshape(-1, E)


def convert_llm(sd: Dict[str, np.ndarray], cfg: LLMConfig, prefix: str = "language_model.") -> Dict:
    L = cfg.num_hidden_layers
    p = prefix

    wq, wk, wv = [], [], []
    for i in range(L):
        a, b, c = split_wqkv(sd[f"{p}model.layers.{i}.attention.wqkv.weight"], cfg)
        wq.append(a), wk.append(b), wv.append(c)

    return {
        "tok_embeddings": sd[f"{p}model.tok_embeddings.weight"],
        "layers": {
            "attn_norm": _stack(sd, p + "model.layers.{}.attention_norm.weight", L),
            "ffn_norm": _stack(sd, p + "model.layers.{}.ffn_norm.weight", L),
            "wq": np.stack(wq),
            "wk": np.stack(wk),
            "wv": np.stack(wv),
            "wo": np.stack(
                [sd[f"{p}model.layers.{i}.attention.wo.weight"].T for i in range(L)]
            ),
            "w1": np.stack(
                [sd[f"{p}model.layers.{i}.feed_forward.w1.weight"].T for i in range(L)]
            ),
            "w3": np.stack(
                [sd[f"{p}model.layers.{i}.feed_forward.w3.weight"].T for i in range(L)]
            ),
            "w2": np.stack(
                [sd[f"{p}model.layers.{i}.feed_forward.w2.weight"].T for i in range(L)]
            ),
        },
        "norm": sd[f"{p}model.norm.weight"],
        "output": sd[f"{p}output.weight"],
    }


# ---------------------------------------------------------------------------
# ViT / projector / resampler / align
# ---------------------------------------------------------------------------


def convert_vit(sd: Dict[str, np.ndarray], cfg: VisionConfig, prefix: str = "vision_model.") -> Dict:
    L = cfg.num_hidden_layers
    p = prefix
    conv_w = sd[f"{p}embeddings.patch_embedding.weight"]  # (E, C, P, P)
    E = conv_w.shape[0]
    return {
        "patch_embed": {
            "kernel": conv_w.reshape(E, -1).T,  # (C*P*P, E), (c,kh,kw) order
            "bias": sd[f"{p}embeddings.patch_embedding.bias"],
        },
        "cls_token": sd[f"{p}embeddings.class_embedding"],
        "pos_embed": sd[f"{p}embeddings.position_embedding"],
        "layers": {
            "norm1_scale": _stack(sd, p + "encoder.layers.{}.norm1.weight", L),
            "norm1_bias": _stack(sd, p + "encoder.layers.{}.norm1.bias", L),
            "norm2_scale": _stack(sd, p + "encoder.layers.{}.norm2.weight", L),
            "norm2_bias": _stack(sd, p + "encoder.layers.{}.norm2.bias", L),
            "qkv_kernel": np.stack(
                [sd[f"{p}encoder.layers.{i}.attn.qkv.weight"].T for i in range(L)]
            ),
            "qkv_bias": _stack(sd, p + "encoder.layers.{}.attn.qkv.bias", L),
            "proj_kernel": np.stack(
                [sd[f"{p}encoder.layers.{i}.attn.proj.weight"].T for i in range(L)]
            ),
            "proj_bias": _stack(sd, p + "encoder.layers.{}.attn.proj.bias", L),
            "fc1_kernel": np.stack(
                [sd[f"{p}encoder.layers.{i}.mlp.fc1.weight"].T for i in range(L)]
            ),
            "fc1_bias": _stack(sd, p + "encoder.layers.{}.mlp.fc1.bias", L),
            "fc2_kernel": np.stack(
                [sd[f"{p}encoder.layers.{i}.mlp.fc2.weight"].T for i in range(L)]
            ),
            "fc2_bias": _stack(sd, p + "encoder.layers.{}.mlp.fc2.bias", L),
            "ls1": _stack(sd, p + "encoder.layers.{}.ls1", L),
            "ls2": _stack(sd, p + "encoder.layers.{}.ls2", L),
        },
    }


def convert_projector(sd: Dict[str, np.ndarray], prefix: str = "mlp1.") -> Dict:
    p = prefix
    return {
        "ln_scale": sd[f"{p}0.weight"],
        "ln_bias": sd[f"{p}0.bias"],
        "fc1_kernel": sd[f"{p}1.weight"].T,
        "fc1_bias": sd[f"{p}1.bias"],
        "fc2_kernel": sd[f"{p}3.weight"].T,
        "fc2_bias": sd[f"{p}3.bias"],
    }


def convert_resampler(sd: Dict[str, np.ndarray], cfg: ResamplerConfig, prefix: str = "resampler.") -> Dict:
    L = cfg.depth
    p = prefix
    return {
        "learns": sd[f"{p}learns"],
        "layers": {
            "norm_media_scale": _stack(sd, p + "layers.{}.0.norm_media.weight", L),
            "norm_media_bias": _stack(sd, p + "layers.{}.0.norm_media.bias", L),
            "norm_learns_scale": _stack(sd, p + "layers.{}.0.norm_learns.weight", L),
            "norm_learns_bias": _stack(sd, p + "layers.{}.0.norm_learns.bias", L),
            "to_q": np.stack([sd[f"{p}layers.{i}.0.to_q.weight"].T for i in range(L)]),
            "to_kv": np.stack([sd[f"{p}layers.{i}.0.to_kv.weight"].T for i in range(L)]),
            "to_out": np.stack([sd[f"{p}layers.{i}.0.to_out.weight"].T for i in range(L)]),
            "ff_norm_scale": _stack(sd, p + "layers.{}.1.net.0.weight", L),
            "ff_norm_bias": _stack(sd, p + "layers.{}.1.net.0.bias", L),
            "ff1": np.stack([sd[f"{p}layers.{i}.1.net.1.weight"].T for i in range(L)]),
            "ff1_bias": _stack(sd, p + "layers.{}.1.net.1.bias", L),
            "ff2": np.stack([sd[f"{p}layers.{i}.1.net.3.weight"].T for i in range(L)]),
            "ff2_bias": _stack(sd, p + "layers.{}.1.net.3.bias", L),
        },
        "norm_scale": sd[f"{p}norm.weight"],
        "norm_bias": sd[f"{p}norm.bias"],
    }


def convert_orderformer(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    L = num_layers
    return {
        "embed_kernel": sd["embedding.weight"].T,
        "embed_bias": sd["embedding.bias"],
        "layers": {
            "in_proj_kernel": np.stack(
                [sd[f"transformer_encoder.layers.{i}.self_attn.in_proj_weight"].T for i in range(L)]
            ),
            "in_proj_bias": _stack(sd, "transformer_encoder.layers.{}.self_attn.in_proj_bias", L),
            "out_proj_kernel": np.stack(
                [sd[f"transformer_encoder.layers.{i}.self_attn.out_proj.weight"].T for i in range(L)]
            ),
            "out_proj_bias": _stack(sd, "transformer_encoder.layers.{}.self_attn.out_proj.bias", L),
            "norm1_scale": _stack(sd, "transformer_encoder.layers.{}.norm1.weight", L),
            "norm1_bias": _stack(sd, "transformer_encoder.layers.{}.norm1.bias", L),
            "norm2_scale": _stack(sd, "transformer_encoder.layers.{}.norm2.weight", L),
            "norm2_bias": _stack(sd, "transformer_encoder.layers.{}.norm2.bias", L),
            "ff1_kernel": np.stack(
                [sd[f"transformer_encoder.layers.{i}.linear1.weight"].T for i in range(L)]
            ),
            "ff1_bias": _stack(sd, "transformer_encoder.layers.{}.linear1.bias", L),
            "ff2_kernel": np.stack(
                [sd[f"transformer_encoder.layers.{i}.linear2.weight"].T for i in range(L)]
            ),
            "ff2_bias": _stack(sd, "transformer_encoder.layers.{}.linear2.bias", L),
        },
        "decode_kernel": sd["decoder.weight"].T,
        "decode_bias": sd["decoder.bias"],
    }


# ---------------------------------------------------------------------------
# full model assembly
# ---------------------------------------------------------------------------


def discover_side_files(internvl_dir: str) -> Dict[str, str]:
    """Locate the reference's torch side files next to a checkpoint dir
    (config/configu.py:7-13,61-62 keeps them under ./params). Checks
    ``<dir>/params/<name>`` then ``<dir>/<name>``."""
    names = {
        "mu_sigma": "gauss_norm_mu_sigma.pth",
        "orderformer": "orderformer.pth",
        "detector": "best.pt",
    }
    out: Dict[str, str] = {}
    for key, fname in names.items():
        for cand in (os.path.join(internvl_dir, "params", fname),
                     os.path.join(internvl_dir, fname)):
            if os.path.exists(cand):
                out[key] = cand
                break
    return out


def convert_reference_checkpoint(
    internvl_dir: str,
    cfg: VLMConfig,
    *,
    mu_sigma_path: Optional[str] = None,
    orderformer_path: Optional[str] = None,
    detector_path: Optional[str] = None,
    dtype=np.float32,
) -> Dict[str, Any]:
    """Build the engine param pytree from a deployed reference checkpoint.
    Side files (gauss_norm_mu_sigma.pth, orderformer.pth, best.pt) not passed
    explicitly are auto-discovered under ``<dir>/params/`` or ``<dir>/``."""
    side = discover_side_files(internvl_dir)
    mu_sigma_path = mu_sigma_path or side.get("mu_sigma")
    orderformer_path = orderformer_path or side.get("orderformer")
    detector_path = detector_path or side.get("detector")
    sd = load_safetensors_dir(internvl_dir)
    params: Dict[str, Any] = {
        "llm": convert_llm(sd, cfg.llm),
        "vision": convert_vit(sd, cfg.vision),
        "projector": convert_projector(sd),
    }
    if "resampler.learns" in sd:
        params["resampler"] = convert_resampler(sd, cfg.resampler)
    if "normed_emb.weight" in sd:
        params.setdefault("align", {})["normed_emb"] = sd["normed_emb.weight"]
    if mu_sigma_path:
        ms = load_torch_pth(mu_sigma_path)["weight"]  # (V, 2)
        params.setdefault("align", {})["mu"] = ms[:, 0]
        params["align"]["sigma"] = ms[:, 1]
    if orderformer_path:
        params["orderformer"] = convert_orderformer(
            load_torch_pth(orderformer_path), cfg.orderformer.num_layers
        )
    if detector_path:
        from callireader_tpu.runtime.detector_weights import load_detector

        params["detector"] = load_detector(detector_path)

    import jax
    import jax.numpy as jnp

    def cast(x):
        return jnp.asarray(x, dtype=dtype)

    # the tiny host-side priors (detector / orderformer) run in float32 —
    # casting them to bf16 would shift box/order decisions vs their training
    f32 = {k: jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params.pop(k))
           for k in ("detector", "orderformer") if k in params}
    out = jax.tree.map(cast, params)
    out.update(f32)
    return out
