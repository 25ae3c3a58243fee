"""MoE expert-shard checkpoint I/O.

Parity target: /root/reference/train/xtuner/utils/handle_moe_load_and_save.py —
the reference merges per-expert HF weights (Mixtral naming,
``...block_sparse_moe.experts.{e}.{w1,w2,w3}.weight``) into per-shard fused
tensors (``...experts.{shard}.w1w3.weight`` (n, 2M, E) +
``...experts.{shard}.w2.weight`` (n, E, M)) so each expert-parallel rank
saves/loads only its shard (:60-96 _merge_experts_weight,
:49-58 _get_merged_param_name).

TPU-native: our MoE params are already expert-stacked ((L, X, ...) leaves,
models/moe.py) and sharded over the "expert" mesh axis by GSPMD, so
save/restore of the sharded arrays goes through orbax natively
(save_sharded/restore_sharded). The converters below provide the on-disk
interop with both reference layouts: per-expert HF and merged expert-shard.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from callireader_tpu.models.moe import MoEConfig

_PREFIX = "model.layers.{l}.block_sparse_moe"


def moe_to_hf_experts(params: Dict[str, Any], cfg: MoEConfig) -> Dict[str, np.ndarray]:
    """Stacked (L, X, ...) expert weights -> per-expert Mixtral-style state
    dict (torch Linear (out, in) orientation). Router maps to ``gate``."""
    lay = params["layers"]
    L, X = cfg.llm.num_hidden_layers, cfg.num_experts
    sd: Dict[str, np.ndarray] = {}
    w1 = np.asarray(lay["w1"])  # (L, X, E, M) in,out
    w3 = np.asarray(lay["w3"])
    w2 = np.asarray(lay["w2"])  # (L, X, M, E)
    router = np.asarray(lay["router"])  # (L, E, X)
    for l in range(L):
        base = _PREFIX.format(l=l)
        sd[f"{base}.gate.weight"] = router[l].T  # (X, E)
        for e in range(X):
            sd[f"{base}.experts.{e}.w1.weight"] = w1[l, e].T  # (M, E)
            sd[f"{base}.experts.{e}.w3.weight"] = w3[l, e].T
            sd[f"{base}.experts.{e}.w2.weight"] = w2[l, e].T  # (E, M)
    return sd


def hf_experts_to_moe(
    sd: Dict[str, np.ndarray], cfg: MoEConfig, dtype=np.float32
) -> Dict[str, np.ndarray]:
    """Inverse of moe_to_hf_experts: per-expert state dict -> stacked leaves
    {"w1", "w3", "w2", "router"} ready to drop into params["layers"]."""
    llm = cfg.llm
    L, X, E, M = llm.num_hidden_layers, cfg.num_experts, llm.hidden_size, llm.intermediate_size
    w1 = np.zeros((L, X, E, M), dtype)
    w3 = np.zeros((L, X, E, M), dtype)
    w2 = np.zeros((L, X, M, E), dtype)
    router = np.zeros((L, E, X), dtype)
    for l in range(L):
        base = _PREFIX.format(l=l)
        router[l] = np.asarray(sd[f"{base}.gate.weight"]).T
        for e in range(X):
            w1[l, e] = np.asarray(sd[f"{base}.experts.{e}.w1.weight"]).T
            w3[l, e] = np.asarray(sd[f"{base}.experts.{e}.w3.weight"]).T
            w2[l, e] = np.asarray(sd[f"{base}.experts.{e}.w2.weight"]).T
    return {"w1": w1, "w3": w3, "w2": w2, "router": router}


def merge_expert_shards(
    sd: Dict[str, np.ndarray], experts_per_shard: int
) -> Dict[str, np.ndarray]:
    """Per-expert -> merged expert-shard format (_merge_experts_weight):
    for each group of ``experts_per_shard`` experts, a fused
    ``experts.{shard}.w1w3.weight`` (n, 2M, E) + ``experts.{shard}.w2.weight``
    (n, E, M); non-expert entries pass through."""
    out: Dict[str, np.ndarray] = {}
    expert_keys = sorted(
        [k for k in sd if ".experts." in k],
        key=lambda k: (k.split(".experts.")[0], int(k.split(".experts.")[1].split(".")[0]),
                       k.rsplit(".", 2)[-2]),
    )
    for k in sd:
        if ".experts." not in k:
            out[k] = sd[k]
    by_layer: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    for k in expert_keys:
        base, rest = k.split(".experts.")
        e, w, _ = rest.split(".")
        by_layer.setdefault(base, {}).setdefault(int(e), {})[w] = sd[k]
    for base, experts in by_layer.items():
        n_exp = len(experts)
        assert n_exp % experts_per_shard == 0, (n_exp, experts_per_shard)
        for shard in range(n_exp // experts_per_shard):
            lo = shard * experts_per_shard
            grp = [experts[lo + i] for i in range(experts_per_shard)]
            w1 = np.stack([g["w1"] for g in grp])  # (n, M, E)
            w3 = np.stack([g["w3"] for g in grp])
            out[f"{base}.experts.{shard}.w1w3.weight"] = np.concatenate([w1, w3], axis=1)
            out[f"{base}.experts.{shard}.w2.weight"] = np.stack([g["w2"] for g in grp])
    return out


def split_expert_shards(
    sd: Dict[str, np.ndarray], experts_per_shard: int
) -> Dict[str, np.ndarray]:
    """Inverse of merge_expert_shards: fused shard tensors -> per-expert
    w1/w3/w2 entries (the load path of handle_moe_load_and_save)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if ".experts." not in k:
            out[k] = v
            continue
        base, rest = k.split(".experts.")
        shard_s, w, _ = rest.split(".")
        shard = int(shard_s)
        if w == "w1w3":
            M2 = v.shape[1]
            for i in range(experts_per_shard):
                e = shard * experts_per_shard + i
                out[f"{base}.experts.{e}.w1.weight"] = v[i, : M2 // 2]
                out[f"{base}.experts.{e}.w3.weight"] = v[i, M2 // 2 :]
        elif w == "w2":
            for i in range(experts_per_shard):
                e = shard * experts_per_shard + i
                out[f"{base}.experts.{e}.w2.weight"] = v[i]
        else:
            raise KeyError(k)
    return out


def save_sharded(path: str, params: Any) -> None:
    """Orbax save of (possibly expert-sharded) MoE params — sharded arrays
    save natively; on restore, pass a template carrying the target
    shardings."""
    from callireader_tpu.train.checkpoint import save_params

    save_params(path, params)


def restore_sharded(path: str, template: Any) -> Any:
    from callireader_tpu.train.checkpoint import restore_params

    return restore_params(path, template)
