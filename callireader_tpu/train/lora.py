"""LoRA adapters for the LLM layer stack.

Parity target: the reference's e-IT recipe (train/xtuner/model/internvl.py:120-138
via peft: r=128, alpha=256, dropout 0.05, targeting every linear in the frozen
LLM; configs/internvl/v2/e-IT.py:32-46).

TPU-native design: adapters live as extra stacked leaves inside
``params["llm"]["layers"]`` (``wq_lora_a`` (L, E, r), ``wq_lora_b`` (L, r, out),
plus a scalar ``lora_scale``) so the existing lax.scan layer body picks them up
with zero code duplication (models/internlm2.py:_proj). Merging back to dense
weights for export is a single einsum per projection.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from callireader_tpu.core.config import LLMConfig

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def add_lora(
    llm_params: Dict[str, Any],
    cfg: LLMConfig,
    key: jax.Array,
    *,
    rank: int = 128,
    alpha: float = 256.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Returns a new params tree with LoRA leaves added (A ~ N(0, 1/r), B = 0,
    peft-style)."""
    layers = dict(llm_params["layers"])
    L = layers["wq"].shape[0]
    ks = jax.random.split(key, len(targets))
    for k, name in zip(ks, targets):
        w = layers[name]
        _, d_in, d_out = w.shape
        a = jax.random.normal(k, (L, d_in, rank), jnp.float32) * (1.0 / rank)
        layers[f"{name}_lora_a"] = a.astype(dtype)
        layers[f"{name}_lora_b"] = jnp.zeros((L, rank, d_out), dtype)
    layers["lora_scale"] = jnp.full((L,), alpha / rank, dtype)
    out = dict(llm_params)
    out["layers"] = layers
    return out


def lora_param_names(targets: Sequence[str] = DEFAULT_TARGETS) -> List[str]:
    names = [f"{n}_lora_{ab}" for n in targets for ab in ("a", "b")]
    return names + ["lora_scale"]


def merge_lora(llm_params: Dict[str, Any], targets: Sequence[str] = DEFAULT_TARGETS) -> Dict[str, Any]:
    """Fold adapters into the dense weights and drop the LoRA leaves
    (the TPU equivalent of peft merge_and_unload, used by the reference's
    convert_to_official.py:15-38)."""
    layers = dict(llm_params["layers"])
    scale = layers.get("lora_scale")
    for name in targets:
        a = layers.pop(f"{name}_lora_a", None)
        b = layers.pop(f"{name}_lora_b", None)
        if a is None:
            continue
        delta = jnp.einsum("lir,lro->lio", a.astype(jnp.float32), b.astype(jnp.float32))
        delta = delta * scale[:, None, None].astype(jnp.float32)
        layers[name] = (layers[name].astype(jnp.float32) + delta).astype(layers[name].dtype)
    layers.pop("lora_scale", None)
    out = dict(llm_params)
    out["layers"] = layers
    return out


def lora_logical_axes(llm_axes: Dict[str, Any], targets: Sequence[str] = DEFAULT_TARGETS) -> Dict[str, Any]:
    """Extend the LLM logical-axis tree with LoRA leaf annotations."""
    layers = dict(llm_axes["layers"])
    for name in targets:
        layers[f"{name}_lora_a"] = ("stack", "embed", None)
        layers[f"{name}_lora_b"] = ("stack", None, "qkv" if name.startswith("w" ) and name in ("wq","wk","wv","wo") else "mlp")
    layers["lora_scale"] = ("stack",)
    out = dict(llm_axes)
    out["layers"] = layers
    return out
