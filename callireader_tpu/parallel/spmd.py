"""SPMD orchestration: mesh + sharded params + sharded train/infer programs.

The TPU-native replacement for the reference's torchrun + DeepSpeed + NCCL
stack (entry_point.py:274-293, engine/_strategy/deepspeed.py): a single
controller builds one Mesh, annotates the param pytree with logical axes,
and jits SPMD programs — GSPMD inserts every collective over ICI/DCN.

Mesh axes: data (DP), fsdp (ZeRO-style param/optimizer sharding),
tensor (TP), seq (Ulysses SP; see parallel/ulysses.py).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from callireader_tpu.core import partition as part
from callireader_tpu.core.config import VLMConfig
from callireader_tpu.models import internlm2, internvit, projector, resampler


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (TPU pod slices): the single-controller analog of
    the reference's torchrun rendezvous (entry_point.py:284-293). On Cloud TPU
    the arguments are auto-detected from the metadata server; pass them
    explicitly elsewhere. After this, jax.devices() spans the slice and every
    Mesh/GSPMD program below works unchanged (collectives ride ICI within a
    slice and DCN across slices)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(shape: Optional[Mapping[str, int]] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = {"data": n, "fsdp": 1, "tensor": 1, "seq": 1}
    return part.make_mesh(shape, devices)


def engine_logical_axes(cfg: VLMConfig, params: Dict[str, Any]) -> Dict[str, Any]:
    """Logical-axis tree matching the engine param structure. Components
    without bespoke annotations are replicated."""
    axes: Dict[str, Any] = {}
    for name, sub in params.items():
        if name == "llm":
            a = internlm2.logical_axes(cfg.llm)
            if any(k.endswith("_q") for k in sub["layers"]) or "output_q" in sub:
                # int8 weights: _q leaves inherit the base spec, scales
                # replicate except over the out-channel axis
                from callireader_tpu.runtime.quantize import quantized_logical_axes

                a = quantized_logical_axes(a, sub)
            # extend for any LoRA leaves present
            for leaf in sub["layers"]:
                if leaf not in a["layers"]:
                    if leaf.endswith("_lora_a"):
                        a["layers"][leaf] = ("stack", "embed", None)
                    elif leaf.endswith("_lora_b"):
                        a["layers"][leaf] = ("stack", None, None)
                    else:
                        a["layers"][leaf] = ("stack",)
            axes[name] = a
        elif name in ("vision", "char_vision"):
            vcfg = (cfg.char_vision if name == "char_vision"
                    and cfg.char_vision is not None else cfg.vision)
            a = internvit.logical_axes(vcfg)
            if any(k.endswith("_kernel_q") for k in sub["layers"]):
                from callireader_tpu.runtime.quantize import (
                    quantized_vit_logical_axes,
                )

                a = quantized_vit_logical_axes(a, sub)
            axes[name] = a
        elif name in ("projector", "char_projector"):
            axes[name] = projector.logical_axes(cfg)
        elif name == "resampler":
            axes[name] = resampler.logical_axes(cfg.resampler)
        elif name == "align":
            axes[name] = {"normed_emb": ("vocab", "embed"), "mu": (None,), "sigma": (None,)}
        else:  # detector, orderformer: tiny — replicate
            axes[name] = jax.tree.map(lambda _: None, sub)
    return axes


def shard_tree(tree: Any, axes: Any, mesh: Mesh, rules=part.DEFAULT_RULES) -> Any:
    """device_put a pytree by logical annotations (None axes -> replicated).
    Dims not divisible by their mesh axis fall back to replication (e.g. the
    odd 92553-row vocab tables)."""

    def put(x, a):
        shape = tuple(getattr(x, "shape", ()) or ())
        spec = part.spec_for_shape(shape, a, rules, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(
        put, tree, axes,
        is_leaf=lambda x: x is None or (
            isinstance(x, tuple) and all(isinstance(e, (str, type(None))) for e in x)
        ),
    )


def batch_sharding(mesh: Mesh, seq_sharded: bool = False):
    """Shard train batches: leading dim over data, optionally sequence
    dim over seq."""

    def spec_for(x):
        if x.ndim >= 2 and seq_sharded and mesh.shape.get("seq", 1) > 1:
            return NamedSharding(mesh, P("data", "seq"))
        if x.ndim >= 1:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    return spec_for


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh, seq_sharded: bool = False):
    """Put a host batch onto the mesh. Token arrays (B, S) shard batch over
    data×fsdp (and seq when requested); flat payload arrays (pixel_values,
    pseudo_embeds) are replicated — their slot order is batch-global."""
    out = {}
    for k, v in batch.items():
        if k in ("pixel_values", "pseudo_embeds"):
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
        else:
            spec = [None] * v.ndim
            spec[0] = "data"
            if seq_sharded and v.ndim >= 2 and mesh.shape.get("seq", 1) > 1:
                spec[1] = "seq"
            out[k] = jax.device_put(v, NamedSharding(mesh, P(*spec)))
    return out
