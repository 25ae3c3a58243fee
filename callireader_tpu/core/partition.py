"""Logical-axis sharding: the t5x/maxtext recipe, minimal form.

Every parameter leaf is annotated with a tuple of *logical* axis names at init
time (stored in a parallel pytree of ``jax.sharding.PartitionSpec``-compatible
tuples). A rule table maps logical names onto mesh axes; ``logical_to_sharding``
resolves the actual ``NamedSharding`` per leaf. XLA/GSPMD then inserts all
collectives — this is the TPU-native replacement for the reference's explicit
NCCL plumbing (train/xtuner/parallel/sequence/comm.py).

Mesh axes used throughout:
  "data"    data parallelism (batch)           — maps DeepSpeed ZeRO DP
  "fsdp"    parameter/optimizer state sharding — maps ZeRO-1/2/3
  "tensor"  tensor parallelism (heads / mlp)   — absent in the reference
            (it had no TP at all; GSPMD gives it to us for free)
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

# logical axis -> mesh axis (or None = replicated)
DEFAULT_RULES: Tuple[Tuple[str, Optional[str]], ...] = (
    ("batch", "data"),
    ("seq", None),  # set to "seq" mesh axis for sequence parallelism
    ("embed", "fsdp"),
    ("heads", "tensor"),
    ("kv_heads", "tensor"),
    ("head_dim", None),
    ("qkv", "tensor"),
    ("mlp", "tensor"),
    ("vocab", "tensor"),
    ("expert", "expert"),
    ("vit_embed", None),
    ("vit_mlp", "tensor"),
    ("norm", None),
    ("patch", None),
    ("stack", None),  # scan-stacked layer axis
)


def make_mesh(
    shape: Optional[Mapping[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a device mesh. Default: all devices on the "data" axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"data": len(devices), "fsdp": 1, "tensor": 1}
    axis_names = tuple(shape.keys())
    sizes = tuple(shape.values())
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh shape {shape} does not match {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names)


def resolve_spec(
    logical_axes: Optional[Tuple[Optional[str], ...]],
    rules: Sequence[Tuple[str, Optional[str]]] = DEFAULT_RULES,
    mesh: Optional[Mesh] = None,
) -> PartitionSpec:
    """Map a tuple of logical axis names to a PartitionSpec."""
    if logical_axes is None:
        return PartitionSpec()
    table = dict(rules)
    out = []
    for name in logical_axes:
        mesh_axis = table.get(name) if name is not None else None
        if mesh is not None and mesh_axis is not None and mesh.shape.get(mesh_axis, 1) == 1:
            mesh_axis = None  # degenerate axis: treat as replicated
        out.append(mesh_axis)
    return PartitionSpec(*out)


def spec_for_shape(
    shape: Tuple[int, ...],
    logical_axes: Optional[Tuple[Optional[str], ...]],
    rules: Sequence[Tuple[str, Optional[str]]] = DEFAULT_RULES,
    mesh: Optional[Mesh] = None,
) -> PartitionSpec:
    """resolve_spec + divisibility fallback: a dim whose size is not divisible
    by its mesh axis replicates instead (device_put rejects uneven shards).
    E.g. the odd 92553 vocab replicates over "tensor" while every other dim
    shards; pad the vocab to shard it too."""
    spec = resolve_spec(logical_axes, rules, mesh)
    if mesh is None:
        return spec
    out = []
    for i, axis in enumerate(spec):
        if axis is not None and i < len(shape) and shape[i] % mesh.shape[axis] != 0:
            axis = None
        out.append(axis)
    return PartitionSpec(*out)


def logical_to_sharding(
    logical_tree: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, Optional[str]]] = DEFAULT_RULES,
) -> Any:
    """Pytree of logical-axis tuples -> pytree of NamedSharding."""
    return jax.tree.map(
        lambda axes: NamedSharding(mesh, resolve_spec(axes, rules, mesh)),
        logical_tree,
        is_leaf=lambda x: x is None or (isinstance(x, tuple) and all(isinstance(a, (str, type(None))) for a in x)),
    )


def shard_params(params: Any, logical_tree: Any, mesh: Mesh, rules=DEFAULT_RULES) -> Any:
    """Device-put a param pytree according to its logical annotations."""
    shardings = logical_to_sharding(logical_tree, mesh, rules)
    return jax.tree.map(lambda p, s: jax.device_put(p, s), params, shardings)
