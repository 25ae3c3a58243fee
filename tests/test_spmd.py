"""SPMD helpers: logical-axis resolution, param sharding, batch sharding."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from callireader_tpu.core import partition as part
from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.parallel import spmd
from callireader_tpu.runtime.engine import init_all_params

CFG = callireader_tiny()


def test_resolve_spec_degenerate_axes_replicate():
    mesh = part.make_mesh({"data": 8, "fsdp": 1, "tensor": 1, "seq": 1})
    spec = part.resolve_spec(("stack", "embed", "mlp"), mesh=mesh)
    # fsdp/tensor are size 1 -> replicated
    assert spec == P(None, None, None)
    mesh2 = part.make_mesh({"data": 2, "fsdp": 2, "tensor": 2, "seq": 1})
    spec2 = part.resolve_spec(("stack", "embed", "mlp"), mesh=mesh2)
    assert spec2 == P(None, "fsdp", "tensor")


def test_shard_tree_covers_engine_params():
    mesh = part.make_mesh({"data": 2, "fsdp": 2, "tensor": 2, "seq": 1})
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    axes = spmd.engine_logical_axes(CFG, params)
    sharded = spmd.shard_tree(params, axes, mesh)
    w1 = sharded["llm"]["layers"]["w1"]
    assert w1.sharding.spec == P(None, "fsdp", "tensor")
    # detector stays replicated
    det = sharded["detector"]["backbone"]["stem"]["w"]
    assert det.sharding.spec == P()


def test_shard_batch_specs():
    mesh = part.make_mesh({"data": 4, "fsdp": 1, "tensor": 2, "seq": 1})
    batch = {
        "input_ids": np.zeros((8, 16), np.int32),
        "pixel_values": np.zeros((8, 4, 4, 3), np.float32),
    }
    out = spmd.shard_batch(batch, mesh)
    assert out["input_ids"].sharding.spec == P("data", None)
    assert out["pixel_values"].sharding.spec == P()
