"""Ulysses sequence parallelism on the virtual 8-device mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.core import partition as part
from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.kernels.attention import attention_reference
from callireader_tpu.models import internlm2
from callireader_tpu.parallel import ulysses

CFG = callireader_tiny().llm


def test_a2a_matches_dense_attention():
    mesh = part.make_mesh({"data": 2, "seq": 4})
    B, Hq, Hkv, S, D = 2, 4, 2, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, S, D))
    k = jax.random.normal(ks[1], (B, Hkv, S, D))
    v = jax.random.normal(ks[2], (B, Hkv, S, D))
    out = ulysses.ulysses_attention(q, k, v, mesh, causal=True)
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_inner_sp_head_split():
    # kv heads (2) < sp (4): the inner-SP head-dim split path
    mesh = part.make_mesh({"data": 2, "seq": 4})
    B, Hq, Hkv, S, D = 1, 4, 2, 32, 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, Hq, S, D))
    k = jax.random.normal(ks[1], (B, Hkv, S, D))
    v = jax.random.normal(ks[2], (B, Hkv, S, D))
    # GQA repeat so Hq == Hkv inside the a2a (head split must divide sp)
    k4 = jnp.repeat(k, 2, axis=1)
    v4 = jnp.repeat(v, 2, axis=1)
    out = ulysses.ulysses_attention(q, k4, v4, mesh, causal=True)
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_full_forward_with_ulysses_attention():
    """internlm2.forward with the Ulysses attn_override over a seq-sharded
    batch equals the plain forward."""
    mesh = part.make_mesh({"data": 2, "seq": 4})
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 1000)

    base = internlm2.forward(params, CFG, input_ids=ids, policy=FP32_POLICY, use_flash=False)

    Hq, Hkv = CFG.num_attention_heads, CFG.num_key_value_heads

    def ulysses_attn(q, k, v):
        k = jnp.repeat(k, Hq // Hkv, axis=1)
        v = jnp.repeat(v, Hq // Hkv, axis=1)
        return ulysses.ulysses_attention(q, k, v, mesh, causal=True)

    with mesh:
        sharded = jax.jit(
            lambda p, i: internlm2.forward(
                p, CFG, input_ids=i, policy=FP32_POLICY, attn_override=ulysses_attn
            )
        )(params, ulysses.split_for_sequence_parallel(ids, mesh, dim=1))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=2e-4, rtol=2e-4)


def test_reduce_sequence_parallel_loss():
    out = ulysses.reduce_sequence_parallel_loss(jnp.asarray(10.0), jnp.asarray(5))
    assert float(out) == 2.0


def test_eit_train_step_with_sequence_parallel():
    """make_train_step(mesh with seq>1): the Ulysses-attention train step
    produces the same loss and moves params the same way as the plain step
    (tiny cfg, text-only batch, virtual 8-device mesh)."""
    import numpy as np

    from callireader_tpu.core.config import callireader_tiny
    from callireader_tpu.core.dtypes import FP32_POLICY
    from callireader_tpu.parallel import spmd
    from callireader_tpu.runtime.engine import init_all_params
    from callireader_tpu.train import e_it, lora

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")

    CFG = callireader_tiny()
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["llm"] = lora.add_lora(
        params["llm"], CFG.llm, jax.random.PRNGKey(1), rank=4, alpha=8
    )
    tc = e_it.TrainConfig(learning_rate=5e-3, total_steps=10, warmup_ratio=0.0, remat=False)

    B, S = 2, 64
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 1000, (B, S)).astype(np.int32)
    labels = np.where(np.arange(S)[None] >= S // 2, ids, e_it.IGNORE_INDEX).astype(np.int32)
    batch_np = {
        "input_ids": ids,
        "labels": labels,
        "segment_ids": np.zeros((B, S), np.int32),
        "positions": np.tile(np.arange(S, dtype=np.int32)[None], (B, 1)),
    }

    def run(mesh, seq_sharded):
        p = spmd.shard_tree(params, spmd.engine_logical_axes(CFG, params), mesh)
        state, frozen, tx = e_it.create_train_state(p, tc)
        step = jax.jit(e_it.make_train_step(
            CFG, tc, tx, policy=FP32_POLICY, use_flash=False,
            mesh=mesh if seq_sharded else None,
        ))
        b = spmd.shard_batch(dict(batch_np), mesh, seq_sharded=seq_sharded)
        with mesh:
            state, m = step(state, frozen, b)
        return float(m["loss"]), np.asarray(state.trainable["llm"]["layers"]["wq_lora_a"])

    plain_mesh = spmd.make_mesh({"data": 2, "fsdp": 2, "tensor": 2, "seq": 1})
    sp_mesh = spmd.make_mesh({"data": 2, "fsdp": 1, "tensor": 2, "seq": 2})
    loss0, a0 = run(plain_mesh, False)
    loss1, a1 = run(sp_mesh, True)
    assert abs(loss0 - loss1) < 1e-4, (loss0, loss1)
    np.testing.assert_allclose(a0, a1, rtol=1e-4, atol=1e-5)
