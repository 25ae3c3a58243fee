"""Mixtral-style MoE: routing math, aux loss, expert-parallel sharded step."""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import moe


def test_forward_shapes_and_finite():
    cfg = moe.moe_tiny()
    params = moe.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.llm.vocab_size)
    f = jax.jit(
        lambda p, i: moe.forward(
            p, cfg, input_ids=i, policy=FP32_POLICY, use_flash=False, return_aux_loss=True
        )
    )
    logits, aux = f(params, ids)
    assert logits.shape == (2, 16, cfg.llm.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    assert float(aux) >= 0


def test_single_expert_equals_dense_swiglu():
    import dataclasses

    cfg = moe.moe_tiny()
    cfg = dataclasses.replace(cfg, num_experts=1, num_experts_per_tok=1)
    params = moe.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, cfg.llm.hidden_size))

    p0 = {k: v[0] for k, v in params["layers"].items()}
    out, probs = moe._moe_mlp(p0, x, cfg, FP32_POLICY)

    from callireader_tpu.models.internlm2 import rms_norm

    h = rms_norm(x, p0["ffn_norm"], cfg.llm.rms_norm_eps, FP32_POLICY)
    gate = jax.nn.silu(h @ p0["w1"][0])
    dense = x + (gate * (h @ p0["w3"][0])) @ p0["w2"][0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), 1.0, atol=1e-6)


def test_topk_weights_sum_to_one():
    cfg = moe.moe_tiny()
    params = moe.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, cfg.llm.hidden_size))
    p0 = {k: v[0] for k, v in params["layers"].items()}
    _, probs = moe._moe_mlp(p0, x, cfg, FP32_POLICY)
    assert probs.shape == (8, cfg.num_experts)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_aux_loss_balanced_routing_is_one():
    cfg = moe.moe_tiny()
    X = cfg.num_experts
    # perfectly balanced: uniform probs + uniform argmax
    probs = np.tile(np.eye(X), (8, 1)).astype(np.float32)
    loss = moe.load_balancing_loss(jnp.asarray(probs), cfg)
    np.testing.assert_allclose(float(loss), 1.0, atol=1e-5)


def test_expert_parallel_train_step():
    """Grads + update over a mesh with a real expert axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import optax

    from callireader_tpu.core import partition as part
    from callireader_tpu.parallel import spmd

    cfg = moe.moe_tiny()
    mesh = part.make_mesh({"data": 2, "expert": 4})
    params = moe.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    axes = moe.logical_axes(cfg)
    params = spmd.shard_tree(params, axes, mesh)
    w1 = params["layers"]["w1"]
    assert w1.sharding.spec[1] == "expert"  # experts actually sharded

    ids = np.random.RandomState(0).randint(0, cfg.llm.vocab_size, (4, 16)).astype(np.int32)
    batch = jax.device_put(jnp.asarray(ids), NamedSharding(mesh, P("data")))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ids):
        def loss_fn(p):
            logits, aux = moe.forward(
                p, cfg, input_ids=ids, policy=FP32_POLICY, use_flash=False,
                return_aux_loss=True,
            )
            lab = ids[:, 1:]
            lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            nll = -jnp.take_along_axis(lp, lab[..., None], axis=-1).mean()
            return nll + aux

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    with mesh:
        params2, opt_state, loss1 = step(params, opt_state, batch)
        _, _, loss2 = step(params2, opt_state, batch)
    assert float(loss2) < float(loss1)


def test_moe_expert_shard_io_roundtrip(tmp_path):
    """Expert-shard checkpoint interop (handle_moe_load_and_save.py):
    stacked -> per-expert HF -> merged shards -> back, bit-exact; plus orbax
    save/restore of expert-sharded params preserving shardings."""
    import numpy as np

    from callireader_tpu.core import partition as part
    from callireader_tpu.parallel import spmd
    from callireader_tpu.train import moe_io

    cfg = moe.moe_tiny()
    params = moe.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)

    sd = moe_io.moe_to_hf_experts(params, cfg)
    L, X = cfg.llm.num_hidden_layers, cfg.num_experts
    assert len([k for k in sd if ".experts." in k]) == L * X * 3

    merged = moe_io.merge_expert_shards(sd, experts_per_shard=2)
    fused = [k for k in merged if ".w1w3." in k]
    assert len(fused) == L * (X // 2)
    assert merged[fused[0]].shape == (
        2, 2 * cfg.llm.intermediate_size, cfg.llm.hidden_size
    )

    back_sd = moe_io.split_expert_shards(merged, experts_per_shard=2)
    for k in sd:
        np.testing.assert_array_equal(back_sd[k], sd[k])

    leaves = moe_io.hf_experts_to_moe(back_sd, cfg)
    for name in ("w1", "w3", "w2", "router"):
        np.testing.assert_allclose(
            leaves[name], np.asarray(params["layers"][name]), rtol=0, atol=0
        )

    # orbax round-trip of expert-sharded params on the virtual mesh
    if len(jax.devices()) >= 4:
        mesh = part.make_mesh({"data": len(jax.devices()) // 4, "expert": 4})
        sharded = spmd.shard_tree(params, moe.logical_axes(cfg), mesh)
        moe_io.save_sharded(str(tmp_path / "moe_ckpt"), sharded)
        zero_tmpl = jax.tree.map(jnp.zeros_like, sharded)
        restored = moe_io.restore_sharded(str(tmp_path / "moe_ckpt"), zero_tmpl)
        np.testing.assert_array_equal(
            np.asarray(restored["layers"]["w1"]), np.asarray(params["layers"]["w1"])
        )
        assert restored["layers"]["w1"].sharding == sharded["layers"]["w1"].sharding
