"""Checkpoint round trips: orbax state save/restore, reference-format export
-> converter re-import identity."""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.models import internlm2
from callireader_tpu.runtime import weights
from callireader_tpu.runtime.engine import init_all_params
from callireader_tpu.train import checkpoint as ckpt
from callireader_tpu.train import e_it, lora

CFG = callireader_tiny()


def test_export_import_roundtrip(tmp_path):
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    out = ckpt.export_reference_format(params, CFG, str(tmp_path / "export"))
    sd = weights.load_safetensors_dir(str(tmp_path / "export"))

    re_llm = weights.convert_llm(sd, CFG.llm)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        re_llm, jax.tree.map(np.asarray, params["llm"]),
    )
    re_vit = weights.convert_vit(sd, CFG.vision)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        re_vit, jax.tree.map(np.asarray, params["vision"]),
    )
    re_proj = weights.convert_projector(sd)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        re_proj, jax.tree.map(np.asarray, params["projector"]),
    )


def test_export_merges_lora(tmp_path):
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["llm"] = lora.add_lora(params["llm"], CFG.llm, jax.random.PRNGKey(1), rank=2, alpha=4)
    # random B to activate adapters
    params["llm"]["layers"]["wq_lora_b"] = (
        jax.random.normal(jax.random.PRNGKey(2), params["llm"]["layers"]["wq_lora_b"].shape) * 0.1
    )
    ckpt.export_reference_format(params, CFG, str(tmp_path / "export"))
    sd = weights.load_safetensors_dir(str(tmp_path / "export"))
    re_llm = weights.convert_llm(sd, CFG.llm)

    merged = lora.merge_lora(params["llm"])
    np.testing.assert_allclose(
        re_llm["layers"]["wq"], np.asarray(merged["layers"]["wq"]), atol=1e-5
    )


def test_train_state_save_restore(tmp_path):
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["llm"] = lora.add_lora(params["llm"], CFG.llm, jax.random.PRNGKey(1), rank=2, alpha=4)
    tc = e_it.TrainConfig(total_steps=10)
    state, frozen, tx = e_it.create_train_state(params, tc)
    state = e_it.TrainState(state.trainable, state.opt_state, jnp.asarray(7, jnp.int32))

    ckpt.save_train_state(str(tmp_path / "ck"), state, metadata={"seed": 42})
    template, _, _ = e_it.create_train_state(params, tc)
    restored = ckpt.restore_train_state(str(tmp_path / "ck"), template)
    assert int(restored.step) == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.trainable, state.trainable,
    )


def test_adapter_serving_roundtrip(tmp_path):
    """Train-checkpoint -> build_engine(adapter_path=...) merges LoRA+mlp1."""
    import numpy as np

    from callireader_tpu.cli.common import build_engine

    cfg = callireader_tiny()
    params = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    export = str(tmp_path / "base")
    ckpt.export_reference_format(params, cfg, export)

    # make a trained state with nonzero adapters
    params2 = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params2["llm"] = lora.add_lora(
        params2["llm"], cfg.llm, jax.random.PRNGKey(1), rank=2, alpha=4, dtype=jnp.float32
    )
    params2["llm"]["layers"]["wq_lora_b"] = (
        jax.random.normal(jax.random.PRNGKey(2), params2["llm"]["layers"]["wq_lora_b"].shape) * 0.1
    ).astype(jnp.float32)
    tc = e_it.TrainConfig(lora_rank=2, lora_alpha=4)
    state, frozen, _ = e_it.create_train_state(params2, tc)
    ckpt.save_train_state(str(tmp_path / "adapter"), state)

    engine = build_engine(
        preset="callireader-tiny", checkpoint_dir=export,
        adapter_path=str(tmp_path / "adapter"), lora_rank=2, lora_alpha=4,
    )
    # adapters merged: wq differs from the base export
    base_wq = np.asarray(params["llm"]["layers"]["wq"][0], np.float32)
    merged_wq = np.asarray(engine.params["llm"]["layers"]["wq"][0], np.float32)
    assert not np.allclose(base_wq, merged_wq, atol=1e-4)
    assert not any("_lora_" in k for k in engine.params["llm"]["layers"])
    resp = engine.chat(None, "你好", max_new_tokens=2)
    assert isinstance(resp, str)
