"""Training stack: LoRA math, partition/merge, e-IT step learns, data pipeline."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.runtime.engine import init_all_params
from callireader_tpu.train import data as data_mod
from callireader_tpu.train import e_it, lora

CFG = callireader_tiny()


def test_lora_zero_init_is_identity():
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG.llm, jnp.float32)
    ids = jnp.asarray(np.array([[1, 5, 9]], np.int32))
    base = internlm2.forward(params, CFG.llm, input_ids=ids, policy=FP32_POLICY, use_flash=False)
    with_lora = lora.add_lora(params, CFG.llm, jax.random.PRNGKey(1), rank=4, alpha=8)
    out = internlm2.forward(with_lora, CFG.llm, input_ids=ids, policy=FP32_POLICY, use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_lora_merge_matches_adapter_forward():
    params = internlm2.init_params(jax.random.PRNGKey(0), CFG.llm, jnp.float32)
    with_lora = lora.add_lora(params, CFG.llm, jax.random.PRNGKey(1), rank=4, alpha=8)
    # random B so adapters are active
    layers = dict(with_lora["layers"])
    for k in list(layers):
        if k.endswith("_lora_b"):
            layers[k] = jax.random.normal(jax.random.PRNGKey(hash(k) % 2**31), layers[k].shape) * 0.02
    with_lora = dict(with_lora)
    with_lora["layers"] = layers

    ids = jnp.asarray(np.array([[1, 5, 9, 3]], np.int32))
    adapter_out = internlm2.forward(
        with_lora, CFG.llm, input_ids=ids, policy=FP32_POLICY, use_flash=False
    )
    merged = lora.merge_lora(with_lora)
    assert not any("_lora_" in k for k in merged["layers"])
    merged_out = internlm2.forward(
        merged, CFG.llm, input_ids=ids, policy=FP32_POLICY, use_flash=False
    )
    np.testing.assert_allclose(np.asarray(merged_out), np.asarray(adapter_out), atol=1e-4)


def test_partition_and_merge_roundtrip():
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["llm"] = lora.add_lora(params["llm"], CFG.llm, jax.random.PRNGKey(1), rank=2, alpha=4)
    tc = e_it.TrainConfig()
    trainable, frozen = e_it.partition_params(params, tc)
    # lora + projector leaves trainable
    t_leaves = jax.tree.leaves(trainable)
    assert len(t_leaves) > 0
    merged = e_it.merge_params(trainable, frozen)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        merged, params,
    )


def test_train_step_reduces_loss():
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["llm"] = lora.add_lora(params["llm"], CFG.llm, jax.random.PRNGKey(1), rank=4, alpha=8)
    tc = e_it.TrainConfig(learning_rate=5e-3, total_steps=20, warmup_ratio=0.0, remat=False)
    state, frozen, tx = e_it.create_train_state(params, tc)
    step = jax.jit(e_it.make_train_step(CFG, tc, tx, policy=FP32_POLICY, use_flash=False))

    B, S = 2, 64
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 1000, (B, S)).astype(np.int32)
    n_tiles = 1
    ids[:, 2 : 2 + CFG.num_image_token] = CFG.img_context_token_id
    labels = np.where(np.arange(S)[None] >= S // 2, ids, e_it.IGNORE_INDEX).astype(np.int32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "segment_ids": jnp.zeros((B, S), jnp.int32),
        "positions": jnp.tile(jnp.arange(S)[None], (B, 1)),
        "pixel_values": jnp.asarray(
            rng.rand(B * n_tiles, CFG.force_image_size, CFG.force_image_size, 3), jnp.float32
        ),
    }
    losses = []
    for _ in range(8):
        state, metrics = step(state, frozen, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.05, losses


def test_dataset_and_collate(tmp_path):
    emb = np.random.RandomState(0).randn(2, 3, CFG.llm.hidden_size).astype(np.float32)
    np.save(tmp_path / "s0.npy", emb)
    from PIL import Image

    Image.fromarray(np.full((64, 48, 3), 200, np.uint8)).save(tmp_path / "s0.jpg")
    ann = [
        {
            "image": "s0.jpg",
            "embedding": "s0.npy",
            "conversations": [
                {"from": "human", "value": "读出图中所有文字。"},
                {"from": "gpt", "value": "春眠不觉晓"},
            ],
        }
    ]
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann, ensure_ascii=False))

    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    ds = data_mod.EITDataset(str(ann_path), CFG, tok, image_root=str(tmp_path))
    sample = ds[0]
    n_al = int((sample["input_ids"] == CFG.aligned_token_id).sum())
    assert n_al == 6  # 2*3 pseudo rows
    assert (sample["labels"] != e_it.IGNORE_INDEX).sum() > 0

    batch = data_mod.collate([sample, sample])
    assert batch["input_ids"].shape[0] == 2
    assert batch["pseudo_embeds"].shape[0] == 12
    assert batch["input_ids"].shape[1] in data_mod.LENGTH_BUCKETS


def test_pack_samples_segments():
    s1 = {
        "input_ids": np.arange(1, 6, dtype=np.int32),
        "labels": np.arange(1, 6, dtype=np.int32),
    }
    s2 = {
        "input_ids": np.arange(10, 14, dtype=np.int32),
        "labels": np.arange(10, 14, dtype=np.int32),
    }
    packed = data_mod.pack_samples([s1, s2], target_length=16)
    seg = packed["segment_ids"][0]
    assert list(seg[:5]) == [0] * 5 and list(seg[5:9]) == [1] * 4
    assert all(seg[9:] == -1)
    assert list(packed["positions"][0][:9]) == [0, 1, 2, 3, 4, 0, 1, 2, 3]


def test_length_grouped_indices_cover_all():
    lengths = list(np.random.RandomState(0).randint(10, 100, 37))
    order = data_mod.length_grouped_indices(lengths, batch_size=4)
    assert sorted(order) == list(range(37))


def test_grad_accum_applies_update_every_k():
    """grad_accum=k: trainable params stay bitwise-identical for the first k-1
    micro-batches and change on the k-th (optax.MultiSteps semantics matching
    the reference's accumulative_counts, e-IT.py:40)."""
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["llm"] = lora.add_lora(params["llm"], CFG.llm, jax.random.PRNGKey(1), rank=4, alpha=8)
    tc = e_it.TrainConfig(
        learning_rate=5e-3, total_steps=10, warmup_ratio=0.0, remat=False, grad_accum=2
    )
    state, frozen, tx = e_it.create_train_state(params, tc)
    step = jax.jit(e_it.make_train_step(CFG, tc, tx, policy=FP32_POLICY, use_flash=False))

    B, S = 2, 32
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 1000, (B, S)).astype(np.int32)
    labels = np.where(np.arange(S)[None] >= S // 2, ids, e_it.IGNORE_INDEX).astype(np.int32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "segment_ids": jnp.zeros((B, S), jnp.int32),
        "positions": jnp.tile(jnp.arange(S)[None], (B, 1)),
    }

    def a_lora_leaf(t):
        return np.asarray(t["llm"]["layers"]["wq_lora_b"])

    before = a_lora_leaf(state.trainable)
    # micro 1: accumulate only
    state, _ = step(state, frozen, batch)
    assert int(state.opt_state.gradient_step) == 0, "update applied too early"
    assert np.array_equal(a_lora_leaf(state.trainable), before)
    # micro 2: first real update (warmup lr=0 at count 0 -> params still equal)
    state, _ = step(state, frozen, batch)
    assert int(state.opt_state.gradient_step) == 1, "update never applied"
    # micro 3+4: second update carries a nonzero LR -> params move
    state, _ = step(state, frozen, batch)
    assert int(state.opt_state.gradient_step) == 1
    state, _ = step(state, frozen, batch)
    assert int(state.opt_state.gradient_step) == 2
    assert not np.array_equal(a_lora_leaf(state.trainable), before), "params never moved"


# ---------------------------------------------------------------------------
# QLoRA: int8 frozen base under bf16 adapters (the TPU analog of the
# reference's bitsandbytes NF4 QLoRA, train/xtuner/model/internvl.py:50-71)
# ---------------------------------------------------------------------------


def test_qlora_train_step_reduces_loss_and_freezes_base():
    from callireader_tpu.runtime import quantize as quant_mod

    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["llm"] = lora.add_lora(params["llm"], CFG.llm, jax.random.PRNGKey(1), rank=4, alpha=8)
    params["llm"] = quant_mod.quantize_llm_int8(params["llm"])
    assert "wq_q" in params["llm"]["layers"] and "wq" not in params["llm"]["layers"]

    tc = e_it.TrainConfig(learning_rate=5e-3, total_steps=20, warmup_ratio=0.0, remat=False)
    state, frozen, tx = e_it.create_train_state(params, tc)
    # int8 leaves land in the frozen tree, never the trainable one
    assert all(
        x.dtype != jnp.int8 for x in jax.tree.leaves(state.trainable)
    )
    q_before = np.asarray(frozen["llm"]["layers"]["wq_q"]).copy()
    step = jax.jit(e_it.make_train_step(CFG, tc, tx, policy=FP32_POLICY, use_flash=False))

    B, S = 2, 64
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 1000, (B, S)).astype(np.int32)
    ids[:, 2 : 2 + CFG.num_image_token] = CFG.img_context_token_id
    labels = np.where(np.arange(S)[None] >= S // 2, ids, e_it.IGNORE_INDEX).astype(np.int32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "segment_ids": jnp.zeros((B, S), jnp.int32),
        "positions": jnp.tile(jnp.arange(S)[None], (B, 1)),
        "pixel_values": jnp.asarray(
            rng.rand(B, CFG.force_image_size, CFG.force_image_size, 3), jnp.float32
        ),
    }
    losses = []
    for _ in range(8):
        state, metrics = step(state, frozen, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] - 0.05, losses
    np.testing.assert_array_equal(
        np.asarray(frozen["llm"]["layers"]["wq_q"]), q_before
    )


def test_qlora_export_dequantizes_and_merges(tmp_path):
    from callireader_tpu.runtime import quantize as quant_mod
    from callireader_tpu.train import checkpoint as ckpt_mod

    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["llm"] = lora.add_lora(params["llm"], CFG.llm, jax.random.PRNGKey(1), rank=2, alpha=4)
    params["llm"] = quant_mod.quantize_llm_int8(params["llm"])
    out = ckpt_mod.export_reference_format(params, CFG, str(tmp_path / "exp"))
    import safetensors.numpy as st

    sd = {}
    import os as _os

    for f in _os.listdir(out if _os.path.isdir(out) else str(tmp_path / "exp")):
        if f.endswith(".safetensors"):
            sd.update(st.load_file(str(tmp_path / "exp" / f)))
    # quantized leaves are named {name}_q / {name}_scale; exact-suffix match so
    # legit reference keys like resampler.layers.N.0.to_q.weight don't trip it
    assert not any(k.endswith("_q") or k.endswith("_scale") or "_lora_" in k
                   for k in sd)
    assert any("attention.wqkv" in k or "wqkv" in k or "tok_embeddings" in k for k in sd)


def test_dequantize_roundtrip_close():
    from callireader_tpu.runtime import quantize as quant_mod

    params = internlm2.init_params(jax.random.PRNGKey(0), CFG.llm, jnp.float32)
    w = np.asarray(params["layers"]["wq"], np.float32)
    qp = quant_mod.quantize_llm_int8(params)
    deq = quant_mod.dequantize_llm_int8(qp, dtype=jnp.float32)
    w2 = np.asarray(deq["layers"]["wq"], np.float32)
    err = np.abs(w - w2).max() / (np.abs(w).max() + 1e-9)
    assert err < 0.01, err  # int8 rounding: <=1% of absmax per channel
    assert "tok_embeddings" in deq and "tok_embeddings_q" not in deq
