"""DPO/ORPO: collate shape contract, loss sanity, training moves the margin."""

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.runtime.engine import init_all_params
from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer
from callireader_tpu.train import dpo, e_it, lora

CFG = callireader_tiny()


def _pairs():
    return [
        {"prompt": "这幅作品写了什么？", "chosen": "春眠不觉晓", "rejected": "不知道"},
        {"prompt": "作者是谁？", "chosen": "王羲之", "rejected": "颜真卿柳公权"},
    ]


def test_preference_collate():
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    batch = dpo.preference_collate(_pairs(), tok)
    assert batch["input_ids"].shape[0] == 4  # 2 chosen + 2 rejected
    assert (batch["labels"] != e_it.IGNORE_INDEX).sum() > 0
    # prompt part ignored
    assert batch["labels"][0, 0] == e_it.IGNORE_INDEX


def _setup(loss_type="sigmoid"):
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    params["llm"] = lora.add_lora(params["llm"], CFG.llm, jax.random.PRNGKey(1), rank=4, alpha=8)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    batch = {k: jnp.asarray(v) for k, v in dpo.preference_collate(_pairs(), tok).items()}
    dcfg = dpo.DPOConfig(beta=0.1, loss_type=loss_type)
    return params, batch, dcfg


def test_dpo_zero_adapter_loss_is_log2():
    params, batch, dcfg = _setup()
    loss, metrics = dpo.dpo_loss(params, CFG, batch, dcfg, policy=FP32_POLICY, use_flash=False)
    # fresh LoRA == reference policy -> logits_diff == 0 -> loss == log(2)
    np.testing.assert_allclose(float(loss), np.log(2.0), atol=1e-4)


def test_dpo_training_increases_accuracy_margin():
    params, batch, dcfg = _setup()
    tc = e_it.TrainConfig(learning_rate=1e-3, total_steps=20, warmup_ratio=0.0, train_mlp1=False)
    state, frozen, tx = e_it.create_train_state(params, tc)
    step = jax.jit(
        dpo.make_dpo_train_step(CFG, dcfg, tx, policy=FP32_POLICY, use_flash=False)
    )
    first = None
    for i in range(10):
        state, metrics = step(state, frozen, batch)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert float(metrics["reward_margin"]) > 0


def test_orpo_loss_finite_and_trains():
    params, batch, dcfg = _setup(loss_type="orpo")
    loss, metrics = dpo.dpo_loss(params, CFG, batch, dcfg, policy=FP32_POLICY, use_flash=False)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0
