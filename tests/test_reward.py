"""Reward model: rewards at last valid token, ranking loss training, linear
RoPE long-context config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer
from callireader_tpu.train import dpo, e_it, reward

CFG = callireader_tiny()


def _setup():
    params = {"llm": internlm2.init_params(jax.random.PRNGKey(0), CFG.llm, jnp.float32)}
    params["llm"] = reward.add_value_head(params["llm"], CFG.llm, jax.random.PRNGKey(1))
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    pairs = [
        {"prompt": "内容？", "chosen": "春眠不觉晓", "rejected": "乱码"},
        {"prompt": "作者？", "chosen": "王羲之", "rejected": "不知道"},
    ]
    batch = {k: jnp.asarray(v) for k, v in dpo.preference_collate(pairs, tok).items()}
    return params, batch


def test_rewards_read_last_valid_token():
    params, batch = _setup()
    r = reward.sequence_rewards(params["llm"], CFG.llm, batch, policy=FP32_POLICY, use_flash=False)
    assert r.shape == (4,)
    # padding beyond the last valid token must not affect the reward
    ids2 = batch["input_ids"].at[:, -1].set(12345)
    batch2 = dict(batch)
    batch2["input_ids"] = ids2
    r2 = reward.sequence_rewards(params["llm"], CFG.llm, batch2, policy=FP32_POLICY, use_flash=False)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r2), atol=1e-5)


def test_reward_training_improves_ranking():
    import optax

    params, batch = _setup()
    # train only the value head + lm towers frozen via partition predicate:
    # simplest full-param adam here (tiny model)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return reward.reward_loss(p, CFG, batch, policy=FP32_POLICY, use_flash=False)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss, metrics

    first = None
    for _ in range(8):
        params, opt_state, loss, metrics = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first
    assert float(metrics["margin"]) > 0


def test_long_context_config():
    cfg = reward.long_context_config(CFG.llm, CFG.llm.max_position_embeddings * 3)
    assert cfg.rope_scaling_type == "linear"
    assert cfg.rope_scaling_factor == 3.0
    # linear scaling changes the rope tables
    pos = jnp.arange(8)[None]
    c1, _ = internlm2.cos_sin_for(CFG.llm, pos, 8)
    c2, _ = internlm2.cos_sin_for(cfg, pos, 8)
    assert not np.allclose(np.asarray(c1), np.asarray(c2))
    # and a forward still runs
    params = internlm2.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    logits = internlm2.forward(
        params, cfg, input_ids=jnp.ones((1, 8), jnp.int32), policy=FP32_POLICY, use_flash=False
    )
    assert np.isfinite(np.asarray(logits)).all()
