"""Reward model training (value head over the decoder).

Parity target: train/xtuner/model/reward.py:87-490 — InternLM2-style reward
model: scalar value head on top of the final hidden state, Bradley-Terry
ranking loss over (chosen, rejected) pairs, optional linear-RoPE long-context
preparation (:186, mirrored by ``long_context_config``).

Reuses the internlm2 stack; the reward is read at each sequence's last valid
token.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from callireader_tpu.core.config import LLMConfig, VLMConfig
from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.train.e_it import TrainState, merge_params


def add_value_head(params: Dict[str, Any], cfg: LLMConfig, key: jax.Array, dtype=jnp.float32):
    out = dict(params)
    out["v_head"] = jax.nn.initializers.normal(1.0 / (cfg.hidden_size + 1))(
        key, (cfg.hidden_size, 1), jnp.float32
    ).astype(dtype)
    return out


def long_context_config(cfg: LLMConfig, target_length: int) -> LLMConfig:
    """Enlarge the usable window with linear RoPE scaling
    (sft.py/reward.py _prepare_for_long_context_training)."""
    import math

    if target_length <= cfg.max_position_embeddings:
        return cfg
    factor = float(math.ceil(target_length / cfg.max_position_embeddings))
    return dataclasses.replace(
        cfg, rope_scaling_type="linear", rope_scaling_factor=factor,
        max_position_embeddings=target_length,
    )


def sequence_rewards(
    llm_params: Dict[str, Any],
    cfg: LLMConfig,
    batch: Dict[str, jax.Array],
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """(B,) scalar rewards at the last valid token of each row."""
    hidden = internlm2.forward(
        llm_params, cfg,
        input_ids=batch["input_ids"],
        segment_ids=batch.get("segment_ids"),
        positions=batch.get("positions"),
        policy=policy, use_flash=use_flash, return_hidden=True,
    )
    seg = batch.get("segment_ids")
    if seg is not None:
        lengths = jnp.sum(seg >= 0, axis=-1)
    else:
        lengths = jnp.full((hidden.shape[0],), hidden.shape[1], jnp.int32)
    last = jnp.take_along_axis(
        hidden, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    return (last.astype(jnp.float32) @ llm_params["v_head"].astype(jnp.float32))[:, 0]


def reward_loss(
    params: Dict[str, Any],
    cfg: VLMConfig,
    batch: Dict[str, jax.Array],
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Batch rows stacked [chosen; rejected] (train/dpo.preference_collate)."""
    rewards = sequence_rewards(params["llm"], cfg.llm, batch, policy=policy, use_flash=use_flash)
    B = rewards.shape[0] // 2
    chosen, rejected = rewards[:B], rewards[B:]
    loss = -jax.nn.log_sigmoid(chosen - rejected).mean()
    return loss, {
        "loss": loss,
        "accuracy": (chosen > rejected).mean(),
        "margin": (chosen - rejected).mean(),
    }


def make_reward_train_step(
    cfg: VLMConfig,
    tx: optax.GradientTransformation,
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
) -> Callable:
    def step(state: TrainState, frozen, batch):
        def loss_fn(trainable):
            params = merge_params(trainable, frozen)
            return reward_loss(params, cfg, batch, policy=policy, use_flash=use_flash)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return TrainState(trainable, opt_state, state.step + 1), metrics

    return step
