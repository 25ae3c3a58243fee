"""Preference optimization: DPO and ORPO.

Parity targets:
  - train/xtuner/model/dpo.py:39-286 (DPO with varlen/SP-aware logp gathering)
  - train/xtuner/model/orpo.py (odds-ratio preference optimization)
  - dataset/collate_fns/preference_collate_fn.py (chosen/rejected pairing)

TPU-native: chosen and rejected sequences ride one batch (stacked [chosen;
rejected]) through a single forward; the frozen reference policy is obtained by
stripping LoRA adapters from the same weights (no second model copy in HBM —
the reference keeps a full ref model; with LoRA the base weights ARE the ref).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from callireader_tpu.core.config import VLMConfig
from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.models import internlm2
from callireader_tpu.train.e_it import IGNORE_INDEX, TrainConfig, merge_params


@dataclasses.dataclass(frozen=True)
class DPOConfig:
    beta: float = 0.1
    label_smoothing: float = 0.0
    loss_type: str = "sigmoid"  # or "orpo"
    orpo_lambda: float = 0.1


def _strip_lora(llm_params: Dict[str, Any]) -> Dict[str, Any]:
    layers = {k: v for k, v in llm_params["layers"].items() if "_lora_" not in k and k != "lora_scale"}
    out = dict(llm_params)
    out["layers"] = layers
    return out


def sequence_logps(
    llm_params: Dict[str, Any],
    cfg: VLMConfig,
    batch: Dict[str, jax.Array],
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-sequence sum log p(response tokens) and token counts.
    batch rows: [chosen_0..chosen_{B-1}, rejected_0..rejected_{B-1}]."""
    logits = internlm2.forward(
        llm_params, cfg.llm,
        input_ids=batch["input_ids"],
        segment_ids=batch.get("segment_ids"),
        positions=batch.get("positions"),
        policy=policy, use_flash=use_flash,
    )
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = batch["labels"][:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    tok_ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    seq_ll = (tok_ll * valid).sum(axis=-1)
    return seq_ll, valid.sum(axis=-1)


def dpo_loss(
    params: Dict[str, Any],
    cfg: VLMConfig,
    batch: Dict[str, jax.Array],
    dpo_cfg: DPOConfig,
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    llm = params["llm"]
    pol_ll, counts = sequence_logps(llm, cfg, batch, policy=policy, use_flash=use_flash)
    B2 = pol_ll.shape[0]
    B = B2 // 2
    pol_chosen, pol_rejected = pol_ll[:B], pol_ll[B:]

    if dpo_cfg.loss_type == "orpo":
        # ORPO: NLL on chosen + odds-ratio penalty; no reference model
        mean_chosen_ll = pol_chosen / jnp.maximum(counts[:B], 1)
        mean_rejected_ll = pol_rejected / jnp.maximum(counts[B:], 1)
        log_odds = (mean_chosen_ll - mean_rejected_ll) - (
            jnp.log1p(-jnp.exp(jnp.clip(mean_chosen_ll, -20, -1e-4)))
            - jnp.log1p(-jnp.exp(jnp.clip(mean_rejected_ll, -20, -1e-4)))
        )
        ratio_loss = -jax.nn.log_sigmoid(log_odds)
        nll = -mean_chosen_ll
        loss = (nll + dpo_cfg.orpo_lambda * ratio_loss).mean()
        margin = (mean_chosen_ll - mean_rejected_ll).mean()
        acc = (mean_chosen_ll > mean_rejected_ll).mean()
        return loss, {"loss": loss, "margin": margin, "accuracy": acc}

    ref_ll, _ = sequence_logps(
        jax.lax.stop_gradient(_strip_lora(llm)), cfg, batch, policy=policy, use_flash=use_flash
    )
    ref_chosen, ref_rejected = ref_ll[:B], ref_ll[B:]

    pol_logratio = pol_chosen - pol_rejected
    ref_logratio = ref_chosen - ref_rejected
    logits_diff = dpo_cfg.beta * (pol_logratio - ref_logratio)
    ls = dpo_cfg.label_smoothing
    loss = (
        -jax.nn.log_sigmoid(logits_diff) * (1 - ls)
        - jax.nn.log_sigmoid(-logits_diff) * ls
    ).mean()
    reward_margin = (dpo_cfg.beta * (pol_chosen - ref_chosen)
                     - dpo_cfg.beta * (pol_rejected - ref_rejected)).mean()
    acc = (logits_diff > 0).mean()
    return loss, {"loss": loss, "reward_margin": reward_margin, "accuracy": acc}


def make_dpo_train_step(
    cfg: VLMConfig,
    dpo_cfg: DPOConfig,
    tx: optax.GradientTransformation,
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
) -> Callable:
    from callireader_tpu.train.e_it import TrainState

    def step(state: TrainState, frozen, batch):
        def loss_fn(trainable):
            params = merge_params(trainable, frozen)
            return dpo_loss(params, cfg, batch, dpo_cfg, policy=policy, use_flash=use_flash)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return TrainState(trainable, opt_state, state.step + 1), metrics

    return step


def preference_collate(
    pairs, tokenizer, max_len_buckets=(256, 512, 1024, 2048), pad_token_id: int = 2
) -> Dict[str, np.ndarray]:
    """pairs: [{"prompt", "chosen", "rejected"}]. Builds the stacked
    [chosen; rejected] batch with IGNORE labels on prompts."""
    rows = []
    for key in ("chosen", "rejected"):
        for p in pairs:
            prompt_ids = tokenizer.encode(p["prompt"], add_bos=True)
            resp_ids = tokenizer.encode(p[key], add_bos=False)
            ids = prompt_ids + resp_ids
            labels = [IGNORE_INDEX] * len(prompt_ids) + resp_ids
            rows.append((np.asarray(ids, np.int32), np.asarray(labels, np.int32)))

    max_len = max(len(r[0]) for r in rows)
    S = next(b for b in max_len_buckets if b >= max_len)
    B = len(rows)
    input_ids = np.full((B, S), pad_token_id, np.int32)
    labels = np.full((B, S), IGNORE_INDEX, np.int32)
    seg = np.full((B, S), -1, np.int32)
    pos = np.zeros((B, S), np.int32)
    for i, (ids, lbl) in enumerate(rows):
        n = len(ids)
        input_ids[i, :n] = ids
        labels[i, :n] = lbl
        seg[i, :n] = 0
        pos[i, :n] = np.arange(n)
    return {"input_ids": input_ids, "labels": labels, "segment_ids": seg, "positions": pos}
