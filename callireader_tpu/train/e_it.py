"""e-IT (embedding instruction tuning) trainer.

Parity target: the reference training path —
  - InternVL_V1_5 wrapper forward: splice pre-computed pseudo-text embeddings
    at [UNUSED_TOKEN_140] positions, ViT embeds at <IMG_CONTEXT>, then LLM
    forward + shifted CE (train/xtuner/model/internvl.py:184-349).
  - Recipe: LoRA r=128 a=256 on all LLM linears, frozen ViT+LLM towers, mlp1
    trainable, lr 5e-5 cosine, DeepSpeed ZeRO-1 (configs/internvl/v2/e-IT.py).

TPU-native: one jitted SPMD train step over a Mesh. ZeRO == optimizer-state /
parameter sharding via logical-axis rules ("fsdp" axis); DP via "data" axis;
gradients reduce through GSPMD-inserted collectives instead of NCCL allreduce.
The trainable subtree (LoRA + mlp1) is partitioned out of the frozen pytree so
autodiff never materializes backbone weight gradients.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from callireader_tpu.align import vq as vq_mod
from callireader_tpu.core.config import VLMConfig
from callireader_tpu.core.dtypes import DTypePolicy, DEFAULT_POLICY
from callireader_tpu.models import internlm2, internvit, projector

IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-5
    weight_decay: float = 0.05
    betas: Tuple[float, float] = (0.9, 0.999)
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    grad_clip: float = 1.0
    lora_rank: int = 128
    lora_alpha: float = 256.0
    train_mlp1: bool = True
    remat: bool = True
    # micro-batches per optimizer update (accumulative_counts in the reference
    # recipes, e.g. 2 for e-IT.py:40). The train step still runs per
    # micro-batch; optax.MultiSteps sums grads and applies the inner update
    # (and advances the LR schedule) once per `grad_accum` calls.
    grad_accum: int = 1


# ---------------------------------------------------------------------------
# trainable/frozen partition (path-predicate based)
# ---------------------------------------------------------------------------


def _is_trainable_path(path: Tuple, train_cfg: TrainConfig) -> bool:
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    if any(isinstance(k, str) and "_lora_" in k for k in keys):
        return True
    if train_cfg.train_mlp1 and keys and keys[0] == "projector":
        return True
    return False


def partition_params(params: Dict[str, Any], train_cfg: TrainConfig):
    """Split into (trainable, frozen) trees of the same structure; non-member
    leaves are None and the two merge losslessly."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    trainable_leaves, frozen_leaves = [], []
    for path, leaf in flat:
        if _is_trainable_path(path, train_cfg):
            trainable_leaves.append(leaf)
            frozen_leaves.append(None)
        else:
            trainable_leaves.append(None)
            frozen_leaves.append(leaf)
    return (
        jax.tree_util.tree_unflatten(treedef, trainable_leaves),
        jax.tree_util.tree_unflatten(treedef, frozen_leaves),
    )


def merge_params(trainable, frozen):
    return jax.tree.map(
        lambda a, b: a if a is not None else b,
        trainable, frozen,
        is_leaf=lambda x: x is None,
    )


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------


def eit_loss(
    params: Dict[str, Any],
    cfg: VLMConfig,
    batch: Dict[str, jax.Array],
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
    remat: bool = True,
    attn_override=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """batch:
      input_ids  (B, S) int32 — right-padded with pad id
      labels     (B, S) int32 — IGNORE_INDEX on prompt/pad
      segment_ids(B, S) int32 — 0.. per packed sequence, -1 on pad
      pixel_values (T, H, W, C) — all tiles of the batch, flattened in order
      pseudo_embeds (P, E)     — all pseudo tokens of the batch, in order
    Token counts must match the <IMG_CONTEXT> / ALIGNED slots in input_ids
    (guaranteed by the collator), mirroring internvl.py:271-309.
    """
    input_ids = batch["input_ids"]
    labels = batch["labels"]

    embeds = internlm2.embed_tokens(params["llm"], input_ids, policy.compute_dtype)

    if "pixel_values" in batch:
        hidden = internvit.forward(
            params["vision"], cfg.vision, batch["pixel_values"],
            policy=policy, use_flash=use_flash, remat=remat,
        )
        # towers are frozen in e-IT: cut the (useless) grad path into the ViT
        hidden = jax.lax.stop_gradient(hidden)
        img_embeds = projector.extract_feature(params["projector"], hidden, cfg, policy=policy)
        embeds = vq_mod.splice_embeds(
            embeds, input_ids, img_embeds.reshape(-1, img_embeds.shape[-1]),
            cfg.img_context_token_id,
        )
    if "pseudo_embeds" in batch:
        embeds = vq_mod.splice_embeds(
            embeds, input_ids, batch["pseudo_embeds"], cfg.aligned_token_id
        )

    logits = internlm2.forward(
        params["llm"], cfg.llm,
        inputs_embeds=embeds,
        segment_ids=batch.get("segment_ids"),
        positions=batch.get("positions"),
        policy=policy, use_flash=use_flash, remat=remat,
        attn_override=attn_override,
    )

    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(valid.sum(), 1)
    loss = -(token_ll * valid).sum() / n_valid
    return loss, {"loss": loss, "n_tokens": n_valid}


# ---------------------------------------------------------------------------
# optimizer / train step
# ---------------------------------------------------------------------------


def make_optimizer(train_cfg: TrainConfig) -> optax.GradientTransformation:
    warmup = max(1, int(train_cfg.total_steps * train_cfg.warmup_ratio))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=train_cfg.learning_rate,
        warmup_steps=warmup,
        decay_steps=train_cfg.total_steps,
        end_value=0.0,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(train_cfg.grad_clip),
        optax.adamw(
            schedule, b1=train_cfg.betas[0], b2=train_cfg.betas[1],
            weight_decay=train_cfg.weight_decay,
        ),
    )
    if train_cfg.grad_accum > 1:
        # DeepSpeed gradient_accumulation_steps equivalent: average grads over
        # grad_accum micro-batches, one real update (and one schedule tick)
        # per accumulation window.
        tx = optax.MultiSteps(tx, every_k_schedule=train_cfg.grad_accum)
    return tx


@dataclasses.dataclass
class TrainState:
    trainable: Any
    opt_state: Any
    step: jax.Array


jax.tree_util.register_dataclass(
    TrainState, data_fields=["trainable", "opt_state", "step"], meta_fields=[]
)


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path
    )


def _shard_opt_state_like(opt_state, trainable, mesh):
    """Pin optimizer-state arrays to the matching trainable leaf's sharding
    (moment tensors mirror the trainable tree as a path suffix); scalars are
    mesh-replicated. Needed because the optimizer init is value-independent —
    XLA constant-folds it onto one device regardless of input shardings."""
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    train_flat = [
        (_path_str(p), l)
        for p, l in jax.tree_util.tree_flatten_with_path(trainable)[0]
        if l is not None
    ]

    def fix(path, leaf):
        if not hasattr(leaf, "ndim"):
            return leaf
        if leaf.ndim == 0:
            return jax.device_put(leaf, rep)
        ps = _path_str(path)
        for tp, tl in train_flat:
            if ps.endswith(tp) and tl.shape == leaf.shape:
                return jax.device_put(leaf, tl.sharding)
        return jax.device_put(leaf, rep)

    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    treedef = jax.tree_util.tree_structure(opt_state)
    return jax.tree_util.tree_unflatten(treedef, [fix(p, l) for p, l in flat])


def create_train_state(params, train_cfg: TrainConfig, mesh=None):
    trainable, frozen = partition_params(params, train_cfg)
    tx = make_optimizer(train_cfg)
    opt_state = tx.init(trainable)
    step = jnp.zeros((), jnp.int32)
    if mesh is None:
        leaves = [l for l in jax.tree.leaves(trainable) if hasattr(l, "sharding")]
        mesh = next(
            (l.sharding.mesh for l in leaves if getattr(l.sharding, "mesh", None) is not None),
            None,
        )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        opt_state = _shard_opt_state_like(opt_state, trainable, mesh)
        step = jax.device_put(step, NamedSharding(mesh, PartitionSpec()))
    return TrainState(trainable, opt_state, step), frozen, tx


def replicate_scalars(state: TrainState, mesh) -> TrainState:
    """Pin every scalar state leaf (optimizer counters, step) to a
    mesh-replicated sharding so all state lives on one device set."""
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())

    def fix(x):
        if hasattr(x, "ndim") and x.ndim == 0:
            return jax.device_put(x, rep)
        return x

    return TrainState(
        state.trainable,
        jax.tree.map(fix, state.opt_state),
        jax.device_put(state.step, rep),
    )


def make_train_step(
    cfg: VLMConfig,
    train_cfg: TrainConfig,
    tx: optax.GradientTransformation,
    *,
    policy: DTypePolicy = DEFAULT_POLICY,
    use_flash: Optional[bool] = None,
    mesh=None,
) -> Callable:
    """``mesh`` with seq > 1 routes attention through the Ulysses shard_map
    kernel (parallel/ulysses.py) — the reference's sequence_parallel_size
    (train.py:99-126): seq-dim-sharded activations, all_to_all head/seq
    exchange inside attention. Loss re-reduction (reduce_loss.py:8-35) is
    unnecessary here: GSPMD averages the CE across the seq shards itself.
    Assumes unpacked batches (segment-id masking is not threaded through the
    a2a path; the e-IT loader never packs)."""
    attn_override = None
    if mesh is not None and int(mesh.shape.get("seq", 1)) > 1:
        from callireader_tpu.parallel import ulysses

        def attn_override(q, k, v):
            import jax as _jax

            flash = (
                bool(use_flash) if use_flash is not None
                else _jax.devices()[0].platform == "tpu"
            )
            return ulysses.ulysses_attention(q, k, v, mesh, causal=True, use_flash=flash)

    def train_step(state: TrainState, frozen, batch):
        def loss_fn(trainable):
            params = merge_params(trainable, frozen)
            return eit_loss(
                params, cfg, batch, policy=policy, use_flash=use_flash,
                remat=train_cfg.remat, attn_override=attn_override,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(trainable, opt_state, state.step + 1)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step
