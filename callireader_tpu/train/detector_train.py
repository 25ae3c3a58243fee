"""Character-detector training: anchor-free assignment + BCE/DFL loss.

The reference trains its YOLO character detector externally through
ultralytics (inference.py:98 only loads `best.pt`); the rebuild makes
detector training first-class so the slicing-prior quality story is testable
end-to-end without a GPU toolchain. TPU-native: one jitted SPMD train step,
static max-GT padding, vectorized FCOS-style assignment.

Assignment (per scale, stride s):
  an anchor (cell center) is positive for a GT box iff the center lies inside
  the box AND all four ltrb distances are representable by this scale's DFL
  bins (< reg_max - 1 stride units) — the scale-range rule falls out of the
  distribution support, no hand-tuned ranges. Ties pick the smallest GT.
Loss:
  cls: sigmoid BCE over every anchor (positives=1), normalized by #pos
  box: distribution focal loss (CE against the two neighboring integer bins
  of each ltrb target) on positive anchors.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from callireader_tpu.core.config import DetectorConfig
from callireader_tpu.models import detector as det


@dataclasses.dataclass(frozen=True)
class DetTrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 5e-4
    total_steps: int = 500
    warmup: int = 20
    grad_clip: float = 10.0
    box_weight: float = 1.0
    cls_weight: float = 1.0


def _scale_targets(gt_boxes, gt_mask, Hs, Ws, stride, reg_max):
    """-> (pos (B,N) bool, ltrb_tgt (B,N,4) stride units). N = Hs*Ws."""
    cy, cx = jnp.meshgrid(
        (jnp.arange(Hs, dtype=jnp.float32) + 0.5) * stride,
        (jnp.arange(Ws, dtype=jnp.float32) + 0.5) * stride,
        indexing="ij",
    )
    centers = jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1)  # (N,2) px
    # ltrb of every (anchor, gt) pair, in pixels: (B, N, M, 4)
    x1y1 = gt_boxes[:, None, :, :2]
    x2y2 = gt_boxes[:, None, :, 2:]
    lt = centers[None, :, None, :] - x1y1
    rb = x2y2 - centers[None, :, None, :]
    ltrb = jnp.concatenate([lt, rb], axis=-1) / stride  # stride units
    inside = jnp.all(ltrb > 0, axis=-1)
    fits = jnp.max(ltrb, axis=-1) < (reg_max - 1.01)
    valid = inside & fits & gt_mask[:, None, :]
    area = (gt_boxes[..., 2] - gt_boxes[..., 0]) * (gt_boxes[..., 3] - gt_boxes[..., 1])
    cost = jnp.where(valid, area[:, None, :], jnp.inf)  # (B, N, M)
    best = jnp.argmin(cost, axis=-1)  # (B, N)
    pos = jnp.any(valid, axis=-1)
    tgt = jnp.take_along_axis(ltrb, best[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
    return pos, tgt


def _dfl(dist_logits, target, reg_max):
    """dist_logits (B,N,4,reg_max); target (B,N,4) in [0, reg_max-1)."""
    t = jnp.clip(target, 0.0, reg_max - 1.001)
    li = jnp.floor(t).astype(jnp.int32)
    wl = (li + 1).astype(jnp.float32) - t
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(dist_logits.astype(jnp.float32), axis=-1)
    pl = jnp.take_along_axis(logp, li[..., None], axis=-1)[..., 0]
    pr = jnp.take_along_axis(logp, (li + 1)[..., None], axis=-1)[..., 0]
    return -(wl * pl + wr * pr).mean(axis=-1)  # (B, N)


def detector_loss(
    params, cfg: DetectorConfig, images, gt_boxes, gt_mask,
    train_cfg: DetTrainConfig = DetTrainConfig(),
):
    """images (B,S,S,3) in [0,1]; gt_boxes (B,M,4) xyxy px; gt_mask (B,M)."""
    raw = det.forward_raw(params, cfg, images)
    cls_loss = 0.0
    box_loss = 0.0
    n_pos_total = 0.0
    for box_logits, cls_logits, stride in raw:
        B, Hs, Ws, _ = box_logits.shape
        pos, tgt = _scale_targets(gt_boxes, gt_mask, Hs, Ws, stride, cfg.reg_max)
        n_pos = pos.sum()
        n_pos_total = n_pos_total + n_pos
        cls = cls_logits.reshape(B, Hs * Ws, cfg.num_classes).astype(jnp.float32)
        labels = pos.astype(jnp.float32)[..., None]
        bce = optax.sigmoid_binary_cross_entropy(cls, labels).mean(-1)
        cls_loss = cls_loss + bce.sum()
        dist = box_logits.reshape(B, Hs * Ws, 4, cfg.reg_max)
        dfl = _dfl(dist, tgt, cfg.reg_max)
        box_loss = box_loss + jnp.where(pos, dfl, 0.0).sum()
    denom = jnp.maximum(n_pos_total, 1.0)
    loss = (
        train_cfg.cls_weight * cls_loss / denom
        + train_cfg.box_weight * box_loss / denom
    )
    return loss, {"loss": loss, "n_pos": n_pos_total,
                  "cls": cls_loss / denom, "box": box_loss / denom}


def make_optimizer(train_cfg: DetTrainConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, train_cfg.learning_rate, train_cfg.warmup, train_cfg.total_steps
    )
    return optax.chain(
        optax.clip_by_global_norm(train_cfg.grad_clip),
        optax.adamw(sched, weight_decay=train_cfg.weight_decay),
    )


def make_train_step(cfg: DetectorConfig, train_cfg: DetTrainConfig, tx):
    def step(params, opt_state, images, gt_boxes, gt_mask):
        (loss, metrics), grads = jax.value_and_grad(
            detector_loss, has_aux=True
        )(params, cfg, images, gt_boxes, gt_mask, train_cfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


# ---------------------------------------------------------------------------
# synthetic calligraphy pages (training data without the private dataset)
# ---------------------------------------------------------------------------


def synth_pages(
    rng: np.random.RandomState, batch: int, size: int, max_boxes: int = 16,
    min_chars: int = 4,
):
    """Random ink-glyph pages like the CalliBench layout: paper background,
    dark multi-stroke glyphs in loose columns. Returns (images (B,S,S,3) f32
    [0,1], gt (B,M,4) xyxy px, mask (B,M))."""
    imgs = np.empty((batch, size, size, 3), np.float32)
    gt = np.zeros((batch, max_boxes, 4), np.float32)
    mask = np.zeros((batch, max_boxes), bool)
    for b in range(batch):
        page = np.full((size, size, 3), 235, np.uint8)
        page += rng.randint(0, 18, page.shape).astype(np.uint8)
        n = rng.randint(min_chars, max_boxes + 1)
        placed = 0
        for _ in range(n * 3):
            if placed >= n:
                break
            w = rng.randint(size // 12, size // 5)
            h = rng.randint(size // 12, size // 5)
            x0 = rng.randint(0, size - w)
            y0 = rng.randint(0, size - h)
            box = np.array([x0, y0, x0 + w, y0 + h], np.float32)
            # reject overlaps so GT boxes stay unambiguous
            if placed and (
                np.maximum(0, np.minimum(gt[b, :placed, 2], box[2]) - np.maximum(gt[b, :placed, 0], box[0]))
                * np.maximum(0, np.minimum(gt[b, :placed, 3], box[3]) - np.maximum(gt[b, :placed, 1], box[1]))
            ).max() > 0:
                continue
            glyph = np.full((h, w, 3), 245, np.uint8)
            for _s in range(5):
                sx, sy = rng.randint(0, max(1, w - 6)), rng.randint(0, max(1, h - 6))
                glyph[sy: sy + rng.randint(3, h - sy + 1), sx: sx + max(2, w // 8)] = rng.randint(10, 70)
                glyph[sy: sy + max(2, h // 8), sx: sx + rng.randint(3, w - sx + 1)] = rng.randint(10, 70)
            page[y0:y0 + h, x0:x0 + w] = glyph
            gt[b, placed] = box
            mask[b, placed] = True
            placed += 1
        imgs[b] = page.astype(np.float32) / 255.0
    return imgs, gt, mask


def detection_recall(
    params, cfg: DetectorConfig, image01: np.ndarray, gt_boxes: np.ndarray,
    iou_thr: float = 0.5,
) -> float:
    """Fraction of GT boxes matched (IoU >= thr) by Detector.__call__'s
    full pipeline (forward + threshold + NMS) on one image in [0,1]."""
    d = det.Detector(params, cfg)
    pred = d((image01 * 255).astype(np.uint8))
    if not pred:
        return 0.0
    pred = np.asarray(pred)
    hit = 0
    for g in gt_boxes:
        x1 = np.maximum(pred[:, 0], g[0]); y1 = np.maximum(pred[:, 1], g[1])
        x2 = np.minimum(pred[:, 2], g[2]); y2 = np.minimum(pred[:, 3], g[3])
        inter = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
        union = ((pred[:, 2] - pred[:, 0]) * (pred[:, 3] - pred[:, 1])
                 + (g[2] - g[0]) * (g[3] - g[1]) - inter)
        if (inter / np.maximum(union, 1e-9)).max() >= iou_thr:
            hit += 1
    return hit / len(gt_boxes)
