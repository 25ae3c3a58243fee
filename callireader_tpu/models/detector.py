"""YOLOv8-style anchor-free single-class character detector, in JAX.

The reference uses an externally trained ultralytics checkpoint
(`YOLO("./params/best.pt")`, inference.py:98, config/configu.py:62) as the
character detector feeding the slicing priors. Here the same architecture
family (CSP backbone + C2f blocks + SPPF + PAN neck + decoupled DFL head) is
implemented natively in JAX so detection runs jitted on TPU; a converter in
runtime/weights.py maps ultralytics state dicts onto this pytree when a
trained checkpoint is available.

Structure (scale "n": depth 0.33 / width 0.25):
  backbone: stem P1 -> P2..P5 Conv(stride 2) + C2f, SPPF on P5
  neck: FPN up (P5->P4->P3) + PAN down, C2f fusions
  head: per-scale box branch (-> 4*reg_max DFL bins) + cls branch (-> nc)
  decode: DFL expectation -> ltrb around anchor centers, strides (8,16,32)
  NMS: host-side numpy over conf-filtered candidates.

BN is folded at load time for inference (fold_batchnorm); training keeps raw
BN statistics.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import DetectorConfig

Params = Dict[str, Any]


def _ch(base: int, w: float, max_ch: int) -> int:
    return min(int(round(base * w / 8) * 8) if base * w % 8 else int(base * w), max_ch)


def _depth(n: int, d: float) -> int:
    return max(1, round(n * d))


def channels(cfg: DetectorConfig) -> List[int]:
    w, mc = cfg.width_mult, cfg.max_channels
    return [
        max(8, int(64 * w)), max(8, int(128 * w)), max(8, int(256 * w)),
        max(8, int(512 * w)), max(8, int(min(1024, mc) * w)),
    ]


# ---------------------------------------------------------------------------
# param init
# ---------------------------------------------------------------------------


def _conv_init(key, cin, cout, k):
    fan_in = cin * k * k
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (k, k, cin, cout), jnp.float32, -bound, bound)


def _conv_block(key, cin, cout, k):
    return {
        "w": _conv_init(key, cin, cout, k),
        "b": jnp.zeros((cout,), jnp.float32),  # post-BN-fold bias
    }


def _c2f(key, cin, cout, n, shortcut):
    c = cout // 2
    ks = jax.random.split(key, 2 + 2 * n)
    blocks = []
    for i in range(n):
        blocks.append({
            "cv1": _conv_block(ks[2 + 2 * i], c, c, 3),
            "cv2": _conv_block(ks[3 + 2 * i], c, c, 3),
        })
    del shortcut  # structural: backbone C2f uses residuals, neck does not
    return {
        "cv1": _conv_block(ks[0], cin, cout, 1),
        "cv2": _conv_block(ks[1], (2 + n) * c, cout, 1),
        "blocks": blocks,
    }


def init_params(key: jax.Array, cfg: DetectorConfig) -> Params:
    ch = channels(cfg)
    d = cfg.depth_mult
    n3, n6 = _depth(3, d), _depth(6, d)
    ks = iter(jax.random.split(key, 64))
    nk = lambda: next(ks)

    c2 = ch[4] // 2
    head_c_box = max(16, ch[2] // 4, 4 * cfg.reg_max)
    head_c_cls = max(ch[2], min(cfg.num_classes, 100))

    def head_branch(cin, mid, cout):
        return {
            "cv1": _conv_block(nk(), cin, mid, 3),
            "cv2": _conv_block(nk(), mid, mid, 3),
            "out": _conv_block(nk(), mid, cout, 1),
        }

    return {
        "backbone": {
            "stem": _conv_block(nk(), 3, ch[0], 3),
            "down1": _conv_block(nk(), ch[0], ch[1], 3),
            "c2f1": _c2f(nk(), ch[1], ch[1], n3, True),
            "down2": _conv_block(nk(), ch[1], ch[2], 3),
            "c2f2": _c2f(nk(), ch[2], ch[2], n6, True),
            "down3": _conv_block(nk(), ch[2], ch[3], 3),
            "c2f3": _c2f(nk(), ch[3], ch[3], n6, True),
            "down4": _conv_block(nk(), ch[3], ch[4], 3),
            "c2f4": _c2f(nk(), ch[4], ch[4], n3, True),
            "sppf": {
                "cv1": _conv_block(nk(), ch[4], c2, 1),
                "cv2": _conv_block(nk(), c2 * 4, ch[4], 1),
            },
        },
        "neck": {
            "c2f_p4": _c2f(nk(), ch[4] + ch[3], ch[3], n3, False),
            "c2f_p3": _c2f(nk(), ch[3] + ch[2], ch[2], n3, False),
            "down_p3": _conv_block(nk(), ch[2], ch[2], 3),
            "c2f_n4": _c2f(nk(), ch[2] + ch[3], ch[3], n3, False),
            "down_p4": _conv_block(nk(), ch[3], ch[3], 3),
            "c2f_n5": _c2f(nk(), ch[3] + ch[4], ch[4], n3, False),
        },
        "head": {
            f"p{i}": {
                "box": head_branch(cin, head_c_box, 4 * cfg.reg_max),
                "cls": head_branch(cin, head_c_cls, cfg.num_classes),
            }
            for i, cin in zip((3, 4, 5), (ch[2], ch[3], ch[4]))
        },
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _conv(p, x, stride=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.silu(y + p["b"].astype(x.dtype))


def _run_c2f(p, x, shortcut):
    y = _conv(p["cv1"], x)
    a, b = jnp.split(y, 2, axis=-1)
    outs = [a, b]
    h = b
    for blk in p["blocks"]:
        y2 = _conv(blk["cv2"], _conv(blk["cv1"], h))
        h = h + y2 if shortcut else y2
        outs.append(h)
    return _conv(p["cv2"], jnp.concatenate(outs, axis=-1))


def _sppf(p, x):
    y = _conv(p["cv1"], x)
    pools = [y]
    h = y
    for _ in range(3):
        h = jax.lax.reduce_window(
            h, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1), "SAME"
        )
        pools.append(h)
    return _conv(p["cv2"], jnp.concatenate(pools, axis=-1))


def _upsample2(x):
    B, H, W, C = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _head_branch(p, x):
    h = _conv(p["cv1"], x)
    h = _conv(p["cv2"], h)
    # final conv: no activation
    y = jax.lax.conv_general_dilated(
        h, p["out"]["w"].astype(h.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["out"]["b"].astype(h.dtype)


def forward_features(params: Params, x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    if x.dtype == jnp.uint8:  # uint8 h2d path: normalize on device
        x = x.astype(jnp.float32) / 255.0
    b = params["backbone"]
    x = _conv(b["stem"], x, 2)        # P1
    x = _conv(b["down1"], x, 2)       # P2
    x = _run_c2f(b["c2f1"], x, True)
    x = _conv(b["down2"], x, 2)       # P3
    p3 = _run_c2f(b["c2f2"], x, True)
    x = _conv(b["down3"], p3, 2)      # P4
    p4 = _run_c2f(b["c2f3"], x, True)
    x = _conv(b["down4"], p4, 2)      # P5
    x = _run_c2f(b["c2f4"], x, True)
    p5 = _sppf(b["sppf"], x)

    n = params["neck"]
    u4 = _run_c2f(n["c2f_p4"], jnp.concatenate([_upsample2(p5), p4], axis=-1), False)
    u3 = _run_c2f(n["c2f_p3"], jnp.concatenate([_upsample2(u4), p3], axis=-1), False)
    d4 = _run_c2f(n["c2f_n4"], jnp.concatenate([_conv(n["down_p3"], u3, 2), u4], axis=-1), False)
    d5 = _run_c2f(n["c2f_n5"], jnp.concatenate([_conv(n["down_p4"], d4, 2), p5], axis=-1), False)
    return u3, d4, d5


def forward_raw(params: Params, cfg: DetectorConfig, x: jax.Array):
    """Per-scale raw head outputs for training (train/detector_train.py):
    [(box_logits (B,Hs,Ws,4*reg_max), cls_logits (B,Hs,Ws,nc), stride)]."""
    feats = forward_features(params, x)
    h = params["head"]
    out = []
    for feat, name, stride in zip(feats, ("p3", "p4", "p5"), (8, 16, 32)):
        out.append((
            _head_branch(h[name]["box"], feat),
            _head_branch(h[name]["cls"], feat),
            stride,
        ))
    return out


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(params: Params, cfg: DetectorConfig, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x (B, S, S, 3) normalized [0,1] -> (boxes_xyxy (B, N, 4) in input px,
    scores (B, N)) for all N anchor candidates (single class)."""
    feats = forward_features(params, x)
    h = params["head"]
    all_boxes, all_scores = [], []
    for feat, name, stride in zip(feats, ("p3", "p4", "p5"), (8, 16, 32)):
        box_logits = _head_branch(h[name]["box"], feat)  # (B,Hs,Ws,4*reg_max)
        cls_logits = _head_branch(h[name]["cls"], feat)  # (B,Hs,Ws,nc)
        B, Hs, Ws, _ = box_logits.shape
        dist = box_logits.reshape(B, Hs * Ws, 4, cfg.reg_max)
        dist = jax.nn.softmax(dist.astype(jnp.float32), axis=-1)
        bins = jnp.arange(cfg.reg_max, dtype=jnp.float32)
        ltrb = jnp.einsum("bnkr,r->bnk", dist, bins)  # (B,N,4) in stride units

        cy, cx = jnp.meshgrid(
            jnp.arange(Hs, dtype=jnp.float32) + 0.5,
            jnp.arange(Ws, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        centers = jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1)  # (N,2)
        x1y1 = (centers - ltrb[..., :2]) * stride
        x2y2 = (centers + ltrb[..., 2:]) * stride
        all_boxes.append(jnp.concatenate([x1y1, x2y2], axis=-1))
        score = jax.nn.sigmoid(cls_logits.astype(jnp.float32)).max(axis=-1)
        all_scores.append(score.reshape(B, Hs * Ws))
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_scores, axis=1)


# ---------------------------------------------------------------------------
# postprocess (host)
# ---------------------------------------------------------------------------


def nms_numpy(boxes: np.ndarray, scores: np.ndarray, iou_thr: float, max_det: int) -> np.ndarray:
    """Greedy NMS. boxes (N,4) xyxy; returns kept indices."""
    order = scores.argsort()[::-1]
    keep = []
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
    while order.size > 0 and len(keep) < max_det:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        iou = inter / np.maximum(areas[i] + areas[order[1:]] - inter, 1e-9)
        order = order[1:][iou <= iou_thr]
    return np.asarray(keep, np.int64)


def letterbox(image: np.ndarray, size: int) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Resize keeping aspect, pad to (size, size) with gray. Returns
    (padded uint8, scale, (pad_x, pad_y)) — uint8 so the h2d ships 4x fewer
    bytes (normalization happens on device in forward)."""
    h, w = image.shape[:2]
    scale = min(size / h, size / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    from PIL import Image as PILImage

    resized = np.asarray(
        PILImage.fromarray(image).resize((nw, nh), PILImage.BILINEAR), np.uint8
    )
    out = np.full((size, size, 3), 114, np.uint8)
    px, py = (size - nw) // 2, (size - nh) // 2
    out[py : py + nh, px : px + nw] = resized
    return out, scale, (px, py)


def save_npz(path: str, params: Params) -> None:
    """Flatten the detector pytree into one committable .npz ('/'-joined key
    paths; list indices become numeric segments). The trained character
    detector is ~5 MB — small enough to ship in-repo (assets/), the TPU
    analogue of the reference's params/best.pt (config/configu.py:62)."""
    flat: Dict[str, np.ndarray] = {}

    def rec(prefix: str, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else str(k), v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(f"{prefix}/{i}", v)
        else:
            a = np.asarray(node)
            if a.dtype == np.float32:  # storage-only: halves the file
                a = a.astype(np.float16)
            flat[prefix] = a

    rec("", params)
    np.savez_compressed(path, **flat)


def load_npz(path: str) -> Params:
    """Inverse of save_npz: rebuild the nested pytree (numeric-keyed dicts
    become lists)."""
    data = np.load(path)
    root: Dict[str, Any] = {}
    for key in data.files:
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        a = data[key]
        if a.dtype == np.float16:  # f16 is storage-only; compute in f32
            a = a.astype(np.float32)
        node[parts[-1]] = jnp.asarray(a)

    def unflatten(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [unflatten(node[k]) for k in sorted(node, key=int)]
        return {k: unflatten(v) for k, v in node.items()}

    return unflatten(root)


class Detector:
    """ultralytics-YOLO-like callable: image array -> list of xyxy boxes."""

    def __init__(self, params: Params, cfg: DetectorConfig):
        self.params = params
        self.cfg = cfg

    def __call__(self, image_array: np.ndarray) -> List[List[float]]:
        return self.batch([image_array])[0]

    def dispatch(self, images: List[np.ndarray]):
        """Async half of ``batch``: letterbox + uint8 h2d + one forward for N
        pages, WITHOUT reading the result back. Returns an opaque handle for
        ``fetch``. Safe to call while a decode program is in flight — the
        d2h readback (which the tunnel serializes behind any running
        program) is deferred, so a pipeline can hide the host resize, the
        h2d bytes, and the dispatch RPC under device compute."""
        cfg = self.cfg
        metas = [letterbox(im, cfg.img_size) for im in images]
        stack = np.stack([m[0] for m in metas])
        dev_boxes, dev_scores = forward(self.params, cfg, jnp.asarray(stack))
        return dev_boxes, dev_scores, metas

    def fetch(self, handle) -> Tuple[np.ndarray, np.ndarray, list]:
        """Blocking half: one small d2h of all anchor candidates."""
        dev_boxes, dev_scores, metas = handle
        return np.asarray(dev_boxes), np.asarray(dev_scores), metas

    def postprocess(
        self, images: List[np.ndarray], fetched
    ) -> List[List[List[float]]]:
        """Pure-host tail: per-image conf filter + NMS + unletterbox."""
        cfg = self.cfg
        all_boxes, all_scores, metas = fetched
        out: List[List[List[float]]] = []
        for i, (image_array, (_, scale, (px, py))) in enumerate(zip(images, metas)):
            boxes, scores = all_boxes[i], all_scores[i]
            m = scores >= cfg.conf_threshold
            boxes, scores = boxes[m], scores[m]
            if len(boxes) == 0:
                out.append([])
                continue
            keep = nms_numpy(boxes, scores, cfg.iou_threshold, cfg.max_detections)
            boxes = boxes[keep].copy()
            boxes[:, [0, 2]] = (boxes[:, [0, 2]] - px) / scale
            boxes[:, [1, 3]] = (boxes[:, [1, 3]] - py) / scale
            h, w = image_array.shape[:2]
            boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w)
            boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h)
            out.append(boxes.tolist())
        return out

    def batch(self, images: List[np.ndarray]) -> List[List[List[float]]]:
        """One forward for N letterboxed pages (amortizes the dispatch and
        fills the MXU), then per-image host NMS + unletterbox."""
        return self.postprocess(images, self.fetch(self.dispatch(images)))
