"""OrderFormer: reading-order regression over character/column boxes.

Parity target: /root/reference/models/model.py:210-526.
  - Transformer: Linear(4->256) embed, 4x post-LN torch TransformerEncoderLayer
    (8 heads, ffn 2048, ReLU), Linear(256->1) decode (:210-226).
  - predict(): normalize boxes by page w/h, translate to min corner, sort by
    distance to origin, pad to max_boxes, regress ranks, decode via double
    argsort (:327-332, :419-472).
  - postprocess(): re-permute sliding windows of 3 boxes that form a visual row
    (:492-526).

The model forward is jitted with a static box-capacity pad (50); all list/dict
juggling stays host-side numpy — it is O(#columns) tiny.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from callireader_tpu.core.config import OrderFormerConfig
from callireader_tpu.core.dtypes import DTypePolicy, FP32_POLICY
from callireader_tpu.models.internvit import layer_norm

Params = Dict[str, Any]
LN_EPS = 1e-5


def init_params(key: jax.Array, cfg: OrderFormerConfig, dtype=jnp.float32) -> Params:
    L, E, F = cfg.num_layers, cfg.model_dim, cfg.ff_dim
    ks = jax.random.split(key, 8)
    init = jax.nn.initializers.xavier_uniform()

    def w(k, shape):
        return init(k, shape, jnp.float32).astype(dtype)

    return {
        "embed_kernel": w(ks[0], (cfg.input_dim, E)),
        "embed_bias": jnp.zeros((E,), dtype),
        "layers": {
            "in_proj_kernel": w(ks[1], (L, E, 3 * E)),
            "in_proj_bias": jnp.zeros((L, 3 * E), dtype),
            "out_proj_kernel": w(ks[2], (L, E, E)),
            "out_proj_bias": jnp.zeros((L, E), dtype),
            "norm1_scale": jnp.ones((L, E), dtype),
            "norm1_bias": jnp.zeros((L, E), dtype),
            "norm2_scale": jnp.ones((L, E), dtype),
            "norm2_bias": jnp.zeros((L, E), dtype),
            "ff1_kernel": w(ks[3], (L, E, F)),
            "ff1_bias": jnp.zeros((L, F), dtype),
            "ff2_kernel": w(ks[4], (L, F, E)),
            "ff2_bias": jnp.zeros((L, E), dtype),
        },
        "decode_kernel": w(ks[5], (E, cfg.output_dim)),
        "decode_bias": jnp.zeros((cfg.output_dim,), dtype),
    }


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(params: Params, cfg: OrderFormerConfig, x: jax.Array) -> jax.Array:
    """x (B, max_boxes, 4) -> rank scores (B, max_boxes, 1). fp32 math."""
    policy: DTypePolicy = FP32_POLICY
    x = x.astype(jnp.float32)
    B, S, _ = x.shape
    H = cfg.num_heads
    E = cfg.model_dim
    Dh = E // H

    x = x @ params["embed_kernel"] + params["embed_bias"]

    def body(x, p):
        # torch post-LN encoder layer: x = norm1(x + attn(x)); x = norm2(x + ff(x))
        qkv = x @ p["in_proj_kernel"] + p["in_proj_bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        s = jnp.einsum("bhid,bhjd->bhij", q, k) / (Dh**0.5)
        a = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhij,bhjd->bhid", a, v).transpose(0, 2, 1, 3).reshape(B, S, E)
        ctx = ctx @ p["out_proj_kernel"] + p["out_proj_bias"]
        x = layer_norm(x + ctx, p["norm1_scale"], p["norm1_bias"], LN_EPS, policy)

        h = jax.nn.relu(x @ p["ff1_kernel"] + p["ff1_bias"])
        h = h @ p["ff2_kernel"] + p["ff2_bias"]
        x = layer_norm(x + h, p["norm2_scale"], p["norm2_bias"], LN_EPS, policy)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x @ params["decode_kernel"] + params["decode_bias"]


# ---------------------------------------------------------------------------
# host-side predict pipeline
# ---------------------------------------------------------------------------


def _decode_ranks(scores: np.ndarray, n: int) -> np.ndarray:
    """models/model.py:327-332 — double argsort => 1-based ranks."""
    flat = scores.reshape(-1)[:n]
    order = np.argsort(flat, kind="stable")
    ranks = np.argsort(order, kind="stable")
    return ranks + 1


def _ordered_permute(b1, b2, b3):
    """models/model.py:493-513 — right-to-left x order when three boxes sit on
    one visual row of similar size, else keep order."""
    hs = [b1[3] - b1[1], b2[3] - b2[1], b3[3] - b3[1]]
    c = [[(b[0] + b[2]) / 2, (b[1] + b[3]) / 2] for b in (b1, b2, b3)]
    s = [(b[2] - b[0]) * (b[3] - b[1]) for b in (b1, b2, b3)]
    ymax_diff = max(
        abs(c[0][1] - c[1][1]), abs(c[0][1] - c[2][1]), abs(c[1][1] - c[2][1])
    )
    if ymax_diff < min(hs) and (max(s) > 0 and min(s) / max(s) > 0.7):
        vals = [c[0][0], c[1][0], c[2][0]]
    else:
        vals = [3, 2, 1]
    idx = sorted(range(3), key=lambda i: vals[i], reverse=True)
    return idx


def postprocess(results: Dict[int, List[float]], width: float, height: float) -> Dict[int, List[float]]:
    """Sliding-window-of-3 re-permutation (models/model.py:492-526)."""
    keys = list(results.keys())
    boxes = [
        [b[0] / width, b[1] / height, b[2] / width, b[3] / height]
        for b in results.values()
    ]
    for i in range(len(keys) - 2):
        order = _ordered_permute(boxes[i], boxes[i + 1], boxes[i + 2])
        j = keys[i]
        boxes[i], boxes[i + 1], boxes[i + 2] = (
            boxes[i + order[0]], boxes[i + order[1]], boxes[i + order[2]]
        )
        results[j], results[j + 1], results[j + 2] = (
            results[j + order[0]], results[j + order[1]], results[j + order[2]]
        )
    return results


def _prep_inputs(cfg: OrderFormerConfig, shapes: List[Dict], w: float, h: float):
    """shapes -> (model input row (max_boxes, input_dim), ordered flat labels)
    — the host half of predict (models/model.py:419-457)."""
    entries = []
    xs, ys = [], []
    for obj in shapes:
        p = obj["points"]
        flat = [p[0][0], p[0][1], p[1][0], p[1][1]]
        xs.extend([p[0][0] / w, p[1][0] / w])
        ys.extend([p[0][1] / h, p[1][1] / h])
        entries.append(flat)
    xmin, ymin = min(xs), min(ys)
    norm = []
    for i, flat in enumerate(entries):
        coord = [
            xs[2 * i] - xmin, ys[2 * i] - ymin, xs[2 * i + 1] - xmin, ys[2 * i + 1] - ymin
        ]
        norm.append([coord, flat])
    # unique ordering: sort by squared distance of box center to origin
    norm.sort(key=lambda x: ((x[0][0] + x[0][2]) / 2) ** 2 + ((x[0][1] + x[0][3]) / 2) ** 2)

    n = min(len(norm), cfg.max_boxes)
    row = np.zeros((cfg.max_boxes, cfg.input_dim), np.float32)
    labels = []
    for i, (coord, flat) in enumerate(norm[:n]):
        row[i] = coord
        labels.append(flat)
    return row, labels


def _decode_result(scores_row, labels, w, h) -> Dict[int, List[float]]:
    ranks = _decode_ranks(scores_row[None], len(labels))
    results = {int(r): l for r, l in zip(ranks, labels)}
    results = dict(sorted(results.items()))
    results = postprocess(results, w, h)
    return dict(sorted(results.items()))


def predict(
    params: Params,
    cfg: OrderFormerConfig,
    shapes: List[Dict],  # labelme-style [{"points": [[x1,y1],[x2,y2]]}, ...]
    image_width: float,
    image_height: float,
) -> Dict[int, List[float]]:
    """Returns {rank: [x1,y1,x2,y2]} sorted by rank (models/model.py:419-488)."""
    return predict_batch(params, cfg, [(shapes, image_width, image_height)])[0]


def predict_batch_dispatch(params: Params, cfg: OrderFormerConfig, pages: List):
    """Phase 1 of predict_batch: host input prep + ONE async jitted forward.
    No readback — the returned handle holds a device ref, so the call never
    blocks the host and the forward queues behind whatever is already in
    flight (a pipelined caller dispatches this under an in-flight decode and
    pays only the tiny d2h in the device-free gap)."""
    rows, metas = [], []
    for shapes, w, h in pages:
        if not shapes:
            metas.append(None)
            continue
        row, labels = _prep_inputs(cfg, shapes, w, h)
        metas.append((len(rows), labels, w, h))
        rows.append(row)
    scores_dev = (
        forward(params, cfg, jnp.asarray(np.stack(rows))) if rows else None
    )
    return scores_dev, metas, len(pages)


def predict_batch_fetch(handle) -> List[Dict[int, List[float]]]:
    """Phase 2: the (B, max_boxes, 1)-score readback + rank decode."""
    scores_dev, metas, n_pages = handle
    if scores_dev is None:
        return [{} for _ in range(n_pages)]
    scores = np.asarray(scores_dev)
    out = []
    for meta in metas:
        if meta is None:
            out.append({})
            continue
        i, labels, w, h = meta
        out.append(_decode_result(scores[i], labels, w, h))
    return out


def predict_batch(
    params: Params,
    cfg: OrderFormerConfig,
    pages: List,  # [(shapes, image_width, image_height), ...]
) -> List[Dict[int, List[float]]]:
    """One forward for N pages' column sets (amortizes the dispatch; the
    model already takes (B, max_boxes, input_dim))."""
    return predict_batch_fetch(predict_batch_dispatch(params, cfg, pages))


# ---------------------------------------------------------------------------
# training / evaluation (models/model.py:351-418: AdamW + cosine warm
# restarts, MSE on rank scores; eval reports avg loss + order accuracy)
# ---------------------------------------------------------------------------


def mse_loss(params: Params, cfg: OrderFormerConfig, boxes: jax.Array, ranks: jax.Array) -> jax.Array:
    """boxes (B, max_boxes, 4), ranks (B, max_boxes, 1) float targets
    (0 rows beyond each sample's box count, matching the padded inputs)."""
    pred = forward(params, cfg, boxes)
    return jnp.mean((pred - ranks.astype(pred.dtype)) ** 2)


def make_train_step(cfg: OrderFormerConfig, lr: float = 2e-4, weight_decay: float = 0.0,
                    t0: int = 10, t_mult: int = 2, total_steps: int = 1000):
    """-> (train_step, tx). Cosine warm restarts (T_0=10 doubling), AdamW."""
    import optax

    schedules, boundaries, t, pos = [], [], t0, 0
    while pos < total_steps:
        schedules.append(optax.cosine_decay_schedule(lr, t, alpha=1e-6 / lr))
        pos += t
        boundaries.append(pos)
        t *= t_mult
    tx = optax.adamw(optax.join_schedules(schedules, boundaries[:-1]), weight_decay=weight_decay)

    @jax.jit
    def train_step(params, opt_state, boxes, ranks):
        loss, grads = jax.value_and_grad(mse_loss)(params, cfg, boxes, ranks)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step, tx


def train_orderformer(params: Params, cfg: OrderFormerConfig, boxes: np.ndarray,
                      ranks: np.ndarray, *, batch_size: int = 4, lr: float = 2e-4,
                      weight_decay: float = 0.0, epochs: int = 10, seed: int = 0,
                      verbose: bool = False) -> Tuple[Params, float]:
    """boxes (N, max_boxes, 4) / ranks (N, max_boxes, 1) -> (best params, loss)."""
    n = len(boxes)
    steps = max(1, n // batch_size) * epochs
    train_step, tx = make_train_step(cfg, lr, weight_decay, total_steps=steps)
    opt_state = tx.init(params)
    rng = np.random.RandomState(seed)
    best, best_params = float("inf"), params
    for ep in range(epochs):
        order = rng.permutation(n)
        total, nb = 0.0, 0
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(boxes[idx]), jnp.asarray(ranks[idx])
            )
            total += float(loss); nb += 1
        avg = total / max(nb, 1)
        if verbose:
            print(f"epoch {ep + 1}/{epochs} loss {avg:.5f}")
        if avg < best:
            best, best_params = avg, params
    return best_params, best


def evaluate_orderformer(params: Params, cfg: OrderFormerConfig, boxes: np.ndarray,
                         ranks: np.ndarray, counts: np.ndarray) -> Dict[str, float]:
    """Avg MSE + exact-order accuracy (fraction of samples whose decoded
    permutation matches the target ranks; models/model.py:390-418)."""
    pred = np.asarray(forward(params, cfg, jnp.asarray(boxes)))
    mse = float(np.mean((pred - ranks) ** 2))
    correct = 0
    for i in range(len(boxes)):
        n = int(counts[i])
        got = _decode_ranks(pred[i], n)
        want = _decode_ranks(ranks[i], n)
        correct += int(np.array_equal(got, want))
    return {"loss": mse, "order_accuracy": correct / max(len(boxes), 1)}
