"""OrderFormer predict pipeline: decode, postprocess, end-to-end ordering."""

import jax
import numpy as np

from callireader_tpu.core.config import OrderFormerConfig
from callireader_tpu.models import orderformer

OCFG = OrderFormerConfig(model_dim=32, num_layers=2, num_heads=4, ff_dim=64, max_boxes=10)


def test_decode_ranks_double_argsort():
    scores = np.array([0.5, 0.1, 0.9, 0.3])
    ranks = orderformer._decode_ranks(scores, 4)
    # smallest score -> rank 1
    assert list(ranks) == [3, 1, 4, 2]


def test_postprocess_row_of_three_right_to_left():
    # three same-size boxes on one horizontal row -> reading order right-to-left
    results = {
        1: [0.0, 0.0, 10.0, 10.0],    # leftmost
        2: [20.0, 0.0, 30.0, 10.0],   # middle
        3: [40.0, 0.0, 50.0, 10.0],   # rightmost
    }
    out = orderformer.postprocess(dict(results), 100.0, 100.0)
    assert out[1] == [40.0, 0.0, 50.0, 10.0]
    assert out[2] == [20.0, 0.0, 30.0, 10.0]
    assert out[3] == [0.0, 0.0, 10.0, 10.0]


def test_postprocess_columns_untouched():
    # vertically stacked boxes (single column): ordered_permute keeps order
    results = {
        1: [0.0, 0.0, 10.0, 30.0],
        2: [0.0, 40.0, 10.0, 70.0],
        3: [0.0, 80.0, 10.0, 110.0],
    }
    out = orderformer.postprocess(dict(results), 100.0, 200.0)
    assert out == results


def test_predict_returns_rank_dict():
    params = orderformer.init_params(jax.random.PRNGKey(0), OCFG)
    shapes = [
        {"points": [[10, 10], [30, 100]]},
        {"points": [[50, 10], [70, 100]]},
        {"points": [[90, 10], [110, 100]]},
    ]
    out = orderformer.predict(params, OCFG, shapes, 200, 200)
    assert sorted(out.keys()) == [1, 2, 3]
    flat_inputs = {tuple(v) for v in out.values()}
    expected = {(10, 10, 30, 100), (50, 10, 70, 100), (90, 10, 110, 100)}
    assert {tuple(map(int, v)) for v in flat_inputs} == expected


def test_predict_empty():
    params = orderformer.init_params(jax.random.PRNGKey(0), OCFG)
    assert orderformer.predict(params, OCFG, [], 100, 100) == {}


def test_predict_caps_at_max_boxes():
    params = orderformer.init_params(jax.random.PRNGKey(0), OCFG)
    shapes = [{"points": [[i * 5, 0], [i * 5 + 4, 50]]} for i in range(15)]
    out = orderformer.predict(params, OCFG, shapes, 200, 200)
    assert len(out) == OCFG.max_boxes


def test_train_learns_right_to_left_column_order():
    """train_orderformer on synthetic calligraphy layouts (columns read
    right-to-left): exact-order accuracy on held-out layouts goes from
    near-random to high — the training loop + rank decoding learn the task
    (models/model.py:351-418 behavior)."""
    rng = np.random.RandomState(0)
    cfg = OCFG

    def gen(n):
        boxes = np.zeros((n, cfg.max_boxes, cfg.input_dim), np.float32)
        ranks = np.zeros((n, cfg.max_boxes, 1), np.float32)
        counts = np.zeros(n, np.int32)
        for s in range(n):
            k = rng.randint(3, 7)
            xs = np.sort(rng.uniform(0.05, 0.85, k))
            cols = []
            for x in xs:
                w = rng.uniform(0.04, 0.1)
                y0 = rng.uniform(0.0, 0.1)
                y1 = rng.uniform(0.8, 1.0)
                cols.append([x, y0, x + w, y1])
            # reading order: rightmost column first
            order = np.argsort([-c[0] for c in cols])
            rank_of = {int(c): r for r, c in enumerate(order)}
            # model input convention (predict): shift to origin, sort by
            # center distance to origin
            arr = np.asarray(cols, np.float32)
            arr[:, [0, 2]] -= arr[:, 0].min()
            arr[:, [1, 3]] -= arr[:, 1].min()
            d = ((arr[:, 0] + arr[:, 2]) / 2) ** 2 + ((arr[:, 1] + arr[:, 3]) / 2) ** 2
            sort_idx = np.argsort(d)
            for pos, ci in enumerate(sort_idx):
                boxes[s, pos] = arr[ci]
                ranks[s, pos, 0] = rank_of[int(ci)]
            counts[s] = k
        return boxes, ranks, counts

    tb, tr, _ = gen(96)
    hb, hr, hc = gen(24)
    import jax.numpy as jnp

    params = orderformer.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    before = orderformer.evaluate_orderformer(params, cfg, hb, hr, hc)
    trained, loss = orderformer.train_orderformer(
        params, cfg, tb, tr, batch_size=16, lr=2e-3, epochs=40
    )
    after = orderformer.evaluate_orderformer(trained, cfg, hb, hr, hc)
    assert after["order_accuracy"] >= 0.7, (before, after, loss)
    assert after["order_accuracy"] > before["order_accuracy"] + 0.3
