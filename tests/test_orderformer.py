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
