"""Trained-OrderFormer validation on the REAL reference fixture page.

The reference ships a trained reading-order checkpoint
(params/orderformer.pth, config/configu.py:61) — the rebuild's committed
analogue is callireader_tpu/assets/orderformer.npz, trained by
scripts/train_orderformer.py on synthetic column layouts (vertical RTL
columns, signature blocks, broken columns, plaques, album grids).

These tests pin: (a) the checkpoint orders the fixture page's columns into
the annotated reading order (examples/0.json `turn` fields), (b) held-out
synthetic layouts decode to the correct permutation, and (c) the CLI asset
overlay loads it for matching presets and skips mismatched (tiny) ones.
"""

import json
import os

import numpy as np
import pytest

ASSETS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "callireader_tpu", "assets",
)
CKPT = os.path.join(ASSETS, "orderformer.npz")
FIXTURE_JSON = "/root/reference/examples/0.json"

needs_assets = pytest.mark.skipif(
    not (os.path.exists(CKPT) and os.path.exists(FIXTURE_JSON)),
    reason="trained orderformer ckpt or reference fixture unavailable",
)


def _load():
    from callireader_tpu.core.config import OrderFormerConfig
    from callireader_tpu.models.detector import load_npz

    return load_npz(CKPT), OrderFormerConfig()


@needs_assets
def test_trained_orderformer_fixture_reading_order():
    """GT char boxes -> char2col columns -> OrderFormer -> per-column y-sort
    must reproduce the annotation's `turn` sequence exactly (6 RTL columns)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(ASSETS), "..", "scripts"))
    from train_orderformer import eval_fixture

    params, cfg = _load()
    m = eval_fixture(params, cfg)
    assert m["fixture_n_columns"] == 6
    assert m["fixture_covered"] == m["fixture_chars"] == 96
    assert m["fixture_kendall_tau"] == 1.0
    assert m["fixture_exact_order"] == 1


@needs_assets
def test_trained_orderformer_synthetic_columns():
    """Fresh unseen layouts (different seed from training) decode to the
    generated reading order."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(ASSETS), "..", "scripts"))
    from train_orderformer import build_dataset, eval_heldout

    params, cfg = _load()
    boxes, ranks, counts = build_dataset(cfg, 64, seed=987654)
    m = eval_heldout(params, cfg, boxes, ranks, counts)
    assert m["mean_kendall_tau"] >= 0.97, m
    assert m["exact_order_acc"] >= 0.8, m


@needs_assets
def test_cli_overlay_loads_trained_assets():
    """build_engine's overlay: loads for the deployed architecture, skips
    tiny presets (weight-shape mismatch) and checkpoint-provided modules."""
    from callireader_tpu.cli.common import _overlay_trained_assets
    from callireader_tpu.core.config import callireader_tiny, get_config

    cfg = get_config("callireader-8b")
    params = {}
    _overlay_trained_assets(params, cfg, {"detector", "orderformer"})
    assert "orderformer" in params and "detector" in params

    # checkpoint-provided modules must not be replaced
    params2 = {"orderformer": "ckpt-weights"}
    _overlay_trained_assets(params2, cfg, {"detector"})
    assert params2["orderformer"] == "ckpt-weights"

    # tiny preset: architecture differs -> no overlay
    params3 = {}
    _overlay_trained_assets(params3, callireader_tiny(), {"detector", "orderformer"})
    assert params3 == {}
