"""End-to-end page OCR quality on the real fixture, FULL pipeline.

The strongest recognition signal this environment permits: the fixture page
(/root/reference/examples/0.jpg) runs the COMPLETE slicing-prior + align
pipeline exactly as chat_ocr does —

  trained YOLO detector (its own boxes, not GT) -> dedup/kmeans/merge ->
  trained OrderFormer column ordering -> char crops -> trained compact
  CalliAlign (ViT -> projector -> resampler -> full-table cosine VQ)

— and the VQ'd token string is scored against the GT reading-order text with
the repo's own CalliBench full-page metrics (char-set P/R/F1 + NED,
evalx/metrics.py; reference evaluate.py:144-152). Detector noise (extra /
missed / jittered boxes vs the 96 GT chars) flows INTO the score, unlike
test_callialign_fixture.py which isolates the align stack on GT crops.

Skipped when any trained asset is missing. The LLM/vision towers are not
touched by this path, so the engine is built without them (fast on CPU).
"""

import os

import numpy as np
import pytest

ASSETS = os.path.join(os.path.dirname(__file__), "..", "callireader_tpu",
                      "assets")
FIXTURE = "/root/reference/examples/0.jpg"
FIXTURE_JSON = "/root/reference/examples/0.json"

# floor under the measured full-pipeline score — fails loudly on pipeline
# regressions, tolerates noise. Tightened as the assets improve.
# NED is a *distance* (lower is better): measured 0.131 with the v4 asset,
# ceiling 0.25 leaves room for detector jitter.
MIN_CHAR_F1 = 0.60
MAX_NED = 0.25


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="no reference fixture")
def test_full_pipeline_page_ocr_quality():
    for a in ("detector_640.npz", "orderformer.npz", "callialign.npz"):
        if not os.path.exists(os.path.join(ASSETS, a)):
            pytest.skip(f"trained asset {a} not committed yet")

    import dataclasses
    import json

    import jax.numpy as jnp
    from PIL import Image

    from callireader_tpu.core.config import get_config
    from callireader_tpu.evalx.metrics import calculate_metrics, ned
    from callireader_tpu.models import detector as det_mod
    from callireader_tpu.models.detector import load_npz
    from callireader_tpu.runtime.engine import CalliReaderEngine
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer, DEFAULT_MODEL
    from callireader_tpu.train import callialign_train as ca

    cfg = get_config("callireader-2b")
    tok = InternLM2Tokenizer(DEFAULT_MODEL)

    stack, cfg, _meta = ca.apply_v3_asset(
        cfg, os.path.join(ASSETS, "callialign.npz"), jnp.bfloat16)
    # the bench's swept detector operating point (P 0.860 R 0.958 F1 0.906)
    cfg = dataclasses.replace(
        cfg, detector=dataclasses.replace(
            cfg.detector, conf_threshold=0.5, iou_threshold=0.3))
    table = ca.align_table(cfg.llm.vocab_size, cfg.llm.hidden_size)
    params = {
        **stack,
        "detector": load_npz(os.path.join(ASSETS, "detector_640.npz")),
        "orderformer": load_npz(os.path.join(ASSETS, "orderformer.npz")),
        "align": {
            "normed_emb": table
            / jnp.maximum(jnp.linalg.norm(
                table.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
            ).astype(table.dtype),
            "mu": jnp.zeros((cfg.llm.vocab_size,), jnp.float32),
            "sigma": jnp.ones((cfg.llm.vocab_size,), jnp.float32),
        },
    }
    engine = CalliReaderEngine(cfg, params, tok, use_flash=False)

    page = np.asarray(Image.open(FIXTURE).convert("RGB"))
    _pseudo, idx = engine.calli_align(page)
    assert idx is not None
    idx = np.asarray(idx)  # (n_chars, 3)

    # per-char majority over the 3 pseudo tokens; ties -> first token
    pred_ids = []
    for row in idx:
        vals, counts = np.unique(row, return_counts=True)
        pred_ids.append(int(vals[np.argmax(counts)]))
    pred = "".join(tok.convert_ids_to_tokens(t) or "" for t in pred_ids)

    # GT reading order: the fixture JSON's shapes are already in reading
    # order (column-major right-to-left; test_orderformer_fixture pins it)
    gt = "".join(s["label"] for s in json.load(open(FIXTURE_JSON))["shapes"])

    precision, recall, f1 = calculate_metrics(pred, gt)
    n = ned(pred, gt)
    print(f"full-pipeline page OCR: {len(idx)} boxes, char F1 {f1:.3f} "
          f"(P {precision:.3f} R {recall:.3f}), NED {n:.3f}")
    assert f1 >= MIN_CHAR_F1
    assert n <= MAX_NED
