"""evaluate CLI end-to-end over a synthetic CalliBench directory tree."""

import io
import json
import os

import numpy as np
import pytest
from PIL import Image


def _write_parquet(path, annots):
    import pandas as pd

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = []
    rng = np.random.RandomState(0)
    for a in annots:
        buf = io.BytesIO()
        Image.fromarray(rng.randint(120, 255, (64, 48, 3), np.uint8)).save(buf, format="PNG")
        rows.append({"image": {"bytes": buf.getvalue()}, "annotation": json.dumps(a)})
    pd.DataFrame(rows).to_parquet(path)


@pytest.mark.slow
def test_evaluate_cli_full_page(tmp_path, monkeypatch):
    data = tmp_path / "CalliBench"
    for split in ("easy", "medium", "hard"):
        _write_parquet(
            str(data / "full_page_ocr" / split / f"{split}.parquet"),
            [{"imagePath": "x.jpg", "reference": "春眠不觉晓"}],
        )
    monkeypatch.chdir(tmp_path)

    from callireader_tpu.cli import evaluate as ev

    ev.main(
        [
            "--type", "full_page",
            "--data", str(data),
            "--save_name", "exp",
            "--preset", "callireader-tiny",
            "--random-init",
            "--use_p", "false",
        ]
    )
    for split in ("easy", "medium", "hard"):
        out = json.load(open(tmp_path / "outputs" / "exp" / f"full_page_{split}.json"))
        assert "average" in out and len(out["detailed"]) == 1


@pytest.mark.slow
def test_evaluate_cli_choice(tmp_path, monkeypatch):
    data = tmp_path / "CalliBench"
    annot = {
        "image": "a.jpg",
        "conversations": [
            {"from": "human", "value": "作者是谁？\nA: 王羲之\nB: 颜真卿\nC: 柳公权"},
            {"from": "gpt", "value": "A"},
        ],
    }
    for split in ("author", "style", "layout"):
        _write_parquet(str(data / "choice" / split / f"{split}.parquet"), [annot])
    monkeypatch.chdir(tmp_path)

    from callireader_tpu.cli import evaluate as ev

    ev.main(
        [
            "--type", "choice",
            "--data", str(data),
            "--save_name", "exp",
            "--preset", "callireader-tiny",
            "--random-init",
            "--use_p", "false",
            "--choice_limit", "1",
        ]
    )
    out = json.load(open(tmp_path / "outputs" / "exp" / "author.json"))
    assert out["summary"]["total_samples"] == 1


def test_refcoco_engine_eval(tmp_path):
    """evaluate_refcoco drives the engine end-to-end (random weights: the
    metric is 0/any, the path must not crash)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from callireader_tpu.core.config import callireader_tiny
    from callireader_tpu.core.dtypes import FP32_POLICY
    from callireader_tpu.evalx.refcoco import evaluate_refcoco
    from callireader_tpu.runtime.engine import CalliReaderEngine, init_all_params
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

    cfg = callireader_tiny()
    params = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    eng = CalliReaderEngine(cfg, params, tok, policy=FP32_POLICY, use_flash=False)
    img = Image.fromarray(np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8))
    out = evaluate_refcoco(
        eng, [{"image": img, "sents": "the seal", "bbox": [5, 5, 20, 20],
               "height": 64, "width": 64}], max_new_tokens=3,
    )
    assert 0.0 <= out["accuracy"] <= 1.0
    assert len(out["detailed"]) == 1 and "ans" in out["detailed"][0]
