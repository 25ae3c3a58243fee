"""CalliBench harness on synthetic parquet with the tiny engine."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.evalx import callibench
from callireader_tpu.runtime.engine import CalliReaderEngine, init_all_params
from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

CFG = callireader_tiny()


@pytest.fixture(scope="module")
def engine():
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    eng = CalliReaderEngine(CFG, params, tok, policy=FP32_POLICY, use_flash=False)
    # stub detector: two character boxes on any image
    eng.detector = lambda img: [[8.0, 8.0, 24.0, 24.0], [8.0, 33.0, 24.0, 49.0]]
    return eng


def _make_parquet(tmp_path, annots, name="split.parquet"):
    import io

    import pandas as pd

    rows = []
    rng = np.random.RandomState(0)
    for a in annots:
        buf = io.BytesIO()
        Image.fromarray(
            np.full((80, 60, 3), 230, np.uint8) - rng.randint(0, 30, (80, 60, 3), np.uint8)
        ).save(buf, format="PNG")
        rows.append({"image": {"bytes": buf.getvalue()}, "annotation": json.dumps(a)})
    path = str(tmp_path / name)
    pd.DataFrame(rows).to_parquet(path)
    return path


def test_full_page_task(engine, tmp_path):
    path = _make_parquet(
        tmp_path,
        [
            {"imagePath": "a.jpg", "reference": "春眠不觉晓"},
            {"imagePath": "b.jpg", "reference": "处处闻啼鸟"},
        ],
    )
    out = callibench.test_full_page(
        engine, path, str(tmp_path / "fp.json"), max_new_tokens=3
    )
    assert len(out["detailed"]) == 2
    for rec in out["detailed"]:
        assert {"precision", "recall", "f1", "ned"} <= set(rec)
    assert (tmp_path / "fp.json").exists()


def test_full_page_batched(engine, tmp_path):
    path = _make_parquet(
        tmp_path,
        [{"imagePath": f"{i}.jpg", "reference": "春眠不觉晓"} for i in range(3)],
    )
    out = callibench.test_full_page(
        engine, path, None, batch_size=2, max_new_tokens=3
    )
    assert len(out["detailed"]) == 3


def test_region_wise_task(engine, tmp_path):
    path = _make_parquet(
        tmp_path,
        [{"imagePath": "a.jpg", "answer": "春眠", "region": [[5, 5], [50, 70]]}],
    )
    out = callibench.test_region_wise(
        engine, path, None, max_new_tokens=3
    )
    assert len(out["detailed"]) == 1


def test_choice_task(engine, tmp_path):
    annots = [
        {
            "image": "a.jpg",
            "conversations": [
                {"from": "human", "value": "作者是谁？\nA: 王羲之\nB: 颜真卿\nC: 柳公权"},
                {"from": "gpt", "value": "A"},
            ],
        }
    ]
    path = _make_parquet(tmp_path, annots)
    acc, result = callibench.test_choice(
        engine, path, None, limit=1, max_new_tokens=3
    )
    assert 0.0 <= acc <= 100.0
    assert result["summary"]["total_samples"] == 1


def test_bilingual_task(engine, tmp_path):
    annots = [
        {
            "image": "a.jpg",
            "conversations": [
                {"from": "human", "value": "请翻译并分析这幅作品。"},
                {"from": "gpt", "value": "reference answer"},
            ],
        }
    ]
    path = _make_parquet(tmp_path, annots)
    out = callibench.test_bilingual(engine, path, None, max_new_tokens=3)
    assert len(out["detailed"]) == 1
    assert {"chinese", "answer", "gt"} <= set(out["detailed"][0])


def test_stscore_judge_on_results(tmp_path):
    from callireader_tpu.evalx.judges import STScoreJudge

    result = {"detailed": [{"answer": "hello world", "gt": "hello world"}]}
    p = tmp_path / "bilingual.json"
    p.write_text(json.dumps(result))
    score = STScoreJudge().score_result_file(str(p))
    assert score["STScore"] > 0.99


def test_choice_batched(engine, tmp_path):
    annots = [
        {
            "image": f"{i}.jpg",
            "conversations": [
                {"from": "human", "value": "作者是谁？\nA: 王羲之\nB: 颜真卿\nC: 柳公权"},
                {"from": "gpt", "value": "A"},
            ],
        }
        for i in range(3)
    ]
    path = _make_parquet(tmp_path, annots, "choice_b.parquet")
    acc, result = callibench.test_choice(
        engine, path, None, limit=3, batch_size=2, max_new_tokens=3
    )
    assert result["summary"]["total_samples"] == 3


def test_bilingual_batched(engine, tmp_path):
    annots = [
        {
            "image": f"{i}.jpg",
            "conversations": [
                {"from": "human", "value": "请翻译并分析这幅作品。"},
                {"from": "gpt", "value": "ref"},
            ],
        }
        for i in range(2)
    ]
    path = _make_parquet(tmp_path, annots, "bil_b.parquet")
    out = callibench.test_bilingual(engine, path, None, batch_size=2, max_new_tokens=3)
    assert len(out["detailed"]) == 2
