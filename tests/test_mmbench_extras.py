"""MMBench eval, MMLU/reward metrics, sharded export."""

import base64
import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.evalx import metrics, mmbench
from callireader_tpu.runtime.engine import CalliReaderEngine, init_all_params
from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

CFG = callireader_tiny()


def test_mmlu_and_reward_metrics():
    assert metrics.mmlu_accuracy(["A", "the answer is B", "C"], ["A", "B", "D"]) == pytest.approx(200 / 3)
    assert metrics.reward_accuracy([1.0, 2.0, 0.1], [0.5, 3.0, 0.0]) == pytest.approx(200 / 3)


def test_mmbench_prompt_and_answer_extraction():
    rec = {"question": "图中是什么？", "hint": "", "A": "山", "B": "水", "C": "花", "D": ""}
    prompt = mmbench.build_prompt(rec)
    assert "A. 山" in prompt and "D." not in prompt
    assert mmbench.extract_answer("答案是 B", rec) == "B"
    assert mmbench.extract_answer("花", rec) == "C"
    assert mmbench.extract_answer("不知道", rec) is None


def test_mmbench_end_to_end(tmp_path):
    import csv

    rng = np.random.RandomState(0)
    rows = []
    for i in range(2):
        buf = io.BytesIO()
        Image.fromarray(rng.randint(0, 255, (64, 48, 3), np.uint8)).save(buf, format="PNG")
        rows.append(
            {
                "index": str(i),
                "question": "图中是什么？",
                "hint": "",
                "A": "山", "B": "水", "C": "花", "D": "鸟",
                "answer": "A",
                "image": base64.b64encode(buf.getvalue()).decode(),
            }
        )
    tsv = tmp_path / "bench.tsv"
    with open(tsv, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()), delimiter="\t")
        w.writeheader()
        for r in rows:
            w.writerow(r)

    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    engine = CalliReaderEngine(CFG, params, tok, policy=FP32_POLICY, use_flash=False)
    out = mmbench.evaluate_mmbench(
        engine, str(tsv), str(tmp_path / "res.json"), batch_size=2, max_new_tokens=3
    )
    assert out["total"] == 2 and out["scored"] == 2
    assert (tmp_path / "res.json").exists()


def test_sharded_export_roundtrip(tmp_path):
    from callireader_tpu.runtime import weights
    from callireader_tpu.train import checkpoint as ckpt

    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    out = ckpt.export_reference_format(
        params, CFG, str(tmp_path / "sharded"), max_shard_bytes=20 * 1024 * 1024
    )
    idx = json.load(open(tmp_path / "sharded" / "model.safetensors.index.json"))
    shards = set(idx["weight_map"].values())
    assert len(shards) > 1
    sd = weights.load_safetensors_dir(str(tmp_path / "sharded"))
    re_llm = weights.convert_llm(sd, CFG.llm)
    np.testing.assert_allclose(
        np.asarray(re_llm["layers"]["wq"]), np.asarray(params["llm"]["layers"]["wq"]), atol=1e-6
    )
