"""Train CLI end-to-end smoke: 3 iters on tiny preset, checkpoint + export."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    from callireader_tpu.core.config import callireader_tiny

    cfg = callireader_tiny()
    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.RandomState(0)
    ann = []
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (64, 48, 3), np.uint8)).save(root / f"s{i}.jpg")
        np.save(root / f"s{i}.npy", rng.randn(2, 3, cfg.llm.hidden_size).astype(np.float32))
        ann.append(
            {
                "image": f"s{i}.jpg",
                "embedding": f"s{i}.npy",
                "conversations": [
                    {"from": "human", "value": "读出图中所有文字。"},
                    {"from": "gpt", "value": "春眠不觉晓处处闻啼鸟"},
                ],
            }
        )
    ann_path = root / "ann.json"
    ann_path.write_text(json.dumps(ann, ensure_ascii=False))

    out = tmp_path / "work"
    from callireader_tpu.cli import train as train_cli

    train_cli.main(
        [
            "--data", str(ann_path),
            "--image-root", str(root),
            "--out", str(out),
            "--preset", "callireader-tiny",
            "--random-init",
            "--batch-size", "2",
            "--max-iters", "3",
            "--lora-rank", "2",
            "--lora-alpha", "4",
            "--log-interval", "1",
            "--ckpt-interval", "2",
        ]
    )
    assert (out / "train_log.jsonl").exists()
    recs = [json.loads(l) for l in open(out / "train_log.jsonl")]
    assert len(recs) >= 3 and np.isfinite(recs[-1]["loss"])
    assert (out / "final").exists()
    assert (out / "export_official" / "model.safetensors").exists()
    assert (out / "iter_2").exists()

    # resume continues from the saved step
    train_cli.main(
        [
            "--data", str(ann_path),
            "--image-root", str(root),
            "--out", str(out),
            "--preset", "callireader-tiny",
            "--random-init",
            "--batch-size", "2",
            "--max-iters", "4",
            "--lora-rank", "2",
            "--lora-alpha", "4",
            "--resume", str(out / "final"),
            "--ckpt-interval", "0",
            "--log-interval", "1",
        ]
    )
    recs = [json.loads(l) for l in open(out / "train_log.jsonl")]
    assert recs[-1]["iter"] == 4


def test_train_cli_qlora_end_to_end(tmp_path):
    """--qlora through the real CLI: int8 base + bf16 adapters train, loss is
    finite, and the deployable export dequantizes + merges to dense tensors
    (the TPU analog of xtuner's NF4 QLoRA, train/xtuner/model/internvl.py)."""
    from callireader_tpu.core.config import callireader_tiny

    cfg = callireader_tiny()
    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.RandomState(0)
    ann = []
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (64, 48, 3), np.uint8)).save(root / f"s{i}.jpg")
        np.save(root / f"s{i}.npy", rng.randn(2, 3, cfg.llm.hidden_size).astype(np.float32))
        ann.append(
            {
                "image": f"s{i}.jpg",
                "embedding": f"s{i}.npy",
                "conversations": [
                    {"from": "human", "value": "读出图中所有文字。"},
                    {"from": "gpt", "value": "春眠不觉晓处处闻啼鸟"},
                ],
            }
        )
    ann_path = root / "ann.json"
    ann_path.write_text(json.dumps(ann, ensure_ascii=False))

    out = tmp_path / "work"
    from callireader_tpu.cli import train as train_cli

    train_cli.main(
        [
            "--data", str(ann_path),
            "--image-root", str(root),
            "--out", str(out),
            "--preset", "callireader-tiny",
            "--random-init",
            "--qlora",
            "--batch-size", "2",
            "--max-iters", "2",
            "--lora-rank", "2",
            "--lora-alpha", "4",
            "--log-interval", "1",
        ]
    )
    recs = [json.loads(l) for l in open(out / "train_log.jsonl")]
    assert len(recs) >= 2 and np.isfinite(recs[-1]["loss"])
    exp = out / "export_official" / "model.safetensors"
    assert exp.exists()
    from safetensors.numpy import load_file

    sd = load_file(str(exp))
    assert not any(k.endswith("_q") or "_lora_" in k or "_scale" in k for k in sd)
