"""serve CLI end-to-end (tiny preset, text + image requests)."""

import json

import numpy as np
import pytest
from PIL import Image


@pytest.mark.slow
def test_serve_jsonl(tmp_path):
    img_path = str(tmp_path / "p.jpg")
    Image.fromarray(
        np.random.RandomState(0).randint(150, 255, (80, 60, 3), np.uint8)
    ).save(img_path)
    reqs = [
        {"id": "a", "question": "你好", "max_new_tokens": 3},
        {"id": "b", "question": "这幅书法作品内容是什么？", "image": img_path,
         "use_p": False, "max_new_tokens": 3},
        {"id": "c", "question": "作者是谁？", "max_new_tokens": 2},
    ]
    inp = tmp_path / "in.jsonl"
    inp.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in reqs))
    out = tmp_path / "out.jsonl"

    from callireader_tpu.cli import serve

    serve.main(
        [
            "--input", str(inp),
            "--output", str(out),
            "--slots", "2",
            "--max-len", "512",
            "--preset", "callireader-tiny",
            "--random-init",
        ]
    )
    lines = [json.loads(l) for l in open(out)]
    assert [l["id"] for l in lines] == ["a", "b", "c"]
    assert all(isinstance(l["response"], str) for l in lines)

    # paged KV cache path produces the same responses
    out2 = tmp_path / "out_paged.jsonl"
    serve.main(
        [
            "--input", str(inp),
            "--output", str(out2),
            "--slots", "2",
            "--max-len", "512",
            "--preset", "callireader-tiny",
            "--random-init",
            "--paged",
        ]
    )
    lines2 = [json.loads(l) for l in open(out2)]
    assert lines2 == lines

    # windowed decode (k>1) produces the same responses
    out3 = tmp_path / "out_windowed.jsonl"
    serve.main(
        [
            "--input", str(inp),
            "--output", str(out3),
            "--slots", "2",
            "--max-len", "512",
            "--preset", "callireader-tiny",
            "--random-init",
            "--steps-per-sync", "4",
        ]
    )
    lines3 = [json.loads(l) for l in open(out3)]
    assert lines3 == lines


@pytest.mark.slow
def test_serve_jsonl_sharded_mesh(tmp_path):
    """serve CLI with --mesh: SPMD engine + sharded-cache batcher end-to-end
    on the virtual 8-device platform, same responses as unsharded."""
    if len(__import__("jax").devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    reqs = [
        {"id": "a", "question": "你好", "max_new_tokens": 3},
        {"id": "b", "question": "作者是谁？", "max_new_tokens": 2},
    ]
    inp = tmp_path / "in.jsonl"
    inp.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in reqs))

    from callireader_tpu.cli import serve

    out_plain = tmp_path / "plain.jsonl"
    serve.main([
        "--input", str(inp), "--output", str(out_plain),
        "--slots", "2", "--max-len", "512",
        "--preset", "callireader-tiny", "--random-init",
    ])
    out_mesh = tmp_path / "mesh.jsonl"
    serve.main([
        "--input", str(inp), "--output", str(out_mesh),
        "--slots", "2", "--max-len", "512",
        "--preset", "callireader-tiny", "--random-init",
        "--mesh", "tensor=2,fsdp=2,data=2",
    ])
    plain = [json.loads(l) for l in open(out_plain)]
    mesh = [json.loads(l) for l in open(out_mesh)]
    assert [l["id"] for l in mesh] == ["a", "b"]
    assert all(isinstance(l["response"], str) for l in mesh)
    # bf16 random weights: responses should match the unsharded run
    assert mesh == plain


@pytest.mark.slow
def test_serve_oversized_prompt_fails_request_not_server(tmp_path):
    """A prompt beyond the largest bucket becomes a per-request error record;
    other requests still serve (admission-guard policy at the CLI layer)."""
    reqs = [
        {"id": "big", "question": "字" * 9000, "max_new_tokens": 2},
        {"id": "ok", "question": "你好", "max_new_tokens": 2},
    ]
    inp = tmp_path / "in.jsonl"
    inp.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in reqs))
    out = tmp_path / "out.jsonl"

    from callireader_tpu.cli import serve

    serve.main([
        "--input", str(inp), "--output", str(out),
        "--slots", "2", "--max-len", "512",
        "--preset", "callireader-tiny", "--random-init",
    ])
    lines = {json.loads(l)["id"]: json.loads(l) for l in open(out)}
    assert "error" in lines["big"] and "response" not in lines["big"]
    assert isinstance(lines["ok"]["response"], str)
