"""HTTP serving front end (runtime/http_server.py) end-to-end at tiny config.

Covers the OpenAI-compatible surface (non-stream + SSE stream + multi-turn),
the native /ocr route with a base64 data-URI image, health/metrics, error
mapping (bad JSON, oversized prompt, image-in-history), and concurrent
requests sharing the slot pool.
"""

import base64
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image


def _post(port, path, obj, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(port, path, timeout=60):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=timeout
    ) as r:
        return json.loads(r.read())


def _sse_chunks(port, obj, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=timeout) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                chunks.append("[DONE]")
                break
            chunks.append(json.loads(payload))
    return chunks


@pytest.fixture(scope="module")
def http_server():
    from callireader_tpu.cli.common import build_engine
    from callireader_tpu.runtime.http_server import serve_http
    from callireader_tpu.runtime.serving import ContinuousBatcher

    engine = build_engine(preset="callireader-tiny", random_init_ok=True)
    batcher = ContinuousBatcher(
        engine.params["llm"], engine.cfg.llm, num_slots=2, max_len=512,
        policy=engine.policy, use_flash=False,
    )
    server, loop = serve_http(engine, batcher, port=0, model_name="tiny")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield port, loop
    server.shutdown()
    loop.shutdown()
    server.server_close()


@pytest.mark.slow
def test_health_and_models(http_server):
    port, _ = http_server
    h = _get(port, "/health")
    assert h["status"] == "ok" and h["slots_total"] == 2
    models = _get(port, "/v1/models")
    assert models["data"][0]["id"] == "tiny"


@pytest.mark.slow
def test_chat_completion_nonstream(http_server):
    port, _ = http_server
    out = _post(port, "/v1/chat/completions", {
        "model": "tiny",
        "messages": [{"role": "user", "content": "你好"}],
        "max_tokens": 4,
    })
    assert out["object"] == "chat.completion"
    choice = out["choices"][0]
    assert choice["message"]["role"] == "assistant"
    assert isinstance(choice["message"]["content"], str)
    assert choice["finish_reason"] == "length"  # random weights never hit eos
    u = out["usage"]
    assert u["completion_tokens"] == 4
    assert u["total_tokens"] == u["prompt_tokens"] + 4


@pytest.mark.slow
def test_chat_completion_stream_matches_nonstream(http_server):
    port, _ = http_server
    body = {
        "messages": [{"role": "user", "content": "作者是谁？"}],
        "max_tokens": 6,
    }
    ref = _post(port, "/v1/chat/completions", body)
    chunks = _sse_chunks(port, {**body, "stream": True})
    assert chunks[-1] == "[DONE]"
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    text = "".join(
        c["choices"][0]["delta"].get("content", "")
        for c in chunks[:-1]
        if isinstance(c, dict) and "choices" in c
    )
    finals = [c for c in chunks[:-1]
              if isinstance(c, dict) and c["choices"][0]["finish_reason"]]
    assert finals and finals[0]["choices"][0]["finish_reason"] == "length"
    assert text.strip() == ref["choices"][0]["message"]["content"]


@pytest.mark.slow
def test_multi_turn_history(http_server):
    port, _ = http_server
    system = "你是书法助手。"
    out = _post(port, "/v1/chat/completions", {
        "messages": [
            {"role": "system", "content": system},
            {"role": "user", "content": "你好"},
            {"role": "assistant", "content": "你好！"},
            {"role": "user", "content": "这幅作品的风格？"},
        ],
        "max_tokens": 3,
    })
    assert out["choices"][0]["finish_reason"] == "length"
    # same system, no history: the history pair must lengthen the prompt
    single = _post(port, "/v1/chat/completions", {
        "messages": [
            {"role": "system", "content": system},
            {"role": "user", "content": "这幅作品的风格？"},
        ],
        "max_tokens": 3,
    })
    assert out["usage"]["prompt_tokens"] > single["usage"]["prompt_tokens"]


@pytest.mark.slow
def test_ocr_route_with_data_uri(http_server):
    port, _ = http_server
    img = Image.fromarray(
        np.random.RandomState(0).randint(150, 255, (64, 48, 3), np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    out = _post(port, "/ocr", {
        "image": uri, "question": "读出图中所有文字。",
        "use_p": False, "max_new_tokens": 3,
    })
    assert isinstance(out["response"], str)
    assert out["n_tokens"] == 3


@pytest.mark.slow
def test_error_mapping(http_server):
    port, _ = http_server
    # bad JSON -> 400
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=b"{not json", headers={"Content-Type": "application/json"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400

    # image attached to a non-final message -> 400
    uri = "data:image/png;base64,AAAA"
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/chat/completions", {
            "messages": [
                {"role": "user", "content": [
                    {"type": "text", "text": "看这个"},
                    {"type": "image_url", "image_url": {"url": uri}},
                ]},
                {"role": "assistant", "content": "好的"},
                {"role": "user", "content": "继续"},
            ],
        })
    assert e.value.code == 400

    # oversized prompt -> rejected per-request (400), server stays up
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "字" * 9000}],
            "max_tokens": 2,
        })
    assert e.value.code == 400
    assert _get(port, "/health")["status"] == "ok"

    # remote URL image -> rejected (zero-egress policy)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/ocr", {"image": "https://example.com/x.jpg"})
    assert e.value.code == 400


@pytest.mark.slow
def test_concurrent_requests_share_slots(http_server):
    port, loop = http_server
    results = {}

    def hit(name, text, n):
        results[name] = _post(port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": text}],
            "max_tokens": n,
        })

    threads = [
        threading.Thread(target=hit, args=(f"r{i}", f"问题{i}", 3 + i))
        for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert len(results) == 3
    for i in range(3):
        assert results[f"r{i}"]["usage"]["completion_tokens"] == 3 + i
    snap = loop.snapshot()
    assert snap["requests_completed"] >= 3
    assert snap["tokens_generated"] > 0


@pytest.mark.slow
def test_http_server_sharded_mesh():
    """The HTTP stack over an SPMD engine + KV-sharded batcher on the
    virtual 8-device platform: same completion text as the unsharded module
    server would produce (bf16 random weights decode deterministically)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from callireader_tpu.cli.common import build_engine
    from callireader_tpu.runtime.http_server import serve_http
    from callireader_tpu.runtime.serving import ContinuousBatcher

    def run_once(mesh_spec):
        engine = build_engine(
            preset="callireader-tiny", random_init_ok=True, mesh_spec=mesh_spec,
        )
        batcher = ContinuousBatcher(
            engine.params["llm"], engine.cfg.llm, num_slots=2, max_len=512,
            policy=engine.policy, use_flash=False, mesh=engine.mesh,
        )
        server, loop = serve_http(engine, batcher, port=0, model_name="tiny")
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            out = _post(port, "/v1/chat/completions", {
                "messages": [{"role": "user", "content": "你好"}],
                "max_tokens": 4,
            })
        finally:
            server.shutdown()
            loop.shutdown()
            server.server_close()
        return out["choices"][0]["message"]["content"]

    sharded = run_once("tensor=2,fsdp=2,data=2")
    plain = run_once(None)
    assert sharded == plain


@pytest.mark.slow
def test_scheduler_soak_mixed_traffic(http_server):
    """Soak the scheduler: 12 concurrent requests mixing stream/non-stream,
    varying budgets, one oversized (rejected) and one with history — all
    must complete, counters must add up, and the server must stay healthy."""
    port, loop = http_server
    before = loop.snapshot()
    results = {}
    errors = {}

    def hit(i):
        try:
            if i % 4 == 2:  # streamed
                chunks = _sse_chunks(port, {
                    "messages": [{"role": "user", "content": f"流{i}"}],
                    "max_tokens": 2 + (i % 3), "stream": True,
                })
                assert chunks[-1] == "[DONE]"
                results[i] = "".join(
                    c["choices"][0]["delta"].get("content", "")
                    for c in chunks[:-1] if isinstance(c, dict) and "choices" in c
                )
            elif i == 5:  # oversized -> per-request 400
                try:
                    _post(port, "/v1/chat/completions", {
                        "messages": [{"role": "user", "content": "字" * 9000}],
                    })
                except urllib.error.HTTPError as e:
                    results[i] = f"rejected:{e.code}"
            else:
                body = {"messages": [{"role": "user", "content": f"问{i}"}],
                        "max_tokens": 2 + (i % 3)}
                if i % 4 == 3:
                    body["messages"] = [
                        {"role": "user", "content": "早"},
                        {"role": "assistant", "content": "好"},
                    ] + body["messages"]
                results[i] = _post(port, "/v1/chat/completions", body)[
                    "choices"][0]["message"]["content"]
        except Exception as e:  # pragma: no cover - diagnostic
            errors[i] = repr(e)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=900)
    assert not errors, errors
    assert len(results) == 12
    assert results[5] == "rejected:400"
    snap = loop.snapshot()
    assert snap["requests_total"] - before["requests_total"] == 12
    assert (snap["requests_completed"] - before["requests_completed"]) == 11
    assert snap["requests_rejected"] - before["requests_rejected"] == 1
    assert snap["slots_busy"] == 0 and snap["queue_depth"] == 0
    assert _get(port, "/health")["status"] == "ok"
