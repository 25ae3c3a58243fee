"""End-to-end engine tests on the tiny config with the real tokenizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.runtime.engine import ALIGNED, CalliReaderEngine, init_all_params
from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

CFG = callireader_tiny()


@pytest.fixture(scope="module")
def engine():
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    return CalliReaderEngine(CFG, params, tok, policy=FP32_POLICY, use_flash=False)


def _toy_image(w=60, h=80, seed=0):
    rng = np.random.RandomState(seed)
    arr = np.full((h, w, 3), 240, np.uint8)
    # draw a few dark "characters"
    for i, (x, y) in enumerate([(10, 10), (10, 35), (35, 20)]):
        arr[y : y + 12, x : x + 12] = rng.randint(0, 60, (12, 12, 3))
    return Image.fromarray(arr)


def test_chat_no_image(engine):
    resp = engine.chat(None, "你好", max_new_tokens=3)
    assert isinstance(resp, str)


def test_chat_with_image(engine):
    resp, hist = engine.chat(
        _toy_image(), "这幅书法作品内容是什么？", max_new_tokens=3, return_history=True
    )
    assert isinstance(resp, str)
    assert len(hist) == 1


def test_chat_ocr_with_stub_detector(engine, monkeypatch):
    boxes = [[8.0, 8.0, 24.0, 24.0], [8.0, 33.0, 24.0, 49.0], [33.0, 18.0, 49.0, 34.0]]
    monkeypatch.setattr(engine, "detector", lambda img: [list(b) for b in boxes])

    img = np.asarray(_toy_image())
    pseudo, indices = engine.calli_align(img)
    assert pseudo is not None
    n_chars = indices.shape[0]
    assert n_chars == 3
    assert pseudo.shape == (3 * CFG.resampler.num_learns, CFG.llm.hidden_size)

    resp = engine.chat_ocr(_toy_image(), "读出图中所有文字。", max_new_tokens=3)
    assert isinstance(resp, str)


def test_chat_ocr_drop_zero_filters(engine, monkeypatch):
    boxes = [[8.0, 8.0, 24.0, 24.0]]
    monkeypatch.setattr(engine, "detector", lambda img: [list(b) for b in boxes])
    img = np.asarray(_toy_image())
    pseudo_all, idx = engine.calli_align(img, drop_zero=False)
    pseudo_dz, _ = engine.calli_align(img, drop_zero=True)
    n_zero = int((np.asarray(idx).reshape(-1) == 0).sum())
    assert pseudo_dz.shape[0] == pseudo_all.shape[0] - n_zero


def test_batch_chat(engine):
    resps = engine.batch_chat(
        [_toy_image(seed=1), _toy_image(seed=2)],
        ["这幅书法作品内容是什么？", "读出图中所有文字。"],
        max_new_tokens=3,
    )
    assert len(resps) == 2 and all(isinstance(r, str) for r in resps)


def test_prompt_contains_aligned_tokens(engine, monkeypatch):
    captured = {}
    orig = engine._generate

    def spy(input_ids, img_embeds, pseudo, gen_cfg):
        captured["ids"] = input_ids
        return orig(input_ids, img_embeds, pseudo, gen_cfg)

    monkeypatch.setattr(engine, "_generate", spy)
    monkeypatch.setattr(
        engine, "detector", lambda img: [[8.0, 8.0, 24.0, 24.0], [8.0, 33.0, 24.0, 49.0]]
    )
    engine.chat_ocr(_toy_image(), "读出图中所有文字。", max_new_tokens=2)
    ids = captured["ids"]
    n_aligned = int((ids == CFG.aligned_token_id).sum())
    n_ctx = int((ids == CFG.img_context_token_id).sum())
    assert n_aligned == 2 * CFG.resampler.num_learns
    assert n_ctx > 0 and n_ctx % CFG.num_image_token == 0


@pytest.mark.slow
def test_full_decode_budget_1024(engine):
    """The full 1024-token budget path: fused while_loop decodes to the cap
    without eos (random weights + eos disabled), lengths == budget, memory
    behavior exercised at prompt-bucket + 1024 cache."""
    from callireader_tpu.runtime import generate as gen
    from callireader_tpu.models import internlm2

    ids = np.asarray(engine.tok.encode("读出图中所有文字。"), np.int32)
    bucket = gen.bucket_length(len(ids))
    embeds, mask_row = engine._build_row_embeds(ids, None, None, bucket)
    gcfg = gen.GenerateConfig(max_new_tokens=1024, eos_token_ids=(-1,))
    toks, lengths = gen.generate_from_embeds(
        engine.params["llm"], engine.cfg.llm, embeds, jnp.asarray(mask_row),
        gen_cfg=gcfg, max_cache_len=bucket + 1024,
        policy=engine.policy, use_flash=False,
    )
    assert int(np.asarray(lengths)[0]) == 1024
    assert np.asarray(toks).shape == (1, 1024)
