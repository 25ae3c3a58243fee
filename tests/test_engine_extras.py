"""dynamic_chat, region-wise crop, multi-turn history, batch_chat_ocr."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.runtime.engine import CalliReaderEngine, init_all_params
from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

CFG = callireader_tiny()


@pytest.fixture(scope="module")
def engine():
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    eng = CalliReaderEngine(CFG, params, tok, policy=FP32_POLICY, use_flash=False)
    eng.detector = lambda img: [[8.0, 8.0, 24.0, 24.0]]
    return eng


def _img(seed=0):
    return Image.fromarray(
        np.random.RandomState(seed).randint(100, 255, (80, 60, 3), np.uint8)
    )


def test_dynamic_chat(engine):
    resp = engine.dynamic_chat(_img(), "这幅书法作品内容是什么？", max_new_tokens=3)
    assert isinstance(resp, str)


def test_region_wise_chat_ocr(engine):
    resp = engine.chat_ocr(
        _img(), "读出区域 10 50 5 70 的文字", region_wise=True, max_new_tokens=3
    )
    assert isinstance(resp, str)


def test_multi_turn_history(engine):
    r1, hist = engine.chat_ocr(
        _img(), "这幅书法作品内容是什么？", return_history=True, max_new_tokens=3
    )
    assert len(hist) == 1
    r2, hist = engine.chat_ocr(
        _img(), "作者是谁？", history=hist, return_history=True, max_new_tokens=3
    )
    assert len(hist) == 2 and hist[1][1] == r2


def test_batch_chat_ocr(engine):
    out = engine.batch_chat_ocr(
        [_img(1), _img(2)], ["读出图中所有文字。"] * 2, max_new_tokens=3
    )
    assert len(out) == 2 and all(isinstance(r, str) for r in out)


def test_find_coordinates():
    assert CalliReaderEngine.find_coordinates("区域 10 20 30 40") == [10, 20, 30, 40]


def test_gray_chars_path():
    """gray_chars=True ships luma canvases; features match the host-side
    gray->RGB equivalent exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.core.config import callireader_tiny
    from callireader_tpu.core.dtypes import FP32_POLICY
    from callireader_tpu.runtime.engine import CalliReaderEngine, init_all_params
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

    cfg = callireader_tiny()
    params = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    eng_rgb = CalliReaderEngine(cfg, params, tok, policy=FP32_POLICY, use_flash=False)
    eng_gray = CalliReaderEngine(
        cfg, params, tok, policy=FP32_POLICY, use_flash=False, gray_chars=True
    )
    rng = np.random.RandomState(0)
    from callireader_tpu.vision import preprocess

    c = preprocess.char_content_canvas(cfg.force_image_size)
    chars = rng.randint(0, 255, (3, c, c, 3), np.uint8)
    # expected: luma replicated to RGB through the normal path
    lum = ((chars.astype(np.uint16)[..., 0] * 299
            + chars.astype(np.uint16)[..., 1] * 587
            + chars.astype(np.uint16)[..., 2] * 114) // 1000).astype(np.uint8)
    expected = eng_rgb.encode_char_contents(np.repeat(lum[..., None], 3, axis=-1))
    got = eng_gray.encode_char_contents(chars)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_react_agent_loop():
    """ReAct agent (runtime/agent.py, the reference's --lagent mode): a
    scripted model calls calculate then emits a final answer; tool output is
    fed back as a Response block; unknown tools are corrected; force-stop
    fires after max_turns."""
    from callireader_tpu.runtime.agent import ReActAgent

    script = iter([
        "Thought: 需要算一下\nAction: calculate\nAction Input: 6*7\n",
        "Final Answer: 答案是42",
    ])
    seen_prompts = []

    def chat_fn(q, hist):
        seen_prompts.append(q)
        return next(script), (hist or []) + [q]

    agent = ReActAgent(chat_fn)
    assert agent.chat("6乘7是多少") == "答案是42"
    assert seen_prompts[1].startswith("Response:") and "42" in seen_prompts[1]

    # unknown tool -> corrective Response, then recovery
    script2 = iter([
        "Action: google\nAction Input: x\n",
        "Final Answer: ok",
    ])
    agent2 = ReActAgent(lambda q, h: (next(script2), h))
    assert agent2.chat("q") == "ok"

    # never finalizes -> force stop reaches the model; the final turn skips
    # tool execution and returns an explicit truncation message (ADVICE r2)
    calls = []

    def loop_fn(q, h):
        calls.append(q)
        return "Thought: 继续\nAction: calculate\nAction Input: 1+1\n", h

    agent3 = ReActAgent(loop_fn, max_turns=2)
    out = agent3.chat("loop")
    assert len(calls) == 3  # loop terminated, no hang
    assert "已达到最大工具调用轮数" in out and "Action:" not in out
    from callireader_tpu.runtime.agent import FORCE_STOP

    assert FORCE_STOP in calls[-1]


def test_batch_calli_align_matches_per_image(engine):
    """The batched vision front end (one detector/OrderFormer forward, union
    char encode, chunked resample) must produce per-page outputs identical to
    per-image calli_align."""
    engine.detector = lambda img: [
        [8.0, 8.0, 24.0, 24.0], [8.0, 33.0, 24.0, 49.0], [33.0, 18.0, 49.0, 34.0]
    ]
    imgs = [np.asarray(_img(1)), np.asarray(_img(2)), np.asarray(_img(3))]
    batched = engine.batch_calli_align(imgs)
    for img, (bp, bi) in zip(imgs, batched):
        sp, si = engine.calli_align(img)
        np.testing.assert_allclose(
            np.asarray(bp), np.asarray(sp), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(si))


def test_batch_prepare_batched_vision_smoke(engine):
    """batch_chat_ocr through the batched front end: responses decode and
    histories line up (3 images, mixed questions)."""
    engine.detector = lambda img: [[8.0, 8.0, 24.0, 24.0], [33.0, 18.0, 49.0, 34.0]]
    imgs = [_img(4), _img(5), _img(6)]
    qs = ["读出图中所有文字。", "作者是谁？", "这幅书法作品内容是什么？"]
    out, hists = engine.batch_chat_ocr(
        imgs, qs, max_new_tokens=3, return_histories=True
    )
    assert len(out) == 3 and all(isinstance(o, str) for o in out)
    assert all(len(h) == 1 for h in hists)


def test_agent_multiline_action_input():
    """Action Input spanning lines (equation systems) reaches the tool
    intact instead of being truncated at the first newline."""
    from callireader_tpu.runtime.agent import ReActAgent

    received = []

    def tool(s):
        received.append(s)
        return "x=1, y=1"

    script = iter([
        "Thought: 解方程\nAction: solve\nAction Input: x+y=2,\nx-y=0",
        "Final Answer: x=1, y=1",
    ])
    agent = ReActAgent(
        lambda q, h: (next(script), h), tools={"solve": ("solver", tool)}
    )
    assert agent.chat("solve it") == "x=1, y=1"
    assert received == ["x+y=2,\nx-y=0"]


def test_batch_calli_align_mixed_page_sizes(engine):
    """VERDICT r2 #8: per-page equality with calli_align on pages of
    DIFFERENT sizes — crops land in different canvas buckets, exercising the
    multi-group fused char pipeline + reading-order reassembly."""
    rng = np.random.RandomState(7)
    sizes = [(80, 60), (200, 150), (400, 260)]
    imgs = [rng.randint(100, 255, (h, w, 3), np.uint8) for h, w in sizes]
    boxes_per = {
        (80, 60): [[8.0, 8.0, 24.0, 24.0], [33.0, 18.0, 49.0, 34.0]],
        (200, 150): [[10.0, 10.0, 90.0, 120.0], [95.0, 20.0, 140.0, 60.0],
                     [15.0, 130.0, 60.0, 190.0]],
        (400, 260): [[20.0, 20.0, 240.0, 230.0], [250.0, 30.0, 390.0, 110.0]],
    }
    engine.detector = lambda img: boxes_per[img.shape[:2]]
    batched = engine.batch_calli_align(imgs)
    assert sum(0 if p is None else 1 for p, _ in batched) == 3
    for img, (bp, bi) in zip(imgs, batched):
        sp, si = engine.calli_align(img)
        np.testing.assert_allclose(
            np.asarray(bp), np.asarray(sp), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(si))


def test_fused_char_pipeline_matches_separate_programs(engine):
    """The fused _char_pipeline + _reorder_char_parts path must equal the
    separate encode_char_contents -> _resample_vq computation (host-resize
    mode: the reference-parity path)."""
    rng = np.random.RandomState(3)
    # crops spanning multiple canvas buckets (tiny config: force_image_size 56)
    crops = [rng.randint(0, 255, (h, w, 3), np.uint8)
             for h, w in [(20, 15), (60, 45), (10, 40), (33, 33), (5, 5)]]
    saved = engine.device_resize_chars
    engine.device_resize_chars = False
    try:
        fp, fi = engine._encode_chars_fused(crops)
    finally:
        engine.device_resize_chars = saved
    # reference: old multi-program path (reading order via feature reorder)
    groups = engine._prep_char_crop_groups(crops)
    parts = [engine.encode_char_contents(stack) for _, stack in groups]
    all_idx = np.concatenate([idxs for idxs, _ in groups])
    feats = jnp.concatenate(parts, axis=0)[jnp.argsort(jnp.asarray(all_idx))]
    from callireader_tpu.vision import preprocess as pp
    from callireader_tpu.runtime.engine import CHAR_BUCKETS

    n = len(crops)
    target = pp.bucket_tiles(n, CHAR_BUCKETS)
    if target != n:
        feats = jnp.concatenate(
            [feats, jnp.zeros((target - n,) + feats.shape[1:], feats.dtype)]
        )
    sp, si = engine._resample_vq(engine.params, feats)
    np.testing.assert_allclose(
        np.asarray(fp), np.asarray(sp)[: n * engine.cfg.resampler.num_learns],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(si)[:n])


def test_batched_embed_build_matches_per_row(engine):
    """batch_build_rows' one-dispatch embed build must equal the per-row
    splice + concat exactly; a history turn (pseudo computed but no ALIGNED
    slots) must trip the host-side count check into the per-row fallback."""
    engine.detector = lambda img: [[8.0, 8.0, 24.0, 24.0], [33.0, 18.0, 49.0, 34.0]]
    # host-PIL tile path (the engine default): EXACT equality against
    # per-row host load_image; the opt-in on-device tiling is near- but not
    # bit-equal (covered by test_device_tile_pages_close_to_host)
    assert engine.device_tile_pages is False
    imgs = [np.asarray(_img(11)), np.asarray(_img(12)), np.asarray(_img(13))]
    qs = ["读出图中所有文字。", "作者是谁？", "这幅书法作品内容是什么？"]
    rows = engine.batch_build_rows(imgs, qs)

    # per-row reference build from the same aligned/pixel inputs
    from callireader_tpu.runtime import generate as gen
    from callireader_tpu.runtime.conversation import build_chat_prompt
    from callireader_tpu.runtime.engine import ALIGNED
    from callireader_tpu.vision import preprocess

    per_row = []
    for img, q in zip(imgs, qs):
        pseudo, _ = engine.calli_align(img)
        pv = preprocess.load_image(
            img, engine.cfg.force_image_size, engine.cfg.max_dynamic_patch,
            engine.cfg.use_thumbnail, as_uint8=True,
        )
        feats = engine.encode_image_tiles(pv)
        q2 = "<image>\n" + q + ALIGNED * pseudo.shape[0]
        conv = build_chat_prompt(q2)
        ids = engine._tokenize_prompt(
            engine._expand_image_tokens(conv.get_prompt(), [pv.shape[0]])
        )
        e, m = engine._build_row_embeds(ids, feats, pseudo, rows["bucket"])
        per_row.append((e, m))
    ref = jnp.concatenate([e for e, _ in per_row], axis=0)
    np.testing.assert_allclose(
        np.asarray(rows["embeds"]), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        rows["mask"], np.concatenate([m for _, m in per_row], axis=0)
    )

    # history case: pseudo exists but no ALIGNED slots -> fallback, no crash,
    # and decode still works
    hists = [[("之前的问题", "之前的回答")], None, None]
    out = engine.batch_chat_ocr(imgs, qs, histories=hists, max_new_tokens=3)
    assert len(out) == 3 and all(isinstance(o, str) for o in out)


def test_device_resize_chars_close_to_host_path(engine):
    """The device bicubic char path (raw-crop h2d + on-device [200,350]
    scale/canvas) must track the host-PIL path closely on upscaled crops and
    EXACTLY route downscale crops (max edge past the content cap) through
    the host path."""
    import jax.numpy as jnp

    from callireader_tpu.vision import preprocess as pp

    rng = np.random.RandomState(9)
    size = engine.cfg.force_image_size
    hi = pp.char_content_canvas(size)
    # upscale crops (max edge < hi) + one downscale crop (> hi)
    crops = [rng.randint(0, 255, (hi - 6, hi // 2, 3), np.uint8),
             rng.randint(0, 255, (hi // 3, hi - 8, 3), np.uint8),
             rng.randint(0, 255, (hi * 3, hi * 2, 3), np.uint8)]
    saved = engine.device_resize_chars
    try:
        engine.device_resize_chars = True
        groups, host_idx = engine._prep_char_raw_groups(crops)
        assert host_idx == [2]  # downscale crop -> host-PIL path
        assert sum(len(g[0]) for g in groups) == 2
        dp, di = engine._encode_chars_fused(crops)
        engine.device_resize_chars = False
        hp, hi_ = engine._encode_chars_fused(crops)
    finally:
        engine.device_resize_chars = saved
    dp, hp = np.asarray(dp, np.float64), np.asarray(hp, np.float64)
    assert dp.shape == hp.shape
    # pseudo embeds nearly identical; the downscale crop's rows exact
    n_learns = engine.cfg.resampler.num_learns
    np.testing.assert_allclose(dp[2 * n_learns:], hp[2 * n_learns:], rtol=1e-5, atol=1e-5)
    cos = (dp * hp).sum(-1) / np.maximum(
        np.linalg.norm(dp, axis=-1) * np.linalg.norm(hp, axis=-1), 1e-9
    )
    assert cos.min() > 0.999, cos.min()


def test_device_tile_pages_close_to_host(engine):
    """batch_tile_pages (device dynamic tiling) must reproduce the host
    load_image tiles: identical counts/order/grid, pixel values close (jax
    cubic+antialias vs PIL bicubic differ slightly in kernel windowing)."""
    from callireader_tpu.vision import preprocess

    rng = np.random.RandomState(7)
    # two shapes -> two (shape, grid) dispatch groups, interleaved to test
    # image-major reassembly
    imgs = [
        rng.randint(0, 255, (96, 64, 3), np.uint8),
        rng.randint(0, 255, (64, 96, 3), np.uint8),
        rng.randint(0, 255, (96, 64, 3), np.uint8),
    ]
    cat, counts = engine.batch_tile_pages(imgs)
    host = [
        preprocess.load_image(
            im, engine.cfg.force_image_size, engine.cfg.max_dynamic_patch,
            engine.cfg.use_thumbnail, as_uint8=True,
        )
        for im in imgs
    ]
    assert counts == [h.shape[0] for h in host]
    got = np.asarray(cat)
    ref = np.concatenate(host, axis=0)
    assert got.shape == ref.shape and got.dtype == np.uint8
    diff = np.abs(got.astype(np.int16) - ref.astype(np.int16))
    assert diff.mean() < 3.0, diff.mean()
    assert np.percentile(diff, 99) <= 30, np.percentile(diff, 99)

    # grid helper agrees with dynamic_tile on the real fixture dims
    c, r = preprocess.tile_grid(788, 2000, max_num=engine.cfg.max_dynamic_patch,
                                image_size=engine.cfg.force_image_size)
    n_host = preprocess.load_image(
        np.full((2000, 788, 3), 200, np.uint8), engine.cfg.force_image_size,
        engine.cfg.max_dynamic_patch, engine.cfg.use_thumbnail, as_uint8=True,
    ).shape[0]
    assert c * r + 1 == n_host


def test_char_canvas_lever():
    """The char-canvas FLOP lever: a non-default canvas (tiny: 84 vs 56;
    flagship analog: 364 vs 448) keeps the [200,350]-equivalent content
    scale and the (N, n_learns) pseudo-token contract, on both the
    device-resize and host-content char paths, batched == per-image."""
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    det = lambda img: [
        [8.0, 8.0, 24.0, 24.0], [8.0, 33.0, 24.0, 49.0], [33.0, 18.0, 49.0, 34.0]
    ]
    eng84 = CalliReaderEngine(
        CFG, params, tok, policy=FP32_POLICY, use_flash=False, char_canvas=84,
    )
    eng84.detector = det
    img = np.asarray(_img(1))
    ps, ix = eng84.calli_align(img)
    L = CFG.resampler.num_learns
    assert ps.shape == (3 * L, CFG.llm.hidden_size)
    assert ix.shape == (3, L)
    assert np.isfinite(np.asarray(ps)).all()
    # batched front end agrees with per-image on the non-default canvas
    (bp, bi), = eng84.batch_calli_align([img])
    np.testing.assert_allclose(np.asarray(bp), np.asarray(ps), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ix))
    # host-content path (device_resize_chars=False) accepts the canvas too
    eng_host = CalliReaderEngine(
        CFG, params, tok, policy=FP32_POLICY, use_flash=False,
        char_canvas=84, device_resize_chars=False,
    )
    eng_host.detector = det
    ps_h, ix_h = eng_host.calli_align(img)
    assert ps_h.shape == ps.shape and ix_h.shape == ix.shape
    # canvas produces DIFFERENT features than the default (it is a real
    # approximation lever, not a no-op)
    eng_def = CalliReaderEngine(
        CFG, params, tok, policy=FP32_POLICY, use_flash=False,
    )
    eng_def.detector = det
    ps_d, _ = eng_def.calli_align(img)
    assert not np.allclose(np.asarray(ps_d), np.asarray(ps), atol=1e-5)


def test_char_canvas_validation():
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    with pytest.raises(ValueError):  # odd patch grid (70/14 = 5)
        CalliReaderEngine(CFG, params, tok, use_flash=False, char_canvas=70)
    with pytest.raises(ValueError):  # cannot hold the content scale
        CalliReaderEngine(CFG, params, tok, use_flash=False, char_canvas=28)


def test_char_window_is_pure_scheduling(engine):
    """char_window (crops per fused dispatch — the live-set knob) must not
    change outputs at all: window 2 == default window on a 3-char page."""
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    det = lambda img: [
        [8.0, 8.0, 24.0, 24.0], [8.0, 33.0, 24.0, 49.0], [33.0, 18.0, 49.0, 34.0]
    ]
    img = np.asarray(_img(1))
    outs = {}
    for w in (None, 2):
        e = CalliReaderEngine(
            CFG, params, tok, policy=FP32_POLICY, use_flash=False, char_window=w,
        )
        e.detector = det
        (bp, bi), = e.batch_calli_align([img])
        outs[w] = (np.asarray(bp), np.asarray(bi))
    np.testing.assert_allclose(outs[None][0], outs[2][0], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(outs[None][1], outs[2][1])
