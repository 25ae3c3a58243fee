"""End-of-round benchmark: CalliBench-style full-page recognition throughput.

Measures the COMPLETE chat_ocr pipeline on the flagship single-chip config
(callireader-2b: full CalliReader layer topology, depth reduced to fit one
v5e chip in bf16), on a synthetic page that structurally matches the
reference's examples/0.jpg fixture (788x2000, 96 ink chars in 6 columns):

  per image: dynamic tiling -> ViT -> projector         (device)
             YOLO detector forward on the full page     (device)
             dedup -> kmeans -> merge -> OrderFormer -> per-column sort (host)
             96 char crops -> scale/pad (native lib) -> luma transfer ->
             ViT -> perceiver resampler -> cosine VQ -> denorm
             prompt build + pseudo/image token splice
  then:      ONE prefill + ONE fused on-device decode loop (256 tokens) for
             the whole batch — decode HBM traffic amortizes across images,
             the structural win over the reference's sequential evaluate.py
             loop (evaluate.py:142-143).

The detector carries random weights (no trained checkpoint is shipped), so
its forward pass is timed for cost but the box pipeline runs on the page's
known ground-truth boxes — realistic box counts, deterministic behavior.

Reported (ONE JSON line):
  value        imgs/sec = BATCH / median(per-batch completion intervals)
  p50_ttft_ms  median time from image start to first token (vision + align +
               prefill + first-logits readback), single-request
  spread       (max-min)/median of the batch intervals (run stability)
The reference publishes no numbers (BASELINE.md) -> vs_baseline is null.
"""

import json
import sys
import time

import numpy as np

BATCH = 8
N_BATCHES = 8
N_TTFT = 3
DECODE_TOKENS = 256
PAGE_W, PAGE_H = 788, 2000
N_COLS, CHARS_PER_COL = 6, 16


def make_page(seed: int = 0):
    """Synthetic calligraphy page: 96 dark glyph blocks in 6 columns on paper,
    structurally matching the reference fixture (examples/0.json layout).
    Returns (page uint8 (H, W, 3), flat boxes [[x1,y1,x2,y2], ...])."""
    rng = np.random.RandomState(seed)
    page = np.full((PAGE_H, PAGE_W, 3), 235, np.uint8)
    page += rng.randint(0, 18, page.shape).astype(np.uint8)  # paper texture
    boxes = []
    col_w = PAGE_W // (N_COLS + 1)
    for c in range(N_COLS):
        x0 = PAGE_W - (c + 1) * col_w - 20
        for r in range(CHARS_PER_COL):
            y0 = 40 + r * (PAGE_H - 80) // CHARS_PER_COL
            w = rng.randint(55, 75)
            h = rng.randint(55, 75)
            # glyph: random ink strokes
            glyph = np.full((h, w, 3), 245, np.uint8)
            for _ in range(6):
                sx, sy = rng.randint(0, w - 8), rng.randint(0, h - 8)
                glyph[sy : sy + rng.randint(4, h - sy), sx : sx + rng.randint(3, 8)] = rng.randint(10, 60)
                glyph[sy : sy + rng.randint(3, 8), sx : sx + rng.randint(4, w - sx)] = rng.randint(10, 60)
            page[y0 : y0 + h, x0 : x0 + w] = glyph
            boxes.append([float(x0), float(y0), float(x0 + w), float(y0 + h)])
    return page, boxes


def main():
    import jax
    import jax.numpy as jnp

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from callireader_tpu.core.config import callireader_2b
    from callireader_tpu.models import internlm2
    from callireader_tpu.runtime import generate as gen
    from callireader_tpu.runtime.conversation import build_chat_prompt
    from callireader_tpu.runtime.engine import (
        ALIGNED, CalliReaderEngine, init_all_params,
    )
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer
    from callireader_tpu.vision import preprocess

    cfg = callireader_2b()
    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"[bench] platform={jax.devices()[0].platform}", file=sys.stderr)

    params = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    engine = CalliReaderEngine(cfg, params, tok, use_flash=on_tpu)

    page, gt_flat = make_page()
    real_detector = engine.detector

    class StubDetector:
        """Runs the REAL detector forward (cost counted) but returns the
        page's ground-truth boxes (the shipped detector carries random
        weights, so its raw boxes would make box counts nondeterministic)."""

        def __call__(self, img):
            _ = real_detector(img)
            return [list(b) for b in gt_flat]

        def batch(self, images):
            _ = real_detector.batch(images)
            return [[list(b) for b in gt_flat] for _ in images]

    engine.detector = StubDetector()

    def build_row():
        """The full chat_ocr front half for one image -> (embeds, mask)."""
        pseudo, _idx = engine.calli_align(page)
        pixel_values = preprocess.load_image(
            page, cfg.force_image_size, cfg.max_dynamic_patch,
            cfg.use_thumbnail, as_uint8=True,
        )
        img_embeds = engine.encode_image_tiles(pixel_values)
        q = "<image>\n读出图中所有文字。" + ALIGNED * pseudo.shape[0]
        conv = build_chat_prompt(q)
        query = engine._expand_image_tokens(conv.get_prompt(), [pixel_values.shape[0]])
        ids = engine._tokenize_prompt(query)
        bucket = gen.bucket_length(len(ids))
        return engine._build_row_embeds(ids, img_embeds, pseudo, bucket)

    gcfg = gen.GenerateConfig(
        max_new_tokens=DECODE_TOKENS,
        eos_token_ids=(-1,),  # random weights: fixed decode budget
        repetition_penalty=1.0,
    )

    def build_batch():
        """The engine's batched vision front end: one detector + one
        OrderFormer forward for the whole batch, union char encode in
        bounded windows, chunked tile encode — all async dispatch."""
        return engine.batch_build_rows(
            [page] * BATCH, ["读出图中所有文字。"] * BATCH, use_p=True,
        )

    def launch(rows):
        """One prefill + one fused decode for previously built rows."""
        return engine.batch_prepare(
            [], [], prepared_rows=rows, max_new_tokens=DECODE_TOKENS,
            repetition_penalty=1.0, eos_token_ids=(-1,),
        )

    def dispatch_batch():
        return launch(build_batch())

    # ---- warmup: compiles every program in the path ----
    t0 = time.time()
    prepared = dispatch_batch()
    assert (np.asarray(prepared["lengths"]) == DECODE_TOKENS).all()  # full sync
    print(f"[bench] warmup: {time.time()-t0:.1f}s", file=sys.stderr)
    print(
        f"[bench] per-image work: {len(gt_flat)} chars, "
        f"{preprocess.load_image(page, cfg.force_image_size, cfg.max_dynamic_patch, cfg.use_thumbnail).shape[0]} tiles, "
        f"{DECODE_TOKENS} decode tokens",
        file=sys.stderr,
    )

    # ---- TTFT: single image, vision+align+prefill+first-logits readback ----
    ttfts = []
    for _ in range(N_TTFT):
        t0 = time.time()
        e, m = build_row()
        logits, _cache = internlm2.prefill(
            engine.params["llm"], cfg.llm, inputs_embeds=e,
            attention_mask=jnp.asarray(m),
            max_len=e.shape[1] + DECODE_TOKENS, use_flash=on_tpu,
        )
        first = int(np.asarray(jnp.argmax(logits[0])))  # d2h sync
        ttfts.append((time.time() - t0) * 1e3)
    p50_ttft = float(np.median(ttfts))
    print(f"[bench] TTFT ms: {[round(t) for t in ttfts]} -> p50 {p50_ttft:.0f}", file=sys.stderr)

    # ---- throughput: pipelined batches, per-batch completion intervals ----
    # One generate in flight; batch N+1's vision/box/transfer work is issued
    # BEFORE syncing batch N's decode, so the char h2d rides the DMA engines
    # while the decode loop owns the compute core (+68% over sequential).
    engine.timings.spans.clear()
    marks = [time.time()]
    prev = dispatch_batch()
    for _ in range(N_BATCHES - 1):
        # batch N+1's vision work overlaps batch N's in-flight decode, but
        # its generate (and KV cache) launches only after batch N retires —
        # two live caches crowd HBM (measured slower)
        nxt_rows = build_batch()
        assert (np.asarray(prev["lengths"]) == DECODE_TOKENS).all()  # sync N
        marks.append(time.time())
        prev = launch(nxt_rows)
    assert (np.asarray(prev["lengths"]) == DECODE_TOKENS).all()
    marks.append(time.time())

    intervals = np.diff(marks)
    # steady-state intervals: the first carries the unoverlapped prep of
    # batch 1 (nothing was in flight yet) and the last is only batch N's
    # residual decode (its prep was counted earlier) — both are structural
    # artifacts of the one-in-flight pipeline, not throughput signal
    steady = intervals[1:-1] if len(intervals) >= 4 else intervals
    med = float(np.median(steady))
    ips = BATCH / med
    # IQR-based spread: the dev tunnel occasionally stalls for minutes mid
    # run (observed 264s against 9s steady intervals); a max-min spread would
    # report the tunnel, not the pipeline
    q25, q75 = np.percentile(steady, [25, 75])
    spread = float((q75 - q25) / med)
    worst = float(steady.max())
    print(
        f"[bench] host-stage totals: "
        f"{ {k: round(v, 2) for k, v in engine.timings.spans.items()} }",
        file=sys.stderr,
    )
    print(
        f"[bench] batch intervals: {[round(v, 2) for v in intervals]}s "
        f"(median {med:.2f}, spread {spread:.2f}) -> {ips:.4f} imgs/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "full_page_pipeline_imgs_per_sec_per_chip",
                "value": round(ips, 4),
                "unit": "imgs/sec",
                "vs_baseline": None,
                "p50_ttft_ms": round(p50_ttft, 1),
                "interval_spread": round(spread, 3),
                "worst_interval_s": round(worst, 2),
                "batches": [round(float(v), 3) for v in intervals],
            }
        )
    )


if __name__ == "__main__":
    main()
