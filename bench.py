"""End-of-round benchmark: CalliBench-style full-page recognition throughput.

Measures the COMPLETE chat_ocr pipeline on the flagship single-chip config
(callireader-2b: full CalliReader layer topology, depth reduced to fit one
v5e chip in bf16) on the reference fixture page /root/reference/examples/0.jpg
(788x2000, 96 chars in 6 columns; synthetic structural clone as fallback):

  per image: dynamic tiling -> ViT -> projector         (device)
             YOLO detector forward on the full page     (device)
             dedup -> kmeans -> merge -> OrderFormer -> per-column sort (host)
             char crops -> scale/pad (native lib) -> luma transfer ->
             fused ViT+resampler+VQ char pipeline (one dispatch per window)
             prompt build + pseudo/image token splice
  then:      ONE prefill + ONE fused on-device decode loop (256 tokens) for
             the whole batch — decode HBM traffic amortizes across images,
             the structural win over the reference's sequential evaluate.py
             loop (evaluate.py:142-143).

Detection is REAL when the trained checkpoint
(callireader_tpu/assets/detector_640.npz, scripts/train_detector.py) is
present: the box pipeline consumes the detector's own predictions on the real
page. Set BENCH_GT_BOXES=1 (or delete the ckpt) for the legacy GT-box stub
(forward still timed). The workload fingerprint in the JSON records which.

Measurement protocol (VERDICT r2: the single-warmup bench never reached
steady state in the cold driver environment and reported a warmup artifact):
  1. compile warmup: one full pipelined batch, synced
  2. TTFT: warm the single-image path once, then N_TTFT timed samples
  3. throughput: pipelined batches run until the last 3 intervals agree
     within 10% (cap WARM_CAP_S), THEN N_BATCHES intervals are recorded
  value  = BATCH / median(measured intervals);  spread = IQR / median

Reported (ONE JSON line): value, p50_ttft_ms, interval_spread, workload
fingerprint, convergence diagnostics. The reference publishes no numbers
(BASELINE.md) -> vs_baseline null.

Default invocation (`python bench.py`) is an ORCHESTRATOR that measures three
rows, each in its own subprocess (fresh HBM between scales), and emits ONE
combined JSON line:

  flagship_8b_int8            the TRUE 32-layer 8B on one 16 GB chip (int8
                              LLM + fused-dequant decode kernel + trained
                              compact CalliAlign) — the HEADLINE `value`
  reference_geometry_8b_int8  same flagship with BENCH_CALLIALIGN=0: the char
                              path runs the SHARED 24-layer tower at the 448
                              canvas — the geometry the reference actually
                              deploys (config/configu.py:7 `vit_model.pt`,
                              utils/utils.py:420-452), tracked every round
  compact_2b_bf16             the r4 single-chip bf16 config (flagship layer
                              topology at 8/12 layers) — continuity row

Setting BENCH_PRESET / BENCH_QUANT / BENCH_SINGLE=1 / BENCH_SMOKE=1 runs ONE
row directly in-process (all documented knob commands keep working).
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "16"))  # A/B knob. Measured ladder
# on v5e (device tiles on): b8 0.92, b16 1.01 imgs/s, b24 OOM — decode HBM
# traffic amortizes over the batch until the KV+activation budget runs out
N_BATCHES = 12  # tunnel stalls hit ~1-2 intervals/run; a wider window keeps
# the median/IQR anchored on the pipeline, not the stall
N_TTFT = 5
DECODE_TOKENS = 256

# BENCH_SMOKE=1: tiny-config CPU shakedown of the full measurement machinery
# (pipeline schedule, convergence, JSON shape) — NOT a performance number.
SMOKE = os.environ.get("BENCH_SMOKE", "") not in ("", "0")
if SMOKE:
    BATCH, N_BATCHES, N_TTFT, DECODE_TOKENS = 2, 3, 2, 8
CONVERGE_WINDOW = 3
CONVERGE_TOL = 0.10
WARM_CAP_S = 600.0
MAX_WARM_BATCHES = 24
PAGE_W, PAGE_H = 788, 2000
N_COLS, CHARS_PER_COL = 6, 16

FIXTURE_IMG = "/root/reference/examples/0.jpg"
FIXTURE_JSON = "/root/reference/examples/0.json"
DET_CKPT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "callireader_tpu", "assets", "detector_640.npz",
)


def make_page(seed: int = 0):
    """Synthetic calligraphy page, structural clone of the fixture layout
    (used only when /root/reference is unavailable). Returns
    (page uint8 (H, W, 3), flat boxes)."""
    rng = np.random.RandomState(seed)
    page = np.full((PAGE_H, PAGE_W, 3), 235, np.uint8)
    page += rng.randint(0, 18, page.shape).astype(np.uint8)
    boxes = []
    col_w = PAGE_W // (N_COLS + 1)
    for c in range(N_COLS):
        x0 = PAGE_W - (c + 1) * col_w - 20
        for r in range(CHARS_PER_COL):
            y0 = 40 + r * (PAGE_H - 80) // CHARS_PER_COL
            w = rng.randint(55, 75)
            h = rng.randint(55, 75)
            glyph = np.full((h, w, 3), 245, np.uint8)
            for _ in range(6):
                sx, sy = rng.randint(0, w - 8), rng.randint(0, h - 8)
                glyph[sy : sy + rng.randint(4, h - sy), sx : sx + rng.randint(3, 8)] = rng.randint(10, 60)
                glyph[sy : sy + rng.randint(3, 8), sx : sx + rng.randint(4, w - sx)] = rng.randint(10, 60)
            page[y0 : y0 + h, x0 : x0 + w] = glyph
            boxes.append([float(x0), float(y0), float(x0 + w), float(y0 + h)])
    return page, boxes


def load_page():
    """(page, gt_boxes, source) — the real fixture when available."""
    if os.path.exists(FIXTURE_IMG) and os.path.exists(FIXTURE_JSON):
        from PIL import Image

        img = np.asarray(Image.open(FIXTURE_IMG).convert("RGB"))
        H, W = img.shape[:2]
        with open(FIXTURE_JSON) as f:
            d = json.load(f)
        boxes = [
            [p["points"][0][0] * W, p["points"][0][1] * H,
             p["points"][1][0] * W, p["points"][1][1] * H]
            for p in d["shapes"]
        ]
        return img, boxes, "reference_fixture_0.jpg"
    page, boxes = make_page()
    return page, boxes, "synthetic_clone"


def converged(intervals):
    """Steady state = the rolling median has STOPPED IMPROVING (the r2
    failure mode was a monotonic decay measured too early). A tightness
    test (3 within 10%) never fires under tunnel jitter (~±25% around the
    true interval) and burns the measurement budget — sustained tunnel
    traffic degrades over a run, so converging fast matters."""
    if len(intervals) < 2 * CONVERGE_WINDOW:
        return False
    prev = float(np.median(intervals[-2 * CONVERGE_WINDOW : -CONVERGE_WINDOW]))
    last = float(np.median(intervals[-CONVERGE_WINDOW:]))
    return last >= (1.0 - CONVERGE_TOL) * prev


def main():
    import jax
    import jax.numpy as jnp

    if SMOKE:  # must precede any backend initialization
        jax.config.update("jax_platforms", "cpu")

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from callireader_tpu.core.config import callireader_2b
    from callireader_tpu.models import detector as det_mod
    from callireader_tpu.models import internlm2
    from callireader_tpu.runtime import generate as gen
    from callireader_tpu.runtime.conversation import build_chat_prompt
    from callireader_tpu.runtime.engine import (
        ALIGNED, CalliReaderEngine, init_all_params,
    )
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer
    from callireader_tpu.vision import preprocess

    # BENCH_PRESET / BENCH_QUANT: run the pipeline at another scale — e.g.
    # BENCH_PRESET=callireader-8b BENCH_QUANT=int8 BENCH_BATCH=4 measures the
    # TRUE 32-layer flagship on one 16 GB chip (int8 LLM init'd leaf-by-leaf
    # on device; bf16 would OOM). Default stays the 2b headline config.
    preset = os.environ.get("BENCH_PRESET", "")
    quant = os.environ.get("BENCH_QUANT", "")
    if SMOKE:
        from callireader_tpu.core.config import callireader_tiny

        cfg = callireader_tiny()
    elif preset:
        from callireader_tpu.core.config import get_config

        cfg = get_config(preset)
    else:
        cfg = callireader_2b()
    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"[bench] platform={jax.devices()[0].platform}"
          + (f" preset={preset} quant={quant}" if preset or quant else ""),
          file=sys.stderr)

    params = init_all_params(
        jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
        llm_int8=quant in ("int8", "int8-all"),
    )
    if quant in ("int8", "int8-all"):
        # 128-pad the vocab tables: unlocks the fused-dequant head kernel
        # (kernels/int8_matmul.py) for the 380 MB lm-head read per step
        import dataclasses as _dc2

        from callireader_tpu.models import internlm2 as _illm

        params["llm"], _llm_cfg = _illm.pad_vocab(params["llm"], cfg.llm, 128)
        cfg = _dc2.replace(cfg, llm=_llm_cfg)
    if quant == "int8-all":
        # W8A8 ViT (same knob as the CLIs' --quant int8-all): halves the
        # vision weight bytes — matters most on the shared-tower char path
        from callireader_tpu.runtime.quantize import quantize_vit_int8

        params["vision"] = quantize_vit_int8(params["vision"])
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    # Device tiling (default ON): ship raw pages (4.7 MB each) and tile on
    # device instead of host-PIL tiling + 53 MB/batch tiled h2d. Measured on
    # v5e at b8: 0.92 imgs/s spread 0.002 vs host tiling 0.85 spread 0.25 —
    # fewer tunnel bytes kills the transfer stalls that fattened the IQR.
    # BENCH_DEVICE_TILES=0 reverts to host tiling (A/B knob).
    device_tiles = os.environ.get("BENCH_DEVICE_TILES", "1") not in ("", "0")
    # Trained CalliAlign compact char tower (assets/callialign.npz v3,
    # scripts/train_callialign.py): swaps the char path's 24-layer/448px
    # shared-tower encode for the dedicated 6-layer/224px trained stack —
    # same contract (crop -> 3 pseudo tokens -> full-table VQ), ~250x fewer
    # char-encode FLOPs, and the only configuration with a MEASURED
    # recognition metric (fixture char acc in the asset meta). This is the
    # deployed default (cli/common autoloads it), so the headline runs it.
    # BENCH_CALLIALIGN=0 reverts to the shared-tower char path (A/B knob).
    ca_mode = "random"
    CA_CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "callireader_tpu", "assets", "callialign.npz")
    if (not SMOKE and os.path.exists(CA_CKPT)
            and cfg.llm.hidden_size == 4096
            and os.environ.get("BENCH_CALLIALIGN", "1") not in ("", "0")):
        from callireader_tpu.train import callialign_train as _ca

        if _ca.asset_version(CA_CKPT) >= 3:
            stack, cfg, _ca_meta = _ca.apply_v3_asset(cfg, CA_CKPT, jnp.bfloat16)
            params.update(stack)
            _acc = (_ca_meta.get("eval", {}).get("fix_clean") or [[0, 0, 0]])[0]
            ca_mode = f"trained_ckpt(fix_acc={_acc[-1]:.3f})"
            print(f"[bench] trained CalliAlign compact tower: fixture char "
                  f"acc {_acc[-1]:.3f}", file=sys.stderr)
    # BENCH_CHAR_CANVAS=364: the char-ViT canvas FLOP lever on the SHARED
    # tower (A/B knob; the compact tower pins its own 224 canvas)
    char_canvas = int(os.environ.get("BENCH_CHAR_CANVAS", "0")) or None
    if ca_mode != "random":
        char_canvas = None
    # BENCH_CHAR_WINDOW: crops per fused char dispatch (live-set knob)
    char_window = int(os.environ.get("BENCH_CHAR_WINDOW", "0")) or None
    engine = CalliReaderEngine(
        cfg, params, tok, use_flash=on_tpu, device_tile_pages=device_tiles,
        char_canvas=char_canvas, char_window=char_window,
    )

    page, gt_flat, page_source = load_page()

    use_real_det = (os.path.exists(DET_CKPT) and not SMOKE
                    and not os.environ.get("BENCH_GT_BOXES"))
    det_mode = "gt_stub"
    if use_real_det:
        import dataclasses as _dc

        # chars in a column grid barely overlap: NMS IoU 0.3 (vs the 0.7
        # general-object default) kills cross-scale duplicate boxes that
        # would inflate the char-encode workload downstream. Operating point
        # swept on the fixture (conf 0.5 / NMS 0.3): P 0.860 R 0.958 F1
        # 0.906 at 107 post-dedup boxes — best F1 AND fewest false crops
        det_cfg = _dc.replace(cfg.detector, conf_threshold=0.5, iou_threshold=0.3)
        det_params = det_mod.load_npz(DET_CKPT)
        real = det_mod.Detector(det_params, det_cfg)
        n_found = len(real(page))
        print(f"[bench] trained detector: {n_found} boxes on the page "
              f"(GT {len(gt_flat)})", file=sys.stderr)
        if n_found >= 50:
            engine.params["detector"] = det_params
            engine.detector = real
            det_mode = "trained_ckpt"
        else:
            print("[bench] detector found <50 boxes; falling back to GT stub",
                  file=sys.stderr)
            use_real_det = False
    of_mode = "random"
    if not SMOKE:
        # trained reading-order regressor (scripts/train_orderformer.py);
        # same cost as random weights — this only makes the measured column
        # ordering real. The shared overlay helper arch-checks the ckpt.
        from callireader_tpu.cli.common import _overlay_trained_assets

        before = engine.params.get("orderformer")
        _overlay_trained_assets(engine.params, cfg, {"orderformer"})
        if engine.params.get("orderformer") is not before:
            of_mode = "trained_ckpt"

    if not use_real_det:
        real_detector = engine.detector

        class StubDetector:
            """Runs the detector forward (cost counted) but returns the GT
            boxes (deterministic box counts without a trained ckpt). Exposes
            the dispatch/fetch/postprocess phases so the pipelined schedule
            is identical to the trained-ckpt path."""

            def __call__(self, img):
                _ = real_detector(img)
                return [list(b) for b in gt_flat]

            def dispatch(self, images):
                return real_detector.dispatch(images)

            def fetch(self, handle):
                return real_detector.fetch(handle)

            def postprocess(self, images, fetched):
                _ = real_detector.postprocess(images, fetched)
                return [[list(b) for b in gt_flat] for _ in images]

            def batch(self, images):
                return self.postprocess(images, self.fetch(self.dispatch(images)))

        engine.detector = StubDetector()

    def build_row():
        """The full chat_ocr front half for one image -> (embeds, mask)."""
        pseudo, _idx = engine.calli_align(page)
        pixel_values = preprocess.load_image(
            page, cfg.force_image_size, cfg.max_dynamic_patch,
            cfg.use_thumbnail, as_uint8=True,
        )
        img_embeds = engine.encode_image_tiles(pixel_values)
        n_pseudo = pseudo.shape[0] if pseudo is not None else 0
        q = "<image>\n读出图中所有文字。" + ALIGNED * n_pseudo
        conv = build_chat_prompt(q)
        query = engine._expand_image_tokens(conv.get_prompt(), [pixel_values.shape[0]])
        ids = engine._tokenize_prompt(query)
        bucket = gen.bucket_length(len(ids))
        return engine._build_row_embeds(ids, img_embeds, pseudo, bucket)

    def detect_boxes():
        """Unpipelined box stage (warmup only): detector forward + NMS +
        kmeans/merge + OrderFormer in one go."""
        t0 = time.time()
        ordered = engine.batch_sort_boxes([page] * BATCH)
        engine.timings.add("yolo_orderformer", time.time() - t0)
        return ordered

    # phased box stage (engine.detect_dispatch/detect_fetch/columns_stage/
    # order_stage): only the phases that read device memory (fetch, order)
    # must sit in the device-free gap; dispatch overlaps the decode it queues
    # behind, and the pure-host column clustering overlaps the next decode.
    pages_list = [page] * BATCH

    def _timed(key, fn, *a):
        t0 = time.time()
        out = fn(*a)
        engine.timings.add(key, time.time() - t0)
        return out

    def build_batch(ordered=None):
        """The engine's batched vision front end: fused char pipeline in
        bounded windows, chunked tile encode, one-dispatch embed build — all
        async dispatch (safe to overlap an in-flight decode)."""
        return engine.batch_build_rows(
            [page] * BATCH, ["读出图中所有文字。"] * BATCH, use_p=True,
            ordered_lists=ordered,
        )

    def launch(rows):
        """One prefill + one fused decode for previously built rows."""
        return engine.batch_prepare(
            [], [], prepared_rows=rows, max_new_tokens=DECODE_TOKENS,
            repetition_penalty=1.0, eos_token_ids=(-1,),
        )

    def sync(prepared):
        assert (np.asarray(prepared["lengths"]) == DECODE_TOKENS).all()

    # ---- 1. compile warmup: every program in the batched path ----
    t0 = time.time()
    sync(launch(build_batch()))
    warmup_s = time.time() - t0
    n_tiles = preprocess.load_image(
        page, cfg.force_image_size, cfg.max_dynamic_patch, cfg.use_thumbnail
    ).shape[0]
    # chars actually encoded per image: post-dedup reading-order box count
    n_chars = len(engine.sort_boxes(page)) if det_mode == "trained_ckpt" else len(gt_flat)
    print(f"[bench] warmup: {warmup_s:.1f}s; per-image work: {n_chars} chars "
          f"({det_mode}), {n_tiles} tiles, {DECODE_TOKENS} decode tokens",
          file=sys.stderr)

    # ---- 2. TTFT: warm the single-image path, then timed samples ----
    import functools

    @functools.partial(jax.jit, static_argnames=("max_len",))
    def _prefill_first_token(params, e, m, max_len):
        # argmax folded into the prefill program: the first token costs ONE
        # dispatch + a scalar d2h instead of prefill-fetch + argmax round
        # trips (each tunnel RT is ~100-300 ms)
        logits, _cache = internlm2.prefill(
            params, cfg.llm, inputs_embeds=e, attention_mask=m,
            max_len=max_len, use_flash=on_tpu,
        )
        return jnp.argmax(logits[0])

    def ttft_once():
        t0 = time.time()
        e, m = build_row()
        tok0 = _prefill_first_token(
            engine.params["llm"], e, jnp.asarray(m),
            e.shape[1] + DECODE_TOKENS,
        )
        _ = int(np.asarray(tok0))  # d2h sync
        return (time.time() - t0) * 1e3

    ttft_warm = ttft_once()  # compiles the single-row programs
    ttft_warm2 = ttft_once()  # settles allocator/tunnel state post-compile
    ttfts = [ttft_once() for _ in range(N_TTFT)]
    p50_ttft = float(np.median(ttfts))
    print(f"[bench] TTFT ms: warm {ttft_warm:.0f}/{ttft_warm2:.0f}; samples "
          f"{[round(t) for t in ttfts]} -> p50 {p50_ttft:.0f}", file=sys.stderr)

    # ---- 3. throughput: pipeline to convergence, then measure ----
    # Schedule per interval (one generate in flight):
    #   build(N+1)     — async char/tile/embed dispatches overlap decode N
    #   columns(N+2)   — pure-host dedup/kmeans/merge overlaps decode N
    #   odispatch(N+2) — OrderFormer forward queued behind decode N (async)
    #   sync(N)        — decode N retires
    #   ofetch(N+2)    — tiny OrderFormer score d2h in the device-free gap
    #   fetch(N+3)     — small detector d2h + NMS in the device-free gap
    #   launch(N+1)
    #   dispatch(N+4)  — letterbox + h2d + detector forward, queues behind
    #                    decode N+1 (no readback, so it never blocks the host)
    # Detection therefore runs FOUR batches ahead of its decode; only the
    # ~1 MB anchor readback and the OrderFormer score readback occupy the
    # device-free gap (the h2d bytes, host resizes, dispatch RPCs, and both
    # model forwards all hide under decode compute).
    engine.timings.spans.clear()
    state = {"ordered": detect_boxes()}
    state["dets"] = _timed(
        "box_fetch_nms", engine.detect_fetch, pages_list,
        _timed("box_dispatch", engine.detect_dispatch, pages_list))
    rows0 = build_batch(state["ordered"])
    prev = launch(rows0)
    state["handle"] = _timed(
        "box_dispatch", engine.detect_dispatch, pages_list)
    last = time.time()

    sync_waits = []

    def pipeline_step():
        nonlocal prev, last
        # OrderFormer forward queues FIRST: behind only the in-flight decode,
        # ahead of build_batch's char/tile encodes — its score readback in
        # the device-free gap then waits one RPC, not the next batch's
        # encode queue (r4: the compact char tower shrank the interval 2.8x
        # and box_order_fetch went 0.04 -> 1.0 s/batch until this reorder)
        odisp = _timed(
            "box_order_dispatch", engine.order_dispatch,
            _timed("box_columns", engine.columns_stage,
                   pages_list, state["dets"]))
        rows = build_batch(state["ordered"])
        t_sync = time.time()  # host idle from here until decode retires:
        sync(prev)            # large wait => device-bound interval
        now = time.time()
        sync_waits.append(now - t_sync)
        iv = now - last
        last = now
        state["ordered"] = _timed("box_order_fetch", engine.order_fetch, odisp)
        state["dets"] = _timed("box_fetch_nms", engine.detect_fetch,
                               pages_list, state["handle"])
        prev = launch(rows)
        state["handle"] = _timed(
            "box_dispatch", engine.detect_dispatch, pages_list)
        return iv

    warm_iv = []
    t_warm = time.time()
    while not converged(warm_iv) and (time.time() - t_warm) < WARM_CAP_S \
            and len(warm_iv) < MAX_WARM_BATCHES:
        warm_iv.append(pipeline_step())
    did_converge = converged(warm_iv)
    print(f"[bench] convergence: {len(warm_iv)} batches "
          f"{[round(v, 2) for v in warm_iv]} -> "
          f"{'converged' if did_converge else 'CAP HIT'}", file=sys.stderr)

    import gc

    gc.collect()
    # BENCH_PROFILE=<dir>: capture a jax.profiler trace (XProf/TensorBoard)
    # of the first two measured steady-state intervals — the observability
    # artifact for "where does the interval go" questions.
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        from callireader_tpu.utils.profiling import trace

        with trace(profile_dir):
            prof_iv = [pipeline_step() for _ in range(2)]
        print(f"[bench] profile trace ({[round(v, 2) for v in prof_iv]}s) "
              f"-> {profile_dir}", file=sys.stderr)
    sync_waits.clear()  # warmup/profile steps out; keep only measured ones
    intervals = [pipeline_step() for _ in range(N_BATCHES - 1)]
    sync(prev)  # final batch: decode tail only, not a pipelined interval
    intervals.append(time.time() - last)
    steady = intervals[:-1]  # last interval lacks an overlapped build

    med = float(np.median(steady))
    ips = BATCH / med
    # IQR-based spread: the dev tunnel occasionally stalls for minutes mid
    # run; a max-min spread would report the tunnel, not the pipeline
    q25, q75 = np.percentile(steady, [25, 75])
    spread = float((q75 - q25) / med)
    # host-idle share of the interval: the host sits in sync(prev) while the
    # decode retires — large => device-bound (host box work fully hidden);
    # near zero => host-bound (the optimization target moves to the host)
    dev_wait = float(np.median(sync_waits[: len(steady)])) if sync_waits else 0.0
    print(f"[bench] device wait inside interval: median {dev_wait:.2f}s of "
          f"{med:.2f}s ({100 * dev_wait / max(med, 1e-9):.0f}% — the host box "
          f"pipeline is {'hidden' if dev_wait > 0.15 * med else 'the critical path'})",
          file=sys.stderr)
    # spans accumulate over every pipeline step since the warm loop started
    # (warmup + profile + measured); report PER-BATCH so the number is
    # directly comparable to the interval (r4's raw totals were misread as
    # per-batch costs ~2.7x the interval)
    n_steps = len(warm_iv) + len(intervals) + (2 if profile_dir else 0)
    host_per_batch = {k: round(v / max(n_steps, 1), 3)
                      for k, v in engine.timings.spans.items()}
    print(
        f"[bench] host-stage s/batch (over {n_steps} pipeline steps): "
        f"{host_per_batch} -> total "
        f"{round(sum(host_per_batch.values()), 2)}s of {med:.2f}s interval",
        file=sys.stderr,
    )
    print(
        f"[bench] measured intervals: {[round(v, 2) for v in intervals]}s "
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
                "device_wait_s": round(dev_wait, 2),
                "host_stage_s_per_batch": host_per_batch,
                "worst_interval_s": round(float(max(steady)), 2),
                "batches": [round(float(v), 3) for v in intervals],
                "converged": bool(did_converge),
                "warm_batches": len(warm_iv),
                "warmup_s": round(warmup_s, 1),
                "workload": {
                    "batch": BATCH,
                    "preset": preset or ("tiny" if SMOKE else "callireader-2b"),
                    "quant": quant or "bf16",
                    "page": page_source,
                    "detector": det_mode,
                    "orderformer": of_mode,
                    "callialign": ca_mode,
                    "chars_per_image": int(n_chars),
                    "tiles_per_image": int(n_tiles),
                    "char_canvas": int(engine.char_canvas),
                    "decode_tokens": DECODE_TOKENS,
                    "stages": [
                        "dynamic_tiling", "vit_projector", "detector_forward",
                        "box_pipeline(dedup,kmeans,merge,orderformer)",
                        "char_crops", "fused_char_vit_resampler_vq",
                        "double_splice", "prefill", "fused_decode",
                    ],
                },
            }
        )
    )


# ---------------------------------------------------------------------------
# orchestrator: three rows, one combined JSON line
# ---------------------------------------------------------------------------

# (name, env overrides). Row subprocesses isolate HBM between scales: the 8B
# int8 run fills most of the 16 GB chip and must not inherit the previous
# row's allocator state.
ROWS = [
    # batch swept on v5e (r5): b4 0.546, b8 0.771 imgs/s (+41%: the per-step
    # 7.7 GB weight read amortizes over more rows), b12 OOMs the decode
    # program by 93 MB (15.84/15.75 GB) — b8 is the single-chip knee
    ("flagship_8b_int8",
     {"BENCH_PRESET": "callireader-8b", "BENCH_QUANT": "int8",
      "BENCH_BATCH": "8"}),
    ("reference_geometry_8b_int8",
     {"BENCH_PRESET": "callireader-8b", "BENCH_QUANT": "int8-all",
      "BENCH_BATCH": "8", "BENCH_CALLIALIGN": "0"}),
    ("compact_2b_bf16", {}),
]
ROW_TIMEOUT_S = int(os.environ.get("BENCH_ROW_TIMEOUT", "2400"))


def orchestrate():
    import subprocess

    names = os.environ.get("BENCH_ROWS", "").split(",")
    rows_to_run = [(n, e) for n, e in ROWS if not names[0] or n in names]
    rows = {}
    for name, over in rows_to_run:
        env = dict(os.environ, BENCH_SINGLE="1", **over)
        print(f"[bench] ==== row {name} {over} ====", file=sys.stderr)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE, text=True, timeout=ROW_TIMEOUT_S,
            )
            out_lines = (proc.stdout or "").strip().splitlines()
            rows[name] = json.loads(out_lines[-1])
        except Exception as e:  # row failure/timeout never kills the bench
            rows[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"[bench] row {name} FAILED: {rows[name]['error']}",
                  file=sys.stderr)
        rows[name]["row_wall_s"] = round(time.time() - t0, 1)
    head = next((n for n, _ in rows_to_run if "value" in rows.get(n, {})), None)
    print(json.dumps({
        "metric": "full_page_pipeline_imgs_per_sec_per_chip",
        "value": rows[head]["value"] if head else None,
        "unit": "imgs/sec",
        "vs_baseline": None,
        "headline_row": head,  # the TRUE 32-layer flagship, int8, one chip
        "p50_ttft_ms": rows[head].get("p50_ttft_ms") if head else None,
        "interval_spread": rows[head].get("interval_spread") if head else None,
        "rows": rows,
    }))


if __name__ == "__main__":
    # any manual knob (or smoke) selects the direct single-row path; the bare
    # driver invocation (`python bench.py`) measures all three rows
    _single_knobs = (
        "BENCH_SINGLE", "BENCH_PRESET", "BENCH_QUANT", "BENCH_CALLIALIGN",
        "BENCH_CHAR_CANVAS", "BENCH_GT_BOXES", "BENCH_BATCH",
        "BENCH_DEVICE_TILES", "BENCH_CHAR_WINDOW",
    )
    if SMOKE or any(os.environ.get(k) for k in _single_knobs):
        main()
    else:
        orchestrate()
