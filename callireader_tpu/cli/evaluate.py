"""CalliBench evaluation CLI, flag-compatible with reference ``evaluate.py``.

  python -m callireader_tpu.cli.evaluate --type full_page --data ./CalliBench \
      --save_name exp

Parity target: /root/reference/evaluate.py:389-467 (same parquet layout, same
output file names under outputs/<save_name>/).
"""

from __future__ import annotations

import argparse
import os

from callireader_tpu.evalx import callibench


def _str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() not in ("false", "0", "no", "")


def main(argv=None):
    parser = argparse.ArgumentParser(description="args for evaluation task")
    parser.add_argument(
        "--type", type=str,
        choices=["full_page", "region_wise", "choice", "bilingual", "intent",
                 "mmbench", "refcoco"],
    )
    parser.add_argument("--save_name", type=str, default="exp")
    parser.add_argument("--data", type=str, default="./CalliBench")
    parser.add_argument("--use_p", type=_str2bool, default=True)
    parser.add_argument("--hard_vq", type=_str2bool, default=False)
    parser.add_argument("--drop_zero", type=_str2bool, default=False)
    parser.add_argument("--verbose", type=_str2bool, default=False)
    parser.add_argument("--repetition_penalty", type=float, default=1.0)
    parser.add_argument("--batch_size", type=int, default=None,
                        help="batched chat_ocr for full_page/region_wise (TPU throughput "
                        "mode). Default: 8 on TPU, 1 (reference-parity sequential) elsewhere")
    parser.add_argument("--choice_limit", type=int, default=3,
                        help="reference harness evaluates a 3-sample slice; 0 = full split")
    parser.add_argument("--preset", type=str, default="callireader-8b")
    parser.add_argument("--checkpoint", type=str, default=os.environ.get("CALLIREADER_CKPT"))
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--quant", type=str, default=None, choices=[None, "int8", "int8-all"])
    parser.add_argument("--adapter", type=str, default=None,
                        help="orbax e-IT checkpoint dir (LoRA+mlp1) to merge before serving")
    parser.add_argument("--splits", type=str, nargs="*", default=None,
                        help="subset of splits for full_page (easy/medium/hard) or choice (author/style/layout); default: all")
    parser.add_argument("--data-path", type=str, default=None,
                        help="mmbench TSV / refcoco JSON path (overrides --data)")
    parser.add_argument("--mesh", type=str, default=None,
                        help='SPMD eval mesh, e.g. "data=8" (rank-sharded '
                        'batch eval) or "tensor=4,fsdp=2" (model sharding); '
                        'a leftover data axis is added automatically')
    parser.add_argument("--rgb-chars", action="store_true",
                        help="full-RGB char canvases (bit-parity with the reference; 3x the transfer bytes of the luma default)")
    parser.add_argument("--gray-chars", action="store_true",
                        help="ship char canvases as single-channel luma (3x fewer "
                        "host-link bytes; NOT bit-identical to RGB crops)")
    parser.add_argument("--device-resize-chars", action="store_true",
                        help="ship RAW char crops and bicubic-resize on device "
                        "(~10x fewer host-link bytes; near- but not bit-identical)")
    parser.add_argument("--device-tile-pages", action="store_true",
                        help="ship the raw page and dynamic-tile on device — "
                        "measured 0.92 vs 0.85 imgs/s and ~100x tighter "
                        "interval spread on v5e. evaluate is the parity "
                        "harness, so its default stays host-PIL tiling "
                        "(bit-identical to the reference); serve/inference/"
                        "bench default to device tiling")
    parser.add_argument("--char-canvas", type=int, default=None,
                        help="char-ViT canvas size (default: the model's 448). 364 keeps the [200,350] content scale identical but trims the white margin: ~40%% fewer char-encode FLOPs, near- but not bit-parity CalliAlign outputs (docs/PERF.md)")
    parser.add_argument("--no-trained-assets", action="store_true",
                        help="skip the in-repo trained detector/orderformer overlays")
    args = parser.parse_args(argv)
    if getattr(args, "gray_chars", False) and args.rgb_chars:
        parser.error("--gray-chars and --rgb-chars are mutually exclusive")

    save_dir = f"outputs/{args.save_name}"
    os.makedirs(save_dir, exist_ok=True)

    from callireader_tpu.cli.common import build_engine

    # evaluate.py is the parity harness: char canvases default to full RGB
    # resized on HOST (bit-identical to the reference's crops,
    # utils/utils.py:420-452); --gray-chars / --device-resize-chars opt into
    # the transfer optimizations serve/bench use by default
    engine = build_engine(
        preset=args.preset, checkpoint_dir=args.checkpoint, random_init_ok=args.random_init,
        quant=args.quant, adapter_path=args.adapter, gray_chars=args.gray_chars,
        device_resize_chars=args.device_resize_chars,
        device_tile_pages=args.device_tile_pages, char_canvas=args.char_canvas, mesh_spec=args.mesh,
        trained_assets=not args.no_trained_assets,
    )
    if args.batch_size is None:
        import jax

        args.batch_size = 8 if jax.devices()[0].platform != "cpu" else 1
    kw = dict(
        use_p=args.use_p, hard_vq=args.hard_vq, drop_zero=args.drop_zero,
        repetition_penalty=args.repetition_penalty,
    )

    if args.type == "full_page":
        for split in (args.splits or ("easy", "medium", "hard")):
            callibench.test_full_page(
                engine,
                os.path.join(args.data, f"full_page_ocr/{split}/{split}.parquet"),
                os.path.join(save_dir, f"full_page_{split}.json"),
                batch_size=args.batch_size,
                **kw,
            )
    elif args.type == "region_wise":
        callibench.test_region_wise(
            engine,
            os.path.join(args.data, "region-wise/region.parquet"),
            os.path.join(save_dir, "region_wise.json"),
            batch_size=args.batch_size,
            **kw,
        )
    elif args.type == "choice":
        limit = args.choice_limit or None
        for split in (args.splits or ("author", "style", "layout")):
            callibench.test_choice(
                engine,
                os.path.join(args.data, f"choice/{split}/{split}.parquet"),
                os.path.join(save_dir, f"{split}.json"),
                limit=limit,
                batch_size=args.batch_size,
                **kw,
            )
    elif args.type == "bilingual":
        callibench.test_bilingual(
            engine,
            os.path.join(args.data, "reasoning/bilingual/medium/bilingual_medium.parquet"),
            os.path.join(save_dir, "bilingual.json"),
            batch_size=args.batch_size,
            **kw,
        )
    elif args.type == "intent":
        callibench.test_intent(
            engine,
            os.path.join(args.data, "reasoning/intent/intent.parquet"),
            os.path.join(save_dir, "intent.json"),
            batch_size=args.batch_size,
            **kw,
        )
    elif args.type == "mmbench":
        from callireader_tpu.evalx.mmbench import evaluate_mmbench

        out = evaluate_mmbench(
            engine, args.data_path or args.data,
            os.path.join(save_dir, "mmbench.xlsx"),
        )
        print(out)
    elif args.type == "refcoco":
        import json as _json

        from callireader_tpu.evalx.refcoco import evaluate_refcoco

        with open(args.data_path or args.data, encoding="utf-8") as f:
            samples = _json.load(f)
        from PIL import Image

        for s_ in samples:
            s_["image"] = Image.open(s_["image"]).convert("RGB")
        out = evaluate_refcoco(engine, samples)
        with open(os.path.join(save_dir, "refcoco.json"), "w") as f:
            _json.dump({"accuracy": out["accuracy"]}, f)
        print(f"refcoco IoU@0.5 accuracy: {out['accuracy']:.4f}")

    if args.verbose and engine.timings.spans:
        import sys

        print("[timings] per-stage totals (s):", file=sys.stderr)
        for name, t in sorted(engine.timings.spans.items()):
            print(f"  {name:24s} {t:8.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
