"""Inference CLI, flag-compatible with the reference ``inference.py``.

  python -m callireader_tpu.cli.inference --tgt=examples/0.jpg \
      --prompt '这幅书法作品内容是什么？' --use_p --hard_vq --drop_zero \
      --repetition_penalty 1.0

Parity target: /root/reference/inference.py:65-130 (single image -> stdout;
folder -> results/<save_name>.json with per-image records and "ERROR!"
sentinels on failures).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from callireader_tpu.evalx.metrics import t2s


def _str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() not in ("false", "0", "no", "")


def is_image(path: str) -> bool:
    if not os.path.isfile(path):
        return False
    try:
        from PIL import Image

        with Image.open(path):
            return True
    except Exception:
        return False


def get_image_paths(folder: str):
    out = []
    for root, _, files in os.walk(folder):
        for f in files:
            p = os.path.join(root, f)
            if is_image(p):
                out.append(p)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="args for inference task")
    parser.add_argument("--tgt", type=str, help="Recognition target")
    parser.add_argument("--prompt", type=str, default="这幅书法作品内容是什么？")
    parser.add_argument("--save_name", type=str, default="recognition.json")
    parser.add_argument("--use_p", type=_str2bool, default=True)
    parser.add_argument("--hard_vq", type=_str2bool, default=False)
    parser.add_argument("--drop_zero", type=_str2bool, default=False)
    parser.add_argument("--verbose", type=_str2bool, default=False)
    parser.add_argument("--repetition_penalty", type=float, default=1.0)
    parser.add_argument("--num_beams", type=int, default=1,
                        help="HF generate parity (reference always 1)")
    parser.add_argument("--preset", type=str, default="callireader-8b")
    parser.add_argument("--checkpoint", type=str, default=os.environ.get("CALLIREADER_CKPT"))
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--quant", type=str, default=None, choices=[None, "int8", "int8-all"])
    parser.add_argument("--adapter", type=str, default=None,
                        help="orbax e-IT checkpoint dir (LoRA+mlp1) to merge before serving")
    parser.add_argument("--mesh", type=str, default=None,
                        help='SPMD inference mesh, e.g. "tensor=4,fsdp=2"')
    parser.add_argument("--char-canvas", type=int, default=None,
                        help="char-ViT canvas size (default: the model's 448). 364 keeps the [200,350] content scale identical but trims the white margin: ~40%% fewer char-encode FLOPs, near- but not bit-parity CalliAlign outputs (docs/PERF.md)")
    parser.add_argument("--no-trained-assets", action="store_true",
                        help="skip the in-repo trained detector/orderformer overlays")
    args = parser.parse_args(argv)

    if not isinstance(args.tgt, str):
        raise ValueError(f"The target should be a string, not {type(args.tgt)}!")

    from callireader_tpu.cli.common import build_engine

    engine = build_engine(
        preset=args.preset, checkpoint_dir=args.checkpoint, random_init_ok=args.random_init,
        quant=args.quant, adapter_path=args.adapter, char_canvas=args.char_canvas, mesh_spec=args.mesh,
        trained_assets=not args.no_trained_assets,
    )

    def rec(image_path):
        response, _ = engine.chat_ocr(
            image_path, args.prompt,
            use_p=args.use_p, hard_vq=args.hard_vq, drop_zero=args.drop_zero,
            repetition_penalty=args.repetition_penalty,
            num_beams=args.num_beams,
            return_history=True, verbose=args.verbose,
        )
        return response

    if is_image(args.tgt):
        print("Single image recognition mode.")
        response = rec(args.tgt)
        print(f"User: {args.prompt}\nAssistant: {response}")
    elif os.path.isdir(args.tgt):
        print("Multiple images recognition mode")
        os.makedirs("results", exist_ok=True)
        results = []
        for pic in get_image_paths(args.tgt):
            try:
                response = rec(pic)
            except Exception as e:  # noqa: BLE001
                print(f"An error has occured:\n{e}", file=sys.stderr)
                response = "ERROR!"
            print(f"User: {args.prompt}\nAssistant: {response}")
            results.append({"imagePath": pic, "prompt": args.prompt, "response": response})
        save_name = args.save_name
        if not save_name.endswith("json"):
            save_name += "_result.json"
        with open(os.path.join("results", save_name), "w", encoding="utf-8") as f:
            json.dump(results, f, ensure_ascii=False, indent=4)
    else:
        raise ValueError("The target should be either an image path or a folder of images!")


if __name__ == "__main__":
    main()
