"""Model converters CLI.

Parity target: train/xtuner/tools/model_converters/ + entry_point.py convert
modes:
  pth_to_hf  (pth_to_hf.py:1-139)    -> ``export``: orbax train checkpoint ->
                                        reference-layout safetensors folder
  merge      (merge.py)              -> ``merge``: fold LoRA adapters into the
                                        base weights of a checkpoint
  split      (split.py)              -> ``split``: reshard a safetensors
                                        folder to a max shard size
  zero_to_any_dtype (utils/)         -> ``consolidate``: dtype-cast a
                                        safetensors folder (fp32/bf16/fp16)

Usage:
  python -m callireader_tpu convert export --preset callireader-8b \
      --checkpoint ckpt/ --out deploy/
  python -m callireader_tpu convert merge --preset ... --checkpoint ... --out ...
  python -m callireader_tpu convert split SRC DST --max-shard-size 2GB
  python -m callireader_tpu convert consolidate SRC DST --dtype bfloat16
"""

from __future__ import annotations

import argparse


def _parse_size(s: str) -> int:
    s = s.strip().upper()
    for suffix, mult in (("GB", 1 << 30), ("MB", 1 << 20), ("KB", 1 << 10)):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(s)


def main(argv=None):
    parser = argparse.ArgumentParser(description="checkpoint converters")
    sub = parser.add_subparsers(dest="mode", required=True)

    p_exp = sub.add_parser("export", help="orbax checkpoint -> reference safetensors")
    p_exp.add_argument("--preset", default="callireader-8b")
    p_exp.add_argument("--checkpoint", required=True)
    p_exp.add_argument("--out", required=True)
    p_exp.add_argument("--max-shard-size", default=None)
    p_exp.add_argument("--no-merge-lora", action="store_true")

    p_mrg = sub.add_parser("merge", help="fold LoRA adapters into base weights")
    p_mrg.add_argument("--preset", default="callireader-8b")
    p_mrg.add_argument("--checkpoint", required=True)
    p_mrg.add_argument("--adapter", default=None, help="separate adapter checkpoint")
    p_mrg.add_argument("--out", required=True)

    p_spl = sub.add_parser("split", help="reshard safetensors folder")
    p_spl.add_argument("src")
    p_spl.add_argument("dst")
    p_spl.add_argument("--max-shard-size", default="2GB")

    p_con = sub.add_parser("consolidate", help="dtype-cast safetensors folder")
    p_con.add_argument("src")
    p_con.add_argument("dst")
    p_con.add_argument("--dtype", default="float32",
                       choices=["float32", "bfloat16", "float16"])

    args = parser.parse_args(argv)

    if args.mode in ("export", "merge"):
        import jax
        import jax.numpy as jnp

        from callireader_tpu.core.config import get_config
        from callireader_tpu.runtime.engine import init_all_params
        from callireader_tpu.train import checkpoint as ckpt
        from callireader_tpu.train.lora import add_lora, merge_lora

        cfg = get_config(args.preset)
        params = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        if args.mode == "merge" and args.adapter:
            params["llm"] = add_lora(params["llm"], cfg.llm, jax.random.PRNGKey(0))
        params = ckpt.restore_params(args.checkpoint, params)
        if args.mode == "merge":
            if args.adapter:
                adapter = ckpt.restore_params(args.adapter, params["llm"])
                params["llm"] = adapter
            params["llm"] = merge_lora(params["llm"])
        ckpt.export_reference_format(
            params, cfg, args.out,
            merge_lora_first=not getattr(args, "no_merge_lora", False),
            max_shard_bytes=_parse_size(args.max_shard_size)
            if getattr(args, "max_shard_size", None) else None,
        )
        print(f"[convert] wrote {args.out}")
    elif args.mode == "split":
        from callireader_tpu.train.checkpoint import consolidate_safetensors_dtype

        consolidate_safetensors_dtype(
            args.src, args.dst, dtype=None,
            max_shard_bytes=_parse_size(args.max_shard_size),
        )
        print(f"[convert] resharded into {args.dst}")
    else:
        from callireader_tpu.train.checkpoint import consolidate_safetensors_dtype

        consolidate_safetensors_dtype(args.src, args.dst, dtype=args.dtype)
        print(f"[convert] consolidated to {args.dtype} in {args.dst}")


if __name__ == "__main__":
    main()
