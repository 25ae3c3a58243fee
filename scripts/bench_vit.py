"""ViT encode throughput evidence: tiles/sec through the vision tower.

  python scripts/bench_vit.py --preset callireader-2b --tiles 64 --iters 5
  python scripts/bench_vit.py --attn-impl both    # kernel A/B, one process

Measures the jitted ViT+projector program on a resident tile batch (pure
device compute) and with fresh host tiles per iter (h2d included). Prints ONE
JSON line per implementation. Run on TPU for the recorded numbers. The
`both` mode A/Bs the packed-QKV kernel against the single-pass kernel
(kernels/vit_attention.py) inside the full fused encoder loop in a single
process — one tunnel warmup, same input batch; per the fused-loop rule in
docs/KERNELS.md, never trust single-dispatch microbenchmarks through the
tunnel.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="callireader-2b")
    p.add_argument("--tiles", type=int, default=64)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument(
        "--attn-impl",
        default=None,
        choices=["single_pass", "packed", "nomax", "reference", "both"],
        help="override the ViT attention kernel (default: auto); "
        "'both' A/Bs packed vs single_pass vs nomax in one process",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from callireader_tpu.core.config import get_config
    from callireader_tpu.models import internvit, projector

    cfg = get_config(args.preset)
    on_tpu = jax.devices()[0].platform != "cpu"
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    params = {
        "vision": internvit.init_params(ks[0], cfg.vision, jnp.bfloat16),
        "projector": projector.init_params(ks[1], cfg, jnp.bfloat16),
    }

    import functools

    @functools.partial(jax.jit, static_argnames=("impl",))
    def encode(params, pixels, impl):
        h = internvit.forward(
            params["vision"], cfg.vision, pixels, use_flash=on_tpu,
            attn_impl=impl,
        )
        return projector.extract_feature(params["projector"], h, cfg)

    rng = np.random.RandomState(0)
    S = cfg.force_image_size
    # ship uint8 like the engine (vision/preprocess load_image as_uint8) —
    # 4x fewer h2d bytes than f32; the ViT normalizes on device
    tiles = rng.randint(0, 255, (args.tiles, S, S, 3)).astype(np.uint8)
    dev_tiles = jnp.asarray(tiles)

    impls = (
        ["packed", "single_pass", "nomax"]
        if args.attn_impl == "both"
        else [args.attn_impl]
    )
    ref_out = None
    for impl in impls:
        out = encode(params, dev_tiles, impl)
        # global moments over the FULL output (device-side reductions; a
        # kernel bug anywhere — tail blocks, masking, other tiles — moves
        # them), fetched as 3 scalars. The fetch is also the sync
        # (block_until_ready lies through the tunnel).
        o32 = out.astype(jnp.float32)
        got = np.asarray(jnp.stack(
            [jnp.mean(o32), jnp.mean(jnp.abs(o32)), jnp.max(jnp.abs(o32))]
        ), np.float32)
        if args.attn_impl == "both":
            if ref_out is None:
                ref_out = got
            else:
                rel = float(np.max(np.abs(got - ref_out) / (np.abs(ref_out) + 1e-3)))
                print(f"[bench_vit] impl output moments (mean/absmean/absmax) "
                      f"agree to rel {rel:.1e}", file=sys.stderr)
        print(f"[bench_vit] warmup done ({impl or 'auto'})", file=sys.stderr)

        t0 = time.time()
        for _ in range(args.iters):
            out = encode(params, dev_tiles, impl)
        _ = np.asarray(out[0, 0, :2])
        dev_dt = (time.time() - t0) / args.iters

        t0 = time.time()
        for _ in range(args.iters):
            out = encode(params, jnp.asarray(tiles), impl)
        _ = np.asarray(out[0, 0, :2])
        h2d_dt = (time.time() - t0) / args.iters

        print(
            json.dumps({
                "metric": "vit_tiles_per_sec",
                "value": round(args.tiles / dev_dt, 2),
                "unit": "tiles/s",
                "with_h2d_tiles_per_sec": round(args.tiles / h2d_dt, 2),
                "tiles": args.tiles,
                "ms_per_batch_device": round(dev_dt * 1e3, 1),
                "ms_per_batch_with_h2d": round(h2d_dt * 1e3, 1),
                "attn_impl": impl or "auto",
            })
        )


if __name__ == "__main__":
    main()
