"""Train-step throughput evidence: e-IT step time and tokens/sec.

  python scripts/bench_train_step.py --preset callireader-2b --batch 2 \
      --seq 2048 [--mesh data=1,fsdp=1,tensor=1]

Runs the jitted SPMD e-IT train step (LoRA over frozen towers) on synthetic
batches and prints ONE JSON line. Run on TPU for the recorded numbers.
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
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--lora-rank", type=int, default=128)
    p.add_argument("--mesh", type=str, default=None)
    p.add_argument("--tiles-per-sample", type=int, default=1)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from callireader_tpu.core.config import get_config
    from callireader_tpu.parallel import spmd
    from callireader_tpu.runtime.engine import init_all_params
    from callireader_tpu.train import e_it, lora
    from callireader_tpu.utils.profiling import TrainThroughput

    cfg = get_config(args.preset)
    on_tpu = jax.devices()[0].platform != "cpu"
    params = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tc = e_it.TrainConfig(lora_rank=args.lora_rank, lora_alpha=2.0 * args.lora_rank,
                          total_steps=100)
    params["llm"] = lora.add_lora(
        params["llm"], cfg.llm, jax.random.PRNGKey(1),
        rank=tc.lora_rank, alpha=tc.lora_alpha,
    )
    if args.mesh:
        shape = {k: int(v) for k, v in (kv.split("=") for kv in args.mesh.split(","))}
        mesh = spmd.make_mesh(shape)
    else:
        mesh = spmd.make_mesh({"data": 1, "fsdp": len(jax.devices()), "tensor": 1, "seq": 1})
    params = spmd.shard_tree(params, spmd.engine_logical_axes(cfg, params), mesh)
    state, frozen, tx = e_it.create_train_state(params, tc)
    step = jax.jit(
        e_it.make_train_step(cfg, tc, tx, use_flash=on_tpu), donate_argnums=(0,)
    )

    B, S = args.batch, args.seq
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 90000, (B, S)).astype(np.int32)
    nit = cfg.num_image_token * args.tiles_per_sample
    for b in range(B):
        ids[b, 4 : 4 + nit] = cfg.img_context_token_id
    labels = np.where(np.arange(S)[None] > S // 2, ids, e_it.IGNORE_INDEX).astype(np.int32)
    batch = {
        "input_ids": ids,
        "labels": labels,
        "segment_ids": np.zeros((B, S), np.int32),
        "positions": np.tile(np.arange(S, dtype=np.int32)[None], (B, 1)),
        "pixel_values": rng.rand(
            B * args.tiles_per_sample, cfg.force_image_size, cfg.force_image_size, 3
        ).astype(np.float32),
    }
    batch = spmd.shard_batch(batch, mesh)

    thr = TrainThroughput(cfg, seq_len=S)
    with mesh:
        state, m = step(state, frozen, batch)
        _ = float(m["loss"])  # sync
        print("[bench_train] warmup done", file=sys.stderr)
        t0 = time.time()
        for _ in range(args.iters):
            state, m = step(state, frozen, batch)
        loss = float(m["loss"])  # sync
    dt = (time.time() - t0) / args.iters
    tps = B * S / dt
    print(
        json.dumps({
            "metric": "eit_train_step_sec",
            "value": round(dt, 3),
            "unit": "s/step",
            "tokens_per_sec": round(tps, 1),
            "batch": B, "seq": S, "mesh": dict(mesh.shape),
            "model_tflops_per_sec": round(tps * thr.flops_per_token / 1e12, 2),
            "loss": round(loss, 4),
        })
    )


if __name__ == "__main__":
    main()
