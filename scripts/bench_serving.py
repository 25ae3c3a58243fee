"""Serving throughput evidence: aggregate tok/s under mixed admit/decode load.

  python scripts/bench_serving.py --preset callireader-2b --slots 8 \
      --requests 24 --max-new 128 [--paged] [--steps-per-sync 8] [--mesh ...]

Drives the continuous batcher the way cli/serve.py does (text-only prompts so
the number isolates the scheduler + decode path) and prints ONE JSON line.
Run on TPU for the recorded numbers (docs/serving.md).
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
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--requests", type=int, default=24)
    p.add_argument("--max-new", type=int, default=128)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--paged", action="store_true")
    p.add_argument("--steps-per-sync", type=int, default=1)
    p.add_argument("--mesh", type=str, default=None)
    p.add_argument("--prompt-len", type=int, default=96)
    p.add_argument("--quant", choices=[None, "int8"], default=None)
    # shared-prefix workload: every prompt starts with the same N tokens (a
    # system prompt / chat history); --prefix-cache registers its KV once so
    # requests prefill only their suffix (runtime/serving.register_prefix)
    p.add_argument("--shared-prefix", type=int, default=0)
    p.add_argument("--prefix-cache", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from callireader_tpu.core.config import get_config
    from callireader_tpu.models import internlm2
    from callireader_tpu.parallel import spmd
    from callireader_tpu.runtime.serving import ContinuousBatcher, Request

    cfg = get_config(args.preset)
    on_tpu = jax.devices()[0].platform != "cpu"
    params = internlm2.init_params(jax.random.PRNGKey(0), cfg.llm, jnp.bfloat16)
    if args.quant == "int8":
        from callireader_tpu.runtime.quantize import quantize_llm_int8

        params = quantize_llm_int8(params)
    mesh = None
    if args.mesh:
        shape = {k: int(v) for k, v in (kv.split("=") for kv in args.mesh.split(","))}
        mesh = spmd.make_mesh(shape)
        params = spmd.shard_tree(params, internlm2.logical_axes(cfg.llm), mesh)

    def make_batcher():
        if args.paged:
            from callireader_tpu.runtime.paged_cache import PagedBatcher

            pages = -(-args.max_len // 128)
            return PagedBatcher(
                params, cfg.llm, num_slots=args.slots,
                num_pages=args.slots * pages + 1, page_size=128,
                max_pages_per_slot=pages, use_flash=on_tpu,
                steps_per_sync=args.steps_per_sync, mesh=mesh,
            )
        return ContinuousBatcher(
            params, cfg.llm, num_slots=args.slots, max_len=args.max_len,
            use_flash=on_tpu, steps_per_sync=args.steps_per_sync, mesh=mesh,
        )

    rng = np.random.RandomState(0)
    if args.prefix_cache and not args.shared_prefix:
        p.error("--prefix-cache needs --shared-prefix")
    if args.shared_prefix >= args.prompt_len:
        # >=: the prefix-hit path needs at least one suffix token
        p.error("--shared-prefix must be < --prompt-len")
    shared_ids = rng.randint(10, 90000, args.shared_prefix).astype(np.int32)
    shared_embeds = (
        np.asarray(
            internlm2.embed_tokens(params, jnp.asarray(shared_ids[None]), jnp.bfloat16)
        )[0]
        if args.shared_prefix
        else None
    )

    def reqs():
        out = []
        for uid in range(args.requests):
            tail = args.prompt_len - args.shared_prefix
            ids = np.concatenate(
                [shared_ids, rng.randint(10, 90000, tail).astype(np.int32)]
            ) if args.shared_prefix else rng.randint(10, 90000, args.prompt_len).astype(np.int32)
            e = np.asarray(
                internlm2.embed_tokens(params, jnp.asarray(ids[None]), jnp.bfloat16)
            )[0]
            # staggered lengths: retirements + admissions stay interleaved
            n = args.max_new // 2 + (uid * args.max_new // 2) // max(1, args.requests - 1)
            out.append(Request(uid=uid, embeds=e, max_new_tokens=n, eos_token_ids=(-1,)))
        return out

    # warmup (compiles prefill/decode programs)
    b = make_batcher()
    if args.prefix_cache:
        b.register_prefix(shared_embeds)
    for r in reqs()[: args.slots]:
        r.max_new_tokens = 4
        b.submit(r)
    b.run()
    print("[bench_serving] warmup done", file=sys.stderr)

    b = make_batcher()
    if args.prefix_cache:
        b.register_prefix(shared_embeds)
    t0 = time.time()
    for r in reqs():
        b.submit(r)
    done = b.run()
    dt = time.time() - t0
    toks = sum(len(r.tokens) for r in done)
    print(
        json.dumps({
            "metric": "serving_agg_tok_per_sec",
            "value": round(toks / dt, 2),
            "unit": "tok/s",
            "requests": args.requests,
            "slots": args.slots,
            "paged": args.paged,
            "steps_per_sync": args.steps_per_sync,
            "quant": args.quant,
            "mesh": args.mesh,
            "total_tokens": toks,
            "seconds": round(dt, 2),
            "shared_prefix": args.shared_prefix,
            "prefix_cache": args.prefix_cache,
            "prefix_hits": getattr(b, "prefix_hits", 0),
        })
    )


if __name__ == "__main__":
    main()
