"""Prefix-cache prefill speedup: full-prompt prefill vs chunked suffix prefill.

  python scripts/bench_prefix.py --preset callireader-2b --rows 8 \
      --prompt 4096 --prefix 3584 [--iters 5]

Times the two admission programs the ContinuousBatcher dispatches for a wave
of ``rows`` requests whose prompts share a ``prefix``-token registered prefix
(runtime/serving.register_prefix): the full (rows, prompt) prefill vs the
chunked (rows, prompt - prefix) prefill_with_prefix. This is the per-wave
admission latency (TTFT share) the cache removes; the decode path is
untouched. The reference re-prefills the full transcript every chat turn
(modeling_internvl_chat.py:290-344). Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="callireader-2b")
    p.add_argument("--rows", type=int, default=8)
    p.add_argument("--prompt", type=int, default=4096)
    p.add_argument("--prefix", type=int, default=3584)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args(argv)
    assert 0 < args.prefix < args.prompt

    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from callireader_tpu.core.config import get_config
    from callireader_tpu.models import internlm2

    cfg = get_config(args.preset).llm
    on_tpu = jax.devices()[0].platform != "cpu"
    params = internlm2.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 90000, (args.rows, args.prompt)).astype(np.int32)
    ids[:, : args.prefix] = ids[0, : args.prefix]  # shared prefix
    embeds = internlm2.embed_tokens(params, jnp.asarray(ids), jnp.bfloat16)
    max_len = args.prompt + 128

    full = jax.jit(lambda p, e: internlm2.prefill(
        p, cfg, inputs_embeds=e, max_len=max_len, use_flash=on_tpu,
    ))
    chunked = jax.jit(lambda p, e, pk, pv: internlm2.prefill_with_prefix(
        p, cfg, inputs_embeds=e,
        attention_mask=jnp.ones(e.shape[:2], jnp.int32),
        prefix_k=pk, prefix_v=pv, max_len=max_len, use_flash=on_tpu,
    ))

    def timed(fn, *a):
        out = fn(*a)
        np.asarray(out[0])[0, 0]  # force a d2h sync (tunnel-safe)
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*a)
        np.asarray(out[0])[0, 0]
        return (time.time() - t0) / args.iters

    t_full = timed(full, params, embeds)
    _, pc = jax.jit(lambda p, e: internlm2.prefill(
        p, cfg, inputs_embeds=e, max_len=args.prefix, use_flash=on_tpu,
    ))(params, embeds[:1, : args.prefix])
    pk, pv = pc.k[:, 0], pc.v[:, 0]
    t_chunk = timed(chunked, params, embeds[:, args.prefix:], pk, pv)

    print(json.dumps({
        "metric": "prefix_cache_prefill_speedup",
        "value": round(t_full / t_chunk, 2),
        "unit": "x",
        "full_prefill_s": round(t_full, 4),
        "chunked_prefill_s": round(t_chunk, 4),
        "rows": args.rows,
        "prompt": args.prompt,
        "prefix": args.prefix,
        "preset": args.preset,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
