"""Decode-loop speed evidence: ms/token-step for the fused generate loop.

  python scripts/bench_decode.py --preset callireader-2b --batch 8 \
      --prompt 4096 --tokens 64

Separates prefill time from per-step decode time so regressions against the
HBM roofline (weight bytes + KV bytes per step) are visible. Prints ONE JSON
line. Run on TPU for recorded numbers.
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
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prompt", type=int, default=4096)
    p.add_argument("--tokens", type=int, default=64)
    p.add_argument("--use-flash", type=int, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from callireader_tpu.core.config import get_config
    from callireader_tpu.models import internlm2
    from callireader_tpu.runtime import generate as gen

    cfg = get_config(args.preset).llm
    on_tpu = jax.devices()[0].platform != "cpu"
    use_flash = bool(args.use_flash) if args.use_flash is not None else on_tpu
    params = internlm2.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    B, S, T = args.batch, args.prompt, args.tokens
    max_cache = S + T
    rng = np.random.RandomState(0)
    ids = rng.randint(10, 90000, (B, S)).astype(np.int32)
    embeds = internlm2.embed_tokens(params, jnp.asarray(ids), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)

    # prefill alone
    pf = jax.jit(lambda p, e, m: internlm2.prefill(
        p, cfg, inputs_embeds=e, attention_mask=m, max_len=max_cache,
        use_flash=use_flash,
    ))
    logits, cache = pf(params, embeds, mask)
    _ = np.asarray(logits[0, :2])  # sync
    t0 = time.time()
    logits, cache = pf(params, embeds, mask)
    _ = np.asarray(logits[0, :2])
    prefill_s = time.time() - t0

    # full generate (prefill + T fused decode steps)
    gcfg = gen.GenerateConfig(max_new_tokens=T, eos_token_ids=(-1,))
    toks, lengths = gen.generate_from_embeds(
        params, cfg, embeds, mask, gen_cfg=gcfg, max_cache_len=max_cache,
        use_flash=use_flash,
    )
    _ = np.asarray(lengths)  # sync (also warms the program)
    t0 = time.time()
    toks, lengths = gen.generate_from_embeds(
        params, cfg, embeds, mask, gen_cfg=gcfg, max_cache_len=max_cache,
        use_flash=use_flash,
    )
    _ = np.asarray(lengths)
    total_s = time.time() - t0
    per_step_ms = (total_s - prefill_s) / T * 1e3

    # rooflines (bf16): weight bytes + KV bytes per decode step
    n_params = sum(x.size for x in jax.tree.leaves(params))
    kv_bytes = (
        cfg.num_hidden_layers * B * cfg.num_key_value_heads * max_cache
        * cfg.head_dim * 2 * 2
    )
    hbm_gb_per_step = (n_params * 2 + kv_bytes) / 1e9
    print(
        f"[bench_decode] prefill {prefill_s:.2f}s, total {total_s:.2f}s, "
        f"decode {per_step_ms:.1f} ms/step, ~{hbm_gb_per_step:.1f} GB/step read",
        file=sys.stderr,
    )
    print(
        json.dumps({
            "metric": "decode_ms_per_step",
            "value": round(per_step_ms, 2),
            "unit": "ms",
            "prefill_sec": round(prefill_s, 3),
            "batch": B, "prompt": S, "tokens": T,
            "params_b": round(n_params / 1e9, 2),
            "hbm_gb_per_step": round(hbm_gb_per_step, 2),
            "roofline_ms_at_800gbps": round(hbm_gb_per_step / 800 * 1e3, 2),
            "use_flash": use_flash,
        })
    )


if __name__ == "__main__":
    main()
