"""Single-chip 8B proof: int8 weight-only flagship decode on one v5e.

  python scripts/bench_8b_int8.py [--batch 4 --prompt 1024 --tokens 32]

callireader-8b is ~15.5 GB in bf16 — over one v5e's 16 GB HBM once a KV cache
exists. Weight-only int8 (runtime/quantize.py) brings the LLM to ~7.8 GB, so
the full 32-layer flagship decodes on a single chip. This script builds the
8B int8 params HOST-SIDE leaf by leaf (materializing bf16 on device first
would OOM), ships only int8 + scales, runs prefill + fused decode, and prints
ONE JSON line with ms/step and the HBM footprint. Run on TPU.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def _quant_rows(w, axis_keepdim):
    """Symmetric absmax int8 with scales along all dims but the last."""
    import numpy as np

    absmax = np.max(np.abs(w), axis=axis_keepdim, keepdims=True)
    scale = np.maximum(absmax, 1e-8) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--prompt", type=int, default=1024)
    p.add_argument("--tokens", type=int, default=32)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from callireader_tpu.core.config import callireader_8b
    from callireader_tpu.models import internlm2
    from callireader_tpu.runtime import generate as gen

    cfg = callireader_8b().llm
    L, E, M = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    V = cfg.vocab_size
    rng = np.random.RandomState(0)

    def ship(name, shape, scale_axis):
        """host random init (0.02 std) -> int8 quantize -> device. Layers are
        generated once and tiled over the stack axis: identical layer weights
        change nothing about memory footprint or per-step HBM traffic, and cut
        the 1-core host init ~L-fold."""
        if len(shape) == 3:  # (L, in, out) stacked
            w1 = rng.standard_normal(shape[1:]).astype(np.float32) * 0.02
            q1, s1 = _quant_rows(w1, 0)
            q = np.broadcast_to(q1[None], shape)
            s = np.broadcast_to(s1[None], (shape[0],) + s1.shape)
        else:
            w = rng.standard_normal(shape).astype(np.float32) * 0.02
            q, s = _quant_rows(w, scale_axis)
            del w
        return jnp.asarray(q), jnp.asarray(s)

    t0 = time.time()
    layers = {
        "attn_norm": jnp.ones((L, E), jnp.bfloat16),
        "ffn_norm": jnp.ones((L, E), jnp.bfloat16),
    }
    # fused QKV / gate-up layout (runtime/quantize.fuse_llm_int8 semantics):
    # per-out-channel scales make joint quantization identical to
    # quantize-then-concat, and decode runs 4 projection kernels/layer not 7
    for name, shape in (
        ("wqkv", (L, E, (Hq + 2 * Hkv) * D)), ("wo", (L, Hq * D, E)),
        ("w13", (L, E, 2 * M)), ("w2", (L, M, E)),
    ):
        q, s = ship(name, shape, 1)
        layers[f"{name}_q"] = q
        layers[f"{name}_scale"] = s
        print(f"[8b-int8] shipped {name} {shape}", file=sys.stderr)
    params = {"layers": layers, "norm": jnp.ones((E,), jnp.bfloat16)}
    for name in ("tok_embeddings", "output"):
        q, s = ship(name, (V, E), 1)
        params[f"{name}_q"] = q
        params[f"{name}_scale"] = s
        print(f"[8b-int8] shipped {name}", file=sys.stderr)
    # 128-pad the vocab tables so the fused-dequant head kernel engages
    params, cfg = internlm2.pad_vocab(params, cfg, 128)
    n_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    print(f"[8b-int8] params on device: {n_bytes/1e9:.2f} GB "
          f"(built+shipped in {time.time()-t0:.0f}s)", file=sys.stderr)

    B, S, T = args.batch, args.prompt, args.tokens
    ids = rng.randint(10, 90000, (B, S)).astype(np.int32)
    embeds = internlm2.embed_tokens(params, jnp.asarray(ids), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)
    gcfg = gen.GenerateConfig(max_new_tokens=T, eos_token_ids=(-1,))

    toks, lengths = gen.generate_from_embeds(
        params, cfg, embeds, mask, gen_cfg=gcfg, max_cache_len=S + T, use_flash=True,
    )
    assert (np.asarray(lengths) == T).all()  # sync; proves the full path ran
    print("[8b-int8] warmup decode done", file=sys.stderr)

    def timed(tokens):
        g = gen.GenerateConfig(max_new_tokens=tokens, eos_token_ids=(-1,))
        t0 = time.time()
        _, lens = gen.generate_from_embeds(
            params, cfg, embeds, mask, gen_cfg=g, max_cache_len=S + T,
            use_flash=True,
        )
        _ = np.asarray(lens)
        return time.time() - t0

    # marginal decode step = d(total)/d(tokens): subtracts the prefill AND
    # the fixed dispatch/readback overhead that (total/T) folds in
    t_short = timed(max(8, T // 4))
    _ = timed(max(8, T // 4))  # compile the short variant before timing
    t_short = timed(max(8, T // 4))
    total = timed(T)
    marginal = (total - t_short) / (T - max(8, T // 4))
    kv_bytes = L * B * Hkv * (S + T) * D * 2 * 2
    print(
        json.dumps({
            "metric": "8b_int8_single_chip_decode_ms_per_step",
            "value": round(marginal * 1e3, 1),  # pure decode step
            "unit": "ms",
            "ms_per_tok_incl_prefill": round(total / T * 1e3, 1),
            "total_sec_prefill_plus_decode": round(total, 2),
            "params_gb_int8": round(n_bytes / 1e9, 2),
            "kv_gb": round(kv_bytes / 1e9, 2),
            "batch": B, "prompt": S, "tokens": T,
            "fits_single_chip": True,
        })
    )


if __name__ == "__main__":
    main()
