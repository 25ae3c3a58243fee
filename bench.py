"""End-of-round benchmark: CalliBench-style full-page recognition throughput.

Runs the flagship single-chip config (callireader-2b: full CalliReader layer
topology, depth reduced to fit one v5e chip in bf16) through the complete
batched full-page pipeline (the engine's batch_chat_ocr / --batch_size mode):

  per image: 8 main tiles -> ViT -> projector; 96 char content boxes -> ViT ->
             perceiver resampler -> cosine VQ -> denorm; prompt splice
  then:      ONE prefill + ONE fused on-device decode loop (256 tokens) for
             the whole batch — decode HBM traffic amortizes across images,
             which is the structural win over the reference's sequential
             evaluate.py loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md) -> vs_baseline is null.
"""

import json
import sys
import time

import numpy as np

BATCH = 8
N_BATCHES = 3
N_CHARS = 96
N_TILES = 8
DECODE_TOKENS = 256


def main():
    import jax
    import jax.numpy as jnp

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from callireader_tpu.core.config import callireader_2b
    from callireader_tpu.runtime import generate as gen
    from callireader_tpu.runtime.conversation import build_chat_prompt
    from callireader_tpu.runtime.engine import (
        ALIGNED, IMG_CONTEXT, IMG_END, IMG_START, CalliReaderEngine, init_all_params,
    )
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer
    from callireader_tpu.vision import preprocess

    cfg = callireader_2b()
    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"[bench] platform={jax.devices()[0].platform}", file=sys.stderr)

    params = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    engine = CalliReaderEngine(cfg, params, tok, use_flash=on_tpu)

    rng = np.random.RandomState(0)
    stage = {}
    canvas = preprocess.char_content_canvas(cfg.force_image_size)

    def build_row(seed: int) -> np.ndarray:
        """Vision + align + splice for one image -> (S, E) prompt embeds."""
        t0 = time.time()
        tiles = rng.randint(
            0, 255, (N_TILES, cfg.force_image_size, cfg.force_image_size, 3), np.uint8
        )
        img_embeds = engine.encode_image_tiles(tiles)
        stage["vit_tiles"] = stage.get("vit_tiles", 0.0) + time.time() - t0

        t0 = time.time()
        chars = rng.randint(0, 255, (N_CHARS, canvas, canvas, 3), np.uint8)
        feats = engine.encode_char_contents(chars)
        pseudo, _ = engine._resample_vq(engine.params, feats)
        pseudo = pseudo[: N_CHARS * cfg.resampler.num_learns]
        stage["chars_vq"] = stage.get("chars_vq", 0.0) + time.time() - t0

        t0 = time.time()
        q = "<image>\n读出图中所有文字。" + ALIGNED * (N_CHARS * cfg.resampler.num_learns)
        conv = build_chat_prompt(q)
        query = conv.get_prompt().replace(
            "<image>", IMG_START + IMG_CONTEXT * cfg.num_image_token * N_TILES + IMG_END, 1
        )
        ids = np.asarray(tok.encode(query), np.int32)
        bucket = gen.bucket_length(len(ids))
        e, m = engine._build_row_embeds(ids, img_embeds, pseudo, bucket)
        stage["splice"] = stage.get("splice", 0.0) + time.time() - t0
        return e, m

    gcfg = gen.GenerateConfig(
        max_new_tokens=DECODE_TOKENS,
        eos_token_ids=(-1,),  # random weights: fixed decode budget
        repetition_penalty=1.0,
    )

    def dispatch_batch(seed: int):
        """Vision + splice + async generate dispatch (no host sync)."""
        built = [build_row(seed * BATCH + i) for i in range(BATCH)]
        embeds = jnp.concatenate([e for e, _ in built], axis=0)  # device-side
        mask = np.concatenate([m for _, m in built], axis=0)
        return gen.generate_from_embeds(
            engine.params["llm"], cfg.llm, embeds, jnp.asarray(mask),
            gen_cfg=gcfg, max_cache_len=embeds.shape[1] + DECODE_TOKENS,
            use_flash=on_tpu,
        )

    t0 = time.time()
    toks, lengths = dispatch_batch(0)  # warmup (compiles)
    assert (np.asarray(lengths) == DECODE_TOKENS).all()
    print(f"[bench] warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    # One generate in flight (two full generates crowd HBM with double KV
    # caches — measured slower), but batch N+1's vision/transfer work is
    # issued BEFORE syncing batch N's decode: the char h2d rides the DMA
    # engines while the decode loop owns the compute core. Measured +68%
    # over the fully sequential loop on v5e.
    stage.clear()
    t0 = time.time()
    prev = None
    for b in range(1, 1 + N_BATCHES):
        built = [build_row(b * BATCH + i) for i in range(BATCH)]
        if prev is not None:
            assert (np.asarray(prev[1]) == DECODE_TOKENS).all()
        embeds = jnp.concatenate([e for e, _ in built], axis=0)
        mask = np.concatenate([m for _, m in built], axis=0)
        prev = gen.generate_from_embeds(
            engine.params["llm"], cfg.llm, embeds, jnp.asarray(mask),
            gen_cfg=gcfg, max_cache_len=embeds.shape[1] + DECODE_TOKENS,
            use_flash=on_tpu,
        )
    assert (np.asarray(prev[1]) == DECODE_TOKENS).all()
    dt = time.time() - t0
    n_imgs = BATCH * N_BATCHES
    ips = n_imgs / dt
    print(
        f"[bench] stage totals: { {k: round(v, 2) for k, v in stage.items()} }",
        file=sys.stderr,
    )
    print(
        f"[bench] {n_imgs} imgs in {dt:.2f}s -> {ips:.4f} imgs/s "
        f"(batch {BATCH}; {N_TILES} tiles + {N_CHARS} chars + {DECODE_TOKENS} decode "
        f"tokens per img)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "full_page_pipeline_imgs_per_sec_per_chip",
                "value": round(ips, 4),
                "unit": "imgs/sec",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
