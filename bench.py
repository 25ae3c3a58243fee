"""End-of-round benchmark: CalliBench-style full-page recognition throughput.

Runs the flagship single-chip config (callireader-2b: full CalliReader layer
topology, depth reduced to fit one v5e chip in bf16) through the complete
full-page pipeline per image:
  - 8 main-image tiles -> InternViT -> pixel-shuffle projector
  - 96 character slices -> ViT -> perceiver resampler -> cosine VQ -> denorm
  - prompt build + embed splice -> prefill (Pallas flash attention)
  - 256 greedy decode steps (on-device lax.while_loop, repetition penalty 1.0)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md) -> vs_baseline is null.
"""

import json
import sys
import time

import numpy as np

N_WARMUP = 1
N_IMAGES = 4
N_CHARS = 96
N_TILES = 8
DECODE_TOKENS = 256
PROMPT_BUCKET = 4096


def main():
    import jax
    import jax.numpy as jnp

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from callireader_tpu.core.config import callireader_2b
    from callireader_tpu.runtime import generate as gen
    from callireader_tpu.runtime.engine import CalliReaderEngine, init_all_params
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

    cfg = callireader_2b()
    on_tpu = jax.devices()[0].platform != "cpu"
    print(f"[bench] platform={jax.devices()[0].platform}", file=sys.stderr)

    params = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    engine = CalliReaderEngine(cfg, params, tok, use_flash=on_tpu)

    rng = np.random.RandomState(0)
    stage = {}

    def one_image(seed: int) -> None:
        # main image tiles (aspect-bucketed at 7+thumbnail=8 in the pipeline)
        tiles = rng.randint(
            0, 255, (N_TILES, cfg.force_image_size, cfg.force_image_size, 3), np.uint8
        )
        t0 = time.time()
        img_embeds = engine.encode_image_tiles(tiles)
        img_embeds.block_until_ready()
        stage["vit_tiles"] = stage.get("vit_tiles", 0.0) + time.time() - t0

        # character slices -> pseudo tokens (content-canvas transfer format)
        from callireader_tpu.vision import preprocess

        canvas = preprocess.char_content_canvas(cfg.force_image_size)
        chars = rng.randint(0, 255, (N_CHARS, canvas, canvas, 3), np.uint8)

        t0 = time.time()
        feats = engine.encode_char_contents(chars)
        pseudo, _ = engine._resample_vq(engine.params, feats)
        pseudo = pseudo[: N_CHARS * cfg.resampler.num_learns]
        pseudo.block_until_ready()
        stage["chars_vq"] = stage.get("chars_vq", 0.0) + time.time() - t0

        # prompt: system + question + image tokens + pseudo slots
        from callireader_tpu.runtime.conversation import build_chat_prompt
        from callireader_tpu.runtime.engine import ALIGNED, IMG_CONTEXT, IMG_END, IMG_START

        q = "<image>\n读出图中所有文字。" + ALIGNED * pseudo.shape[0]
        conv = build_chat_prompt(q)
        query = conv.get_prompt().replace(
            "<image>", IMG_START + IMG_CONTEXT * cfg.num_image_token * N_TILES + IMG_END, 1
        )
        ids = np.asarray(tok.encode(query), np.int32)

        gcfg = gen.GenerateConfig(
            max_new_tokens=DECODE_TOKENS,
            eos_token_ids=(-1,),  # random weights never hit a real eos; fixed budget
            repetition_penalty=1.0,
        )
        t0 = time.time()
        out = engine._generate(ids, img_embeds, pseudo, gcfg)
        assert len(out) == DECODE_TOKENS
        stage["prefill_decode"] = stage.get("prefill_decode", 0.0) + time.time() - t0

    for i in range(N_WARMUP):
        t0 = time.time()
        one_image(i)
        print(f"[bench] warmup {i}: {time.time()-t0:.1f}s", file=sys.stderr)

    stage.clear()
    t0 = time.time()
    for i in range(N_IMAGES):
        one_image(100 + i)
    dt = time.time() - t0
    print(f"[bench] stage totals: { {k: round(v,2) for k,v in stage.items()} }", file=sys.stderr)
    ips = N_IMAGES / dt
    print(
        f"[bench] {N_IMAGES} imgs in {dt:.2f}s -> {ips:.4f} imgs/s "
        f"({N_TILES} tiles + {N_CHARS} chars + {DECODE_TOKENS} decode tokens each)",
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
