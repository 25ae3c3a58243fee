"""Interactive chat CLI with token streaming.

Parity target: train/xtuner/tools/chat.py (interactive REPL with TextStreamer
and stop-word criteria). Commands: RESET clears history, EXIT quits.

Streaming uses the step-wise decode path (prefill + jitted decode_step python
loop) instead of the fused while_loop so tokens print as they are generated.
"""

from __future__ import annotations

import argparse
import os
import sys


def stream_generate(engine, question, history, *, image=None, max_new_tokens=512,
                    repetition_penalty=1.0, stop_words=()):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.models import internlm2
    from callireader_tpu.runtime import generate as gen
    from callireader_tpu.runtime.conversation import build_chat_prompt
    from callireader_tpu.runtime.engine import IMG_CONTEXT, IMG_END, IMG_START
    from callireader_tpu.vision import preprocess

    cfg = engine.cfg
    img_embeds = None
    num_patches_list = []
    if image is not None:
        pixel_values = preprocess.load_image(
            image, cfg.force_image_size, cfg.max_dynamic_patch, cfg.use_thumbnail,
            as_uint8=True,
        )
        num_patches_list = [pixel_values.shape[0]]
        img_embeds = engine.encode_image_tiles(pixel_values)
        if "<image>" not in question and history is None:
            question = "<image>\n" + question

    conv = build_chat_prompt(question, history)
    query = conv.get_prompt()
    for n in num_patches_list:
        query = query.replace(
            "<image>", IMG_START + IMG_CONTEXT * cfg.num_image_token * n + IMG_END, 1
        )
    ids = np.asarray(engine.tok.encode(query), np.int32)

    bucket = gen.bucket_length(len(ids))
    padded = np.full((1, bucket), engine.tok.pad_token_id, np.int32)
    padded[0, bucket - len(ids):] = ids
    mask = np.zeros((1, bucket), np.int32)
    mask[0, bucket - len(ids):] = 1
    img = img_embeds.reshape(-1, img_embeds.shape[-1]) if img_embeds is not None else None
    embeds = engine._build_embeds(engine.params, jnp.asarray(padded), img, None)

    max_cache = bucket + max_new_tokens
    prefill = jax.jit(
        lambda p, e, m: internlm2.prefill(
            p, cfg.llm, inputs_embeds=e, attention_mask=m, max_len=max_cache,
            policy=engine.policy, use_flash=engine.use_flash,
        ),
    )
    decode = jax.jit(
        lambda p, t, c, kv: internlm2.decode_step(
            p, cfg.llm, input_ids=t, cache=c, kv_valid_mask=kv, policy=engine.policy
        )
    )
    logits, cache = prefill(engine.params["llm"], embeds, jnp.asarray(mask))
    kv_valid = np.zeros((1, max_cache), np.int32)
    kv_valid[0, :bucket] = mask[0]
    kv_valid = jnp.asarray(kv_valid)

    eos = engine.tok.convert_tokens_to_ids(conv.sep)
    seen = np.zeros((engine.cfg.llm.vocab_size,), bool)
    pieces = []
    printed = ""
    for step in range(max_new_tokens):
        lg = np.asarray(logits)[0]
        if repetition_penalty != 1.0:
            pen = np.where(lg < 0, lg * repetition_penalty, lg / repetition_penalty)
            lg = np.where(seen, pen, lg)
        tok_id = int(lg.argmax())
        if tok_id == eos or tok_id == engine.tok.eos_token_id:
            break
        seen[tok_id] = True
        pieces.append(tok_id)
        text = engine.tok.decode(pieces, skip_special_tokens=True)
        # StopWordStoppingCriteria equivalent (xtuner utils/stop_criteria.py:5)
        if any(text.endswith(w) for w in stop_words):
            text = next(text[: -len(w)] for w in stop_words if text.endswith(w))
            sys.stdout.write(text[len(printed):])
            printed = text
            break
        sys.stdout.write(text[len(printed):])
        sys.stdout.flush()
        printed = text
        slot = jnp.arange(max_cache)[None, :]
        kv_valid = jnp.where(slot == cache.length, 1, kv_valid)
        logits, cache = decode(
            engine.params["llm"], jnp.full((1, 1), tok_id, jnp.int32), cache, kv_valid
        )
    sys.stdout.write("\n")
    response = engine.tok.decode(pieces, skip_special_tokens=True).strip()
    history = list(history or [])
    history.append((question, response))
    return response, history


def main(argv=None):
    parser = argparse.ArgumentParser(description="interactive chat")
    parser.add_argument("--image", type=str, default=None)
    parser.add_argument("--preset", type=str, default="callireader-8b")
    parser.add_argument("--checkpoint", type=str, default=os.environ.get("CALLIREADER_CKPT"))
    parser.add_argument("--random-init", action="store_true")
    parser.add_argument("--quant", type=str, default=None, choices=[None, "int8", "int8-all"])
    parser.add_argument("--max-new-tokens", type=int, default=512)
    parser.add_argument("--repetition-penalty", type=float, default=1.0)
    parser.add_argument("--system", type=str, default=None)
    parser.add_argument("--stop-words", type=str, nargs="*", default=[])
    parser.add_argument("--agent", action="store_true",
                        help="ReAct agent mode with calculate/solve/search "
                        "tools (the reference chat tool's --lagent mode, "
                        "tools/chat.py:172-213)")
    args = parser.parse_args(argv)

    from callireader_tpu.cli.common import build_engine

    engine = build_engine(
        preset=args.preset, checkpoint_dir=args.checkpoint, random_init_ok=args.random_init,
        quant=args.quant,
    )
    history = None
    image = args.image
    agent = None
    if args.agent:
        from callireader_tpu.runtime.agent import ReActAgent

        def _chat_fn(question, hist):
            return stream_generate(
                engine, question, hist,
                max_new_tokens=args.max_new_tokens,
                repetition_penalty=args.repetition_penalty,
                stop_words=("Response:",),
            )

        agent = ReActAgent(_chat_fn)
    print("double enter to end input; 'RESET' clears history, 'EXIT' quits", file=sys.stderr)
    while True:
        try:
            text = input("\nuser> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not text:
            continue
        if text == "EXIT":
            break
        if text == "RESET":
            history = None
            if agent is not None:
                agent.reset()
            print("history cleared", file=sys.stderr)
            continue
        print("assistant> ", end="", flush=True)
        if agent is not None:
            print(agent.chat(text))
            continue
        _, history = stream_generate(
            engine, text, history, image=image if history is None else None,
            max_new_tokens=args.max_new_tokens,
            repetition_penalty=args.repetition_penalty,
            stop_words=tuple(args.stop_words),
        )


if __name__ == "__main__":
    main()
