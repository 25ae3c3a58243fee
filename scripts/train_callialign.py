"""Train CalliAlign (resampler LoRA + small leaves) and emit assets/callialign.npz.

  python scripts/train_callialign.py --steps 4000 --batch 48 --rank 64 \
      --out callireader_tpu/assets/callialign.npz

See callireader_tpu/train/callialign_train.py for what is being trained and
the honest scope of the resulting metric. Runs on the real TPU (axon) by
default; --cpu forces local CPU (tiny smoke runs only — the frozen ViT is the
full InternViT-300M).
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--rank", type=int, default=64)
    p.add_argument("--vit-rank", type=int, default=32)
    p.add_argument("--no-white-center", dest="white_center",
                   action="store_false", default=True)
    p.add_argument("--aux-weight", type=float, default=1.0)
    p.add_argument("--bf16", action="store_true",
                   help="train in bf16 (stalls; see the fp32 default note)")
    p.add_argument("--ls-init", type=float, default=0.1,
                   help="ReZero-style re-init of the trainable ls1/ls2: the "
                   "seed-0 base's ls=1 runs 24 RANDOM blocks at full scale, "
                   "scrambling both features and gradients; starting small "
                   "keeps the (information-preserving) patch embedding "
                   "dominant and lets training re-admit depth as it learns")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup", type=int, default=200)
    p.add_argument("--canvas", type=str, default="448,364",
                   help="comma list; steps round-robin so the asset works at "
                   "both the parity canvas and the FLOP-lever canvas")
    p.add_argument("--p-fixture", type=float, default=0.5)
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--synth-chars", type=int, default=0,
                   help="cap on synthetic distractor classes (0 = all ~7k)")
    p.add_argument("--eval-every", type=int, default=250)
    p.add_argument("--out", type=str,
                   default="callireader_tpu/assets/callialign.npz")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from callireader_tpu.core.cache import enable_compilation_cache
    from callireader_tpu.core.config import get_config
    from callireader_tpu.core.dtypes import DEFAULT_POLICY, FP32_POLICY
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer, DEFAULT_MODEL
    from callireader_tpu.train import callialign_train as ca

    enable_compilation_cache()
    cfg = get_config("callireader-2b")  # vision/resampler/align identical to 8b
    # fp32 by default: early-training feature differences between chars are
    # ~1% of magnitude — BELOW bf16's 0.4% resolution — so bf16 training
    # stalls at the batch-prior collapse floor while fp32 converges (fixed
    # 32-sample overfit: bf16 vq_acc 0.06 flat, fp32 0.97 by step 425 at
    # just +15% step time). Inference stays bf16: trained outputs are
    # well-separated, far above bf16 resolution.
    policy = DEFAULT_POLICY if args.bf16 else FP32_POLICY
    tok = InternLM2Tokenizer(DEFAULT_MODEL)
    canvases = [int(c) for c in args.canvas.split(",")]

    print("[data] building fixture + synthetic class lists", flush=True)
    fixture = ca.fixture_samples(tok)
    vocab = ca.single_char_vocab(tok)
    fix_tids = {tid for _, _, _, tid in fixture}
    synth = [(tid, ch) for tid, ch in vocab if tid not in fix_tids]
    if args.synth_chars:
        synth = synth[: args.synth_chars]
    print(f"[data] fixture chars: {len(fixture)}, synthetic classes: {len(synth)}",
          flush=True)
    # label space for the training heads: every single-char vocab piece;
    # tid -> class index (the eval fn still argmaxes the FULL 92553 table)
    cls_of_tid = {tid: i for i, (tid, _ch) in enumerate(vocab)}
    cls_map = np.full(tok.vocab_size, -1, np.int64)
    for tid, i in cls_of_tid.items():
        cls_map[tid] = i

    frozen = jax.device_put(ca.build_frozen(
        cfg, class_token_ids=[tid for tid, _ch in vocab]))
    base_res = jax.device_put(ca.base_resampler_params(cfg.resampler))

    key = jax.random.PRNGKey(args.seed + 1)
    kr, kv = jax.random.split(key)
    trainable = {
        "small": ca.small_leaves(base_res),
        "lora": ca.init_lora(kr, {k: np.asarray(v) for k, v in
                                  base_res["layers"].items()
                                  if k in ca.LORA_MATS}, args.rank),
        # the char-ViT delta: without it the encoder is a frozen RANDOM init
        # and features are near-degenerate (callialign_train.init_vit_lora)
        "vit_small": ca.vit_small_leaves(frozen["vision"]),
        "vit_lora": ca.init_vit_lora(kv, frozen["vision"]["layers"],
                                     args.vit_rank),
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
        # training-only encoder probe (callialign_train.make_step_fn head 2)
        "aux": ca.init_aux_head(jax.random.PRNGKey(args.seed + 2), cfg,
                                len(vocab)),
    }
    for k in ("ls1", "ls2"):
        trainable["vit_small"]["layers"][k] = jnp.full_like(
            trainable["vit_small"]["layers"][k], args.ls_init)
    if args.white_center:
        # Collapse-breaking init: at seed-0 init, outputs for DIFFERENT chars
        # have pairwise cos 0.9958 (measured) because every patch — white
        # canvas and mostly-paper content alike — embeds near the same
        # constant vector, so attention pooling returns a sample-independent
        # mean and the encoder gradient is quantization noise. Centering the
        # patch embedding on the all-white patch (bias := -white_vec @ W)
        # makes white tokens exactly 0, leaving ink deviation as the signal.
        from callireader_tpu.models.internvit import IMAGENET_MEAN, IMAGENET_STD

        P = cfg.vision.patch_size
        white = (1.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        wvec = jnp.asarray(np.repeat(white, P * P), jnp.float32)  # (C*P*P,) c-major
        pe = trainable["vit_small"]["patch_embed"]
        pe["bias"] = -(wvec @ pe["kernel"])
        # the (shared, additive) position embedding re-grows if useful
        trainable["vit_small"]["pos_embed"] = trainable["vit_small"]["pos_embed"] * 0.1
    if args.resume and os.path.exists(args.resume):
        loaded, meta = ca.load_asset(args.resume)
        for k in ("small", "lora", "vit_small", "vit_lora"):
            if k in loaded:
                trainable[k] = loaded[k]
        print(f"[resume] loaded {args.resume} (meta {meta})", flush=True)

    warmup = min(args.warmup, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, max(args.steps, warmup + 1), args.lr * 0.05)
    optimizer = optax.adamw(sched, weight_decay=1e-4)
    opt_state = optimizer.init(trainable)

    steps = {c: ca.make_step_fn(cfg, c, policy, optimizer,
                                use_flash=None if not args.cpu else False,
                                aux_weight=args.aux_weight)
             for c in canvases}
    evals = {c: ca.make_eval_fn(cfg, c, policy,
                                use_flash=None if not args.cpu else False)
             for c in canvases}

    # fixed eval sets: clean fixture crops + held-out augmented views + synth
    ev_rng = np.random.RandomState(12345)
    fix_clean = [(c[b[0]:b[2], b[1]:b[3]], t) for c, b, _ch, t in fixture]
    fix_aug = []
    for c, b, _ch, t in fixture:
        for _ in range(2):
            fix_aug.append((ca.augment_luma(c, ev_rng, box=b,
                                            strength=args.strength), t))
    sampler_ev = ca.BatchSampler(None, synth, ev_rng, p_fixture=0.0,
                                 strength=args.strength)
    synth_eval = [(sampler_ev._glyph(ch), t)
                  for t, ch in synth[:: max(1, len(synth) // 128)][:128]]

    def eval_pack(pairs):
        from PIL import Image

        crops = []
        for c, _ in pairs:
            m = max(c.shape)
            if m > ca.RAW_BUCKET:
                s = ca.RAW_BUCKET / m
                c = np.asarray(Image.fromarray(c).resize(
                    (max(2, int(c.shape[1] * s)), max(2, int(c.shape[0] * s)))))
            crops.append(c)
        raw, src, tgt = ca.pack_raw_batch(crops)
        return raw, src, tgt, np.asarray([t for _, t in pairs], np.int32)

    eval_sets = {"fix_clean": eval_pack(fix_clean),
                 "fix_aug": eval_pack(fix_aug),
                 "synth": eval_pack(synth_eval)}

    # background batch producer: host augmentation overlaps the device step
    sampler = ca.BatchSampler(fixture, synth, np.random.RandomState(args.seed),
                              p_fixture=args.p_fixture, strength=args.strength)
    q: "queue.Queue" = queue.Queue(maxsize=4)
    stop = threading.Event()

    def produce():
        while not stop.is_set():
            try:
                q.put(sampler.sample(args.batch), timeout=1.0)
            except queue.Full:
                continue

    th = threading.Thread(target=produce, daemon=True)
    th.start()

    def run_eval(tag):
        out = {}
        ev_chunk = args.batch  # reuse the train-step batch shape (compiled once)
        for name, (raw, src, tgt, labels) in eval_sets.items():
            accs = []
            for c in canvases:
                toks, chars, n = 0.0, 0.0, len(labels)
                for i in range(0, n, ev_chunk):
                    sl = slice(i, i + ev_chunk)
                    m = len(labels[sl])
                    pads = ev_chunk - m
                    pt, pc, _ = evals[c](
                        trainable, frozen, base_res,
                        np.pad(raw[sl], ((0, pads), (0, 0), (0, 0))),
                        np.pad(src[sl], ((0, pads), (0, 0)), constant_values=1),
                        np.pad(tgt[sl], ((0, pads), (0, 0)), constant_values=1),
                        np.pad(labels[sl], (0, pads), constant_values=-1))
                    # padded rows can never match label -1; rescale the means
                    toks += float(pt) * ev_chunk
                    chars += float(pc) * ev_chunk
                accs.append((c, toks / n, chars / n))
            out[name] = accs
        msg = " | ".join(
            f"{name} " + " ".join(f"c{c}:tok{pt:.3f}/chr{pc:.3f}"
                                  for c, pt, pc in accs)
            for name, accs in out.items())
        print(f"[eval {tag}] {msg}", flush=True)
        return out

    t0 = time.time()
    losses = []
    try:
        for it in range(args.steps):
            raw, src, tgt, labels = q.get()
            cls = cls_map[labels].astype(np.int32)
            canvas = canvases[it % len(canvases)]
            trainable, opt_state, loss, acc, aux_acc = steps[canvas](
                trainable, opt_state, frozen, base_res,
                (jnp.asarray(raw), jnp.asarray(src), jnp.asarray(tgt),
                 jnp.asarray(cls)))
            losses.append(loss)
            if (it + 1) % 50 == 0:
                ls = [float(x) for x in losses[-50:]]
                print(f"[step {it+1}/{args.steps}] loss {np.mean(ls):.4f} "
                      f"acc {float(acc):.3f} aux_acc {float(aux_acc):.3f} "
                      f"({(time.time()-t0)/(it+1):.2f}s/step)", flush=True)
            if (it + 1) % args.eval_every == 0 or it + 1 == args.steps:
                res = run_eval(it + 1)
                meta = {
                    "rank": args.rank, "vit_rank": args.vit_rank, "lora_scale": 1.0,
                    "steps": it + 1, "canvases": canvases,
                    "eval": {k: v for k, v in res.items()},
                    "n_fixture": len(fixture), "n_synth": len(synth),
                }
                ca.save_asset(args.out, jax.device_get(trainable), meta)
                print(f"[ckpt] saved {args.out} "
                      f"({os.path.getsize(args.out)/1e6:.1f} MB)", flush=True)
    finally:
        stop.set()

    print(f"[done] {args.steps} steps in {(time.time()-t0)/60:.1f} min",
          flush=True)


if __name__ == "__main__":
    main()
