"""Train the compact CalliAlign stack from scratch and emit assets/callialign.npz.

  python scripts/train_callialign.py --steps 6000 --batch 96 \
      --out callireader_tpu/assets/callialign.npz

v3 recipe (docs/CALLIALIGN.md): a COMPACT char tower (6-layer/256-wide ViT at
its own 224 canvas + char projector + compact resampler with a 4096-dim VQ
projection) trained end to end from scratch — the honest analogue of the
reference's separately-shipped, separately-trained char encoder
(params/vit_model.pt, config/configu.py:7 + models/model.py:20-30). The v2
recipe (LoRA over the engine's 24-layer seed-0 random InternViT) is kept in
train/callialign_train.py with its measured failure analysis; outside the
fixed-batch overfit regime it never escaped the random-backbone collapse.

Training data is a FINITE pool of pre-generated augmented views (fixture
crops + procedural glyphs), iterated in epochs — the regime that trained the
detector and OrderFormer. Runs on the real TPU (axon) by default; --cpu for
smoke runs.
"""

from __future__ import annotations

import argparse
import dataclasses
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
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--warmup", type=int, default=300)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--aux-weight", type=float, default=0.5)
    p.add_argument("--fixed-views", type=int, default=48,
                   help="augmented views per fixture class in the FINITE "
                   "training pool (0 = infinite fresh-augmentation stream)")
    p.add_argument("--synth-views", type=int, default=8,
                   help="views per synthetic glyph class in the pool")
    p.add_argument("--no-white-center", dest="white_center",
                   action="store_false", default=True)
    p.add_argument("--p-fixture", type=float, default=0.5,
                   help="fixture share of each streaming batch (stream mode)")
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--synth-chars", type=int, default=0,
                   help="cap on synthetic distractor classes (0 = all ~7k)")
    # held-out generalization protocol (docs/CALLIALIGN.md): exclude K
    # fixture chars' REAL crops from training (they stay trainable classes
    # through procedural glyph renders only — real-crop accuracy on them
    # then measures procedural->calligraphy domain transfer), and/or exclude
    # N synthetic classes entirely (never-seen classes; with this
    # environment's RANDOM VQ table their rows carry no visual signal, so
    # this measures the structural floor, not the model)
    p.add_argument("--holdout-fixture", type=int, default=0,
                   help="fixture classes whose real crops are held out")
    p.add_argument("--holdout-synth", type=int, default=0,
                   help="synthetic classes excluded from training entirely")
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--out", type=str,
                   default="callireader_tpu/assets/callialign.npz")
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
    from callireader_tpu.core.dtypes import FP32_POLICY
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer, DEFAULT_MODEL
    from callireader_tpu.train import callialign_train as ca

    enable_compilation_cache()
    # llm hidden/vocab (the align table + VQ space) are identical 2b/8b
    cfg = dataclasses.replace(
        get_config("callireader-2b"),
        char_vision=ca.CHAR_VISION_V3,
        resampler=ca.CHAR_RESAMPLER_V3,
    )
    canvas = cfg.char_vision.image_size
    # fp32 training (the v2 analysis measured bf16 stalling below its 0.4%
    # resolution; at 14M params the fp32 step is cheap anyway)
    policy = FP32_POLICY
    tok = InternLM2Tokenizer(DEFAULT_MODEL)

    print("[data] building fixture + synthetic class lists", flush=True)
    fixture = ca.fixture_samples(tok)
    # the trained detector's own crops on the page, IoU-matched to GT —
    # closes the train/deploy box-geometry gap (see fixture_detector_samples)
    det_fix = ca.fixture_detector_samples(tok)
    print(f"[data] detector-matched fixture crops: {len(det_fix)}", flush=True)
    vocab = ca.single_char_vocab(tok)
    fix_tids = {tid for _, _, _, tid in fixture}
    synth = [(tid, ch) for tid, ch in vocab if tid not in fix_tids]
    if args.synth_chars:
        synth = synth[: args.synth_chars]

    held_fix, held_det, held_synth = [], [], []
    if args.holdout_synth:
        hr = np.random.RandomState(4243)
        hidx = set(hr.choice(len(synth), size=args.holdout_synth,
                             replace=False).tolist())
        held_synth = [s for i, s in enumerate(synth) if i in hidx]
        synth = [s for i, s in enumerate(synth) if i not in hidx]
    if args.holdout_fixture:
        hr = np.random.RandomState(4242)
        uniq = sorted({tid for _, _, _, tid in fixture})
        held_ids = set(int(t) for t in hr.choice(
            uniq, size=args.holdout_fixture, replace=False))
        held_fix = [s for s in fixture if s[3] in held_ids]
        held_det = [s for s in det_fix if s[3] in held_ids]
        fixture = [s for s in fixture if s[3] not in held_ids]
        det_fix = [s for s in det_fix if s[3] not in held_ids]
        # the held-out chars stay trainable CLASSES through procedural glyph
        # renders only — their real-crop eval measures domain transfer
        id2ch = {tid: ch for _c, _b, ch, tid in held_fix}
        synth = synth + [(tid, id2ch[tid]) for tid in sorted(held_ids)]
        print(f"[data] held out {len(held_ids)} fixture classes "
              f"({len(held_fix)} crops, {len(held_det)} det crops); "
              f"{len(held_synth)} synth classes", flush=True)
    print(f"[data] fixture chars: {len(fixture)}, synthetic classes: "
          f"{len(synth)}", flush=True)
    cls_map = np.full(tok.vocab_size, -1, np.int64)
    for i, (tid, _ch) in enumerate(vocab):
        cls_map[tid] = i

    frozen = jax.device_put(ca.build_v3_frozen(
        cfg, class_token_ids=[tid for tid, _ch in vocab]))

    key = jax.random.PRNGKey(args.seed + 1)
    trainable = {
        "stack": ca.init_v3_params(key, cfg, white_center=args.white_center),
        "logit_scale": jnp.asarray(np.log(1.0 / 0.07), jnp.float32),
        "aux": ca.init_aux_head(jax.random.PRNGKey(args.seed + 2), cfg,
                                len(vocab), dim=cfg.resampler.dim),
    }
    n_par = sum(int(np.prod(x.shape)) for x in
                jax.tree.leaves(trainable["stack"]))
    print(f"[model] compact stack: {n_par/1e6:.1f}M params "
          f"(canvas {canvas})", flush=True)

    warmup = min(args.warmup, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup, max(args.steps, warmup + 1), args.lr * 0.05)
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=args.weight_decay),
    )
    opt_state = optimizer.init(trainable)

    step_fn = ca.make_v3_step_fn(cfg, policy, optimizer,
                                 aux_weight=args.aux_weight)
    eval_fn = ca.make_v3_eval_fn(cfg, policy)

    def pack(crops):
        return ca.pack_raw_batch(crops, input_size=canvas)

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
        raw, src, tgt = pack(crops)
        return raw, src, tgt, np.asarray([t for _, t in pairs], np.int32)

    eval_sets = {"fix_clean": eval_pack(fix_clean),
                 "fix_aug": eval_pack(fix_aug),
                 "synth": eval_pack(synth_eval)}
    if det_fix:
        # clean detector crops at the EXACT deployed box (no margin/jitter)
        eval_sets["fix_det"] = eval_pack(
            [(c[b[0]:b[2], b[1]:b[3]], t) for c, b, _ch, t in det_fix])
    if held_fix:
        # real calligraphy crops of classes trained ONLY on procedural glyphs
        eval_sets["fix_holdout"] = eval_pack(
            [(c[b[0]:b[2], b[1]:b[3]], t) for c, b, _ch, t in held_fix])
    if held_det:
        eval_sets["fix_det_holdout"] = eval_pack(
            [(c[b[0]:b[2], b[1]:b[3]], t) for c, b, _ch, t in held_det])
    if held_synth:
        hv = held_synth[:: max(1, len(held_synth) // 128)][:128]
        eval_sets["synth_holdout"] = eval_pack(
            [(sampler_ev._glyph(ch), t) for t, ch in hv])

    sampler = ca.BatchSampler(fixture, synth, np.random.RandomState(args.seed),
                              p_fixture=args.p_fixture, strength=args.strength)

    pool = None
    if args.fixed_views:
        # FINITE dataset, iterated in epochs — the regime that trained the
        # detector and OrderFormer (streaming fresh augmentations gave the
        # v2 recipe nothing stable to bootstrap on; a finite pool lets
        # memorization seed clustering)
        pr = np.random.RandomState(args.seed + 7)
        crops, labs = [], []
        for c, b, _ch, tid in fixture:
            for _ in range(args.fixed_views):
                crops.append(ca.augment_luma(c, pr, box=b,
                                             strength=args.strength))
                labs.append(tid)
        for c, b, _ch, tid in det_fix:
            for _ in range(args.fixed_views):
                crops.append(ca.augment_luma(c, pr, box=b,
                                             strength=args.strength))
                labs.append(tid)
        for tid, ch in synth:
            g = sampler._glyph(ch)
            for _ in range(args.synth_views):
                crops.append(ca.augment_luma(g, pr, strength=args.strength))
                labs.append(tid)
        pool = (crops, np.asarray(labs, np.int64))
        print(f"[data] fixed pool: {len(crops)} views "
              f"({args.fixed_views}/fixture class, "
              f"{args.synth_views}/synth class)", flush=True)

    # background batch producer: host packing overlaps the device step
    q: "queue.Queue" = queue.Queue(maxsize=4)
    stop = threading.Event()

    def produce():
        rng = np.random.RandomState(args.seed + 13)
        while not stop.is_set():
            try:
                if pool is not None:
                    idx = rng.randint(len(pool[0]), size=args.batch)
                    raw, src, tgt = pack([pool[0][i] for i in idx])
                    q.put((raw, src, tgt, pool[1][idx]), timeout=1.0)
                else:
                    raw, src, tgt, labels = sampler.sample(args.batch)
                    q.put((raw, src, tgt, labels), timeout=1.0)
            except queue.Full:
                continue

    th = threading.Thread(target=produce, daemon=True)
    th.start()

    def run_eval(tag):
        out = {}
        ev_chunk = args.batch
        for name, (raw, src, tgt, labels) in eval_sets.items():
            toks, chars, n = 0.0, 0.0, len(labels)
            for i in range(0, n, ev_chunk):
                sl = slice(i, i + ev_chunk)
                m = len(labels[sl])
                pads = ev_chunk - m
                pt, pc, _ = eval_fn(
                    trainable["stack"], frozen["table_n"],
                    np.pad(raw[sl], ((0, pads), (0, 0), (0, 0))),
                    np.pad(src[sl], ((0, pads), (0, 0)), constant_values=1),
                    np.pad(tgt[sl], ((0, pads), (0, 0)), constant_values=1),
                    np.pad(labels[sl], (0, pads), constant_values=-1))
                # padded rows can never match label -1; rescale the means
                toks += float(pt) * ev_chunk
                chars += float(pc) * ev_chunk
            out[name] = [(canvas, toks / n, chars / n)]
        msg = " | ".join(
            f"{name} " + " ".join(f"c{c}:tok{pt:.3f}/chr{pc:.3f}"
                                  for c, pt, pc in accs)
            for name, accs in out.items())
        print(f"[eval {tag}] {msg}", flush=True)
        return out

    def save(tag, res):
        meta = {
            "char_vision": dataclasses.asdict(cfg.char_vision),
            "char_resampler": dataclasses.asdict(cfg.resampler),
            "steps": tag, "canvases": [canvas],
            "eval": res,
            "n_fixture": len(fixture), "n_synth": len(synth),
            "fixed_views": args.fixed_views, "lr": args.lr,
            "holdout_fixture": args.holdout_fixture,
            "holdout_synth": args.holdout_synth,
        }
        ca.save_v3_asset(args.out, jax.device_get(trainable["stack"]), meta)
        print(f"[ckpt] saved {args.out} "
              f"({os.path.getsize(args.out)/1e6:.1f} MB)", flush=True)

    t0 = time.time()
    losses = []
    try:
        for it in range(args.steps):
            raw, src, tgt, labels = q.get()
            cls = cls_map[labels].astype(np.int32)
            trainable, opt_state, loss, acc, aux_acc = step_fn(
                trainable, opt_state, frozen,
                (jnp.asarray(raw), jnp.asarray(src), jnp.asarray(tgt),
                 jnp.asarray(cls)))
            losses.append(loss)
            if (it + 1) % 50 == 0:
                ls = [float(x) for x in losses[-50:]]
                print(f"[step {it+1}/{args.steps}] loss {np.mean(ls):.4f} "
                      f"acc {float(acc):.3f} aux_acc {float(aux_acc):.3f} "
                      f"({(time.time()-t0)/(it+1):.2f}s/step)", flush=True)
            if (it + 1) % args.eval_every == 0 or it + 1 == args.steps:
                save(it + 1, run_eval(it + 1))
    finally:
        stop.set()

    print(f"[done] {args.steps} steps in {(time.time()-t0)/60:.1f} min",
          flush=True)


if __name__ == "__main__":
    main()
