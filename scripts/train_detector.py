"""Train the character detector on synthetic calligraphy pages.

  python scripts/train_detector.py --steps 3000 --size 640 \
      --out callireader_tpu/assets/detector_640.npz --eval-fixture

Demonstrates the full slicing-prior training story without the private
CalliTrain data (the reference trains its YOLO externally via ultralytics and
ships only best.pt): trains the JAX YOLOv8-style arch with the BCE+DFL loss
(train/detector_train.py) on letterboxed fixture-statistics pages
(brush-stroke glyph columns + seal distractors), evaluates recall on
held-out synthetic pages AND on the real reference fixture page
(/root/reference/examples/0.jpg, 96 labelme GT boxes), and saves a
committable .npz checkpoint loadable by models.detector.load_npz.

TPU-friendly: the page bank is generated once on host (uint8) and uploaded
once; each step gathers its batch on device — no per-step h2d of 39 MB
float pages through the tunnel. Prints ONE JSON line.
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
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--max-boxes", type=int, default=128)
    p.add_argument("--bank", type=int, default=256, help="pre-generated page bank size")
    p.add_argument("--style", choices=["calligraphy", "boxes"], default="calligraphy")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--eval-fixture", action="store_true",
                   help="recall@IoU0.5 against /root/reference/examples/0.jpg GT")
    p.add_argument("--conf", type=float, default=0.4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from callireader_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    from callireader_tpu.core.config import DetectorConfig
    from callireader_tpu.models import detector as det
    from callireader_tpu.train import detector_train as dt

    cfg = DetectorConfig(img_size=args.size, conf_threshold=args.conf)
    params = det.init_params(jax.random.PRNGKey(args.seed), cfg)
    tc = dt.DetTrainConfig(total_steps=args.steps, learning_rate=args.lr)
    tx = dt.make_optimizer(tc)
    opt = tx.init(params)
    base_step = dt.make_train_step(cfg, tc, tx)

    def bank_step(params, opt, imgs, gt, mask, idx):
        return base_step(params, opt, imgs[idx], gt[idx], mask[idx])

    step = jax.jit(bank_step, donate_argnums=(0, 1))

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    if args.style == "calligraphy":
        glyphs = dt.make_glyph_bank(rng, 300)
        imgs, gt, mask = dt.synth_calligraphy_pages(
            rng, args.bank, args.size, args.max_boxes, glyphs
        )
    else:
        imgs, gt, mask = dt.synth_pages(rng, args.bank, args.size, args.max_boxes)
        imgs = (imgs * 255).astype(np.uint8)
    print(f"[train_detector] bank: {args.bank} pages, "
          f"{int(mask.sum())} boxes, {time.time()-t0:.0f}s", file=sys.stderr)
    d_imgs = jnp.asarray(imgs)  # uint8, one h2d
    d_gt, d_mask = jnp.asarray(gt), jnp.asarray(mask)

    t0 = time.time()
    loss = None
    for i in range(args.steps):
        idx = jnp.asarray(rng.randint(0, args.bank, args.batch))
        params, opt, m = step(params, opt, d_imgs, d_gt, d_mask, idx)
        if i % 200 == 0 or i == args.steps - 1:
            loss = float(m["loss"])
            print(f"[train_detector] step {i}: loss {loss:.3f} "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr)

    # held-out synthetic recall (fresh rng stream, full Detector pipeline)
    gen = (dt.synth_calligraphy_pages if args.style == "calligraphy"
           else lambda r, b, s, m: dt.synth_pages(r, b, s, m))
    recalls = []
    for s in range(8):
        hi, hgt, hmask = gen(
            np.random.RandomState(10_000 + s), 1, args.size, args.max_boxes
        )
        page = hi[0] if hi.dtype == np.uint8 else (hi[0] * 255).astype(np.uint8)
        recalls.append(
            dt.detection_recall(params, cfg, page.astype(np.float32) / 255.0,
                                hgt[0][hmask[0]])
        )
    recall = float(np.mean(recalls))

    result = {
        "metric": "detector_synth_recall@iou0.5",
        "value": round(recall, 3),
        "unit": "recall",
        "per_page": [round(r, 3) for r in recalls],
        "style": args.style,
        "steps": args.steps,
        "final_loss": round(loss, 3),
        "seconds": round(time.time() - t0, 1),
    }

    if args.eval_fixture and os.path.exists("/root/reference/examples/0.jpg"):
        fr, fp, npred = dt.fixture_recall(params, cfg)
        result["fixture_recall@iou0.5"] = round(fr, 3)
        result["fixture_precision"] = round(fp, 3)
        result["fixture_n_pred"] = npred
        print(f"[train_detector] FIXTURE recall {fr:.3f} precision {fp:.3f} "
              f"({npred} predictions vs 96 GT)", file=sys.stderr)

    if args.out:
        if args.out.endswith(".npz"):
            params_np = jax.device_get(params)
            det.save_npz(args.out, params_np)
        else:
            from callireader_tpu.train.checkpoint import save_params

            save_params(args.out, params)
        print(f"[train_detector] checkpoint saved to {args.out}", file=sys.stderr)
        result["checkpoint"] = args.out

    print(json.dumps(result))


if __name__ == "__main__":
    main()
