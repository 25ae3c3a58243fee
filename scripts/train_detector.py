"""Train the character detector on synthetic calligraphy pages.

  python scripts/train_detector.py --steps 2000 --size 256 --out det_ckpt/

Demonstrates the full slicing-prior training story without the private
CalliTrain data (the reference trains its YOLO externally via ultralytics and
ships only best.pt): trains the JAX YOLOv8-style arch with the BCE+DFL loss
(train/detector_train.py), evaluates detection recall on held-out pages, and
saves an orbax checkpoint loadable by the engine. Prints ONE JSON line.
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
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--max-boxes", type=int, default=12)
    p.add_argument("--out", type=str, default=None)
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

    cfg = DetectorConfig(img_size=args.size, conf_threshold=0.5)
    params = det.init_params(jax.random.PRNGKey(args.seed), cfg)
    tc = dt.DetTrainConfig(total_steps=args.steps, learning_rate=args.lr)
    tx = dt.make_optimizer(tc)
    opt = tx.init(params)
    step = jax.jit(dt.make_train_step(cfg, tc, tx), donate_argnums=(0, 1))

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    loss = None
    for i in range(args.steps):
        imgs, gt, mask = dt.synth_pages(rng, args.batch, args.size, args.max_boxes)
        params, opt, m = step(
            params, opt, jnp.asarray(imgs), jnp.asarray(gt), jnp.asarray(mask)
        )
        if i % 100 == 0 or i == args.steps - 1:
            loss = float(m["loss"])
            print(f"[train_detector] step {i}: loss {loss:.3f} "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr)

    recalls = []
    for s in range(8):
        imgs, gt, mask = dt.synth_pages(
            np.random.RandomState(10_000 + s), 1, args.size, args.max_boxes
        )
        recalls.append(dt.detection_recall(params, cfg, imgs[0], gt[0][mask[0]]))
    recall = float(np.mean(recalls))

    if args.out:
        from callireader_tpu.train.checkpoint import save_params

        save_params(args.out, params)
        print(f"[train_detector] checkpoint saved to {args.out}", file=sys.stderr)

    print(
        json.dumps({
            "metric": "detector_synth_recall@iou0.5",
            "value": round(recall, 3),
            "unit": "recall",
            "per_page": [round(r, 3) for r in recalls],
            "steps": args.steps,
            "final_loss": round(loss, 3),
            "seconds": round(time.time() - t0, 1),
        })
    )


if __name__ == "__main__":
    main()
