"""Pseudo-embedding extraction tool — the e-IT training-data generator.

Parity target: /root/reference/get_single_embeddings.py:146-267
(per labelme character box: crop -> char-slice preprocess -> ViT+mlp1 ->
perceiver resampler -> cosine VQ -> drop index-0 rows -> mu/sigma denorm ->
save per-image embedding file).

Differences by design: batched on TPU (all character crops of an image run as
one bucketed ViT batch instead of a per-char CUDA loop), output is .npy
(torch-free); --format pt writes torch tensors for reference-stack interop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List

import numpy as np


def extract_embedding_for_image(
    engine, image_path: str, labelme: Dict, *, drop_zero: bool = True, hard_vq: bool = False
) -> np.ndarray:
    """labelme: {"shapes": [{"points": [[x1,y1],[x2,y2]]}...]} with NORMALIZED
    coordinates (get_single_embeddings.py:178-202)."""
    import jax.numpy as jnp

    from callireader_tpu.vision import preprocess

    img = np.asarray(preprocess.open_image(image_path))
    h, w = img.shape[:2]
    crops = []
    for shape in labelme["shapes"]:
        (x1, y1), (x2, y2) = shape["points"]
        x1, y1, x2, y2 = int(x1 * w), int(y1 * h), int(x2 * w), int(y2 * h)
        if x2 <= x1 or y2 <= y1:
            continue
        crops.append(
            preprocess.load_char_content(img[y1:y2, x1:x2], engine.cfg.force_image_size)
        )
    if not crops:
        return np.zeros((0, engine.cfg.llm.hidden_size), np.float32)

    stack = np.stack(crops)
    from callireader_tpu.runtime.engine import CHAR_BUCKETS

    padded, n = preprocess.pad_to_bucket(stack, CHAR_BUCKETS)
    feats = engine._vision_encode_chars(engine.params, jnp.asarray(padded))
    pseudo, indices = engine._resample_vq(engine.params, feats, hard_vq=hard_vq)
    k = engine.cfg.resampler.num_learns
    pseudo = np.asarray(pseudo[: n * k])
    indices = np.asarray(indices[:n]).reshape(-1)
    if drop_zero:
        pseudo = pseudo[indices != 0]
    return pseudo


def main(argv=None):
    parser = argparse.ArgumentParser(description="extract e-IT pseudo embeddings")
    parser.add_argument("--data", type=str, required=True,
                        help="folder of paired <name>.jpg + <name>.json (labelme)")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--drop_zero", action="store_true", default=True)
    parser.add_argument("--hard_vq", action="store_true", default=False)
    parser.add_argument("--format", choices=["npy", "pt"], default="npy")
    parser.add_argument("--preset", type=str, default="callireader-8b")
    parser.add_argument("--checkpoint", type=str, default=os.environ.get("CALLIREADER_CKPT"))
    parser.add_argument("--random-init", action="store_true")
    args = parser.parse_args(argv)

    from callireader_tpu.cli.common import build_engine

    engine = build_engine(
        preset=args.preset, checkpoint_dir=args.checkpoint, random_init_ok=args.random_init
    )
    os.makedirs(args.out, exist_ok=True)

    pairs: List[str] = []
    for f in sorted(os.listdir(args.data)):
        if f.endswith(".json") and os.path.exists(
            os.path.join(args.data, f[: -len(".json")] + ".jpg")
        ):
            pairs.append(f[: -len(".json")])

    for name in pairs:
        labelme = json.load(open(os.path.join(args.data, name + ".json"), encoding="utf-8"))
        emb = extract_embedding_for_image(
            engine, os.path.join(args.data, name + ".jpg"), labelme,
            drop_zero=args.drop_zero, hard_vq=args.hard_vq,
        )
        if args.format == "npy":
            np.save(os.path.join(args.out, name + ".npy"), emb)
        else:
            import torch

            torch.save(torch.tensor(emb), os.path.join(args.out, name + ".pt"))
        print(f"{name}: {emb.shape[0]} pseudo tokens", file=sys.stderr)


if __name__ == "__main__":
    main()
