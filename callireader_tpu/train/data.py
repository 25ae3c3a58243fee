"""e-IT dataset + collator.

Parity target: train/xtuner/dataset/internvl_dataset.py (InternVL_V1_5_Dataset)
  - JSON list of {"image", "conversations", "embedding"(.pt path)} samples
  - per-sample pre-computed pseudo-embedding loaded from disk (:307-308)
  - dynamic tiling with max 6 tiles + thumbnail (:41)
  - prompt build with IGNORE_INDEX labels on non-assistant tokens (:362-425)
  - broken-sample refetch (:275-285)
and collate_fns/default_collate_fn.py (padding, embeddings passthrough) plus
samplers/length_grouped.py (megabatch length grouping).

TPU-native: the collator emits static-bucketed, right-padded batches with
segment ids (pad = -1) so one XLA program serves many batches; tiles and
pseudo-embeddings are flattened batch-wide in slot order to feed the pure-XLA
splice (align/vq.py:splice_embeds).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from callireader_tpu.core.config import VLMConfig
from callireader_tpu.runtime.conversation import build_chat_prompt
from callireader_tpu.runtime.engine import ALIGNED, IMG_CONTEXT, IMG_END, IMG_START
from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer
from callireader_tpu.train.e_it import IGNORE_INDEX
from callireader_tpu.vision import preprocess

LENGTH_BUCKETS = (256, 512, 1024, 2048, 4096, 8192)


def _load_embedding(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    return t.detach().float().numpy() if hasattr(t, "detach") else np.asarray(t)


class EITDataset:
    """Map-style dataset over a JSON/JSONL annotation file."""

    def __init__(
        self,
        annotation_path: str,
        cfg: VLMConfig,
        tokenizer: InternLM2Tokenizer,
        *,
        image_root: str = "",
        max_tiles: int = 6,
        max_length: int = 8192,
        max_refetch: int = 1000,
    ):
        self.cfg = cfg
        self.tok = tokenizer
        self.image_root = image_root
        self.max_tiles = max_tiles
        self.max_length = max_length
        self.max_refetch = max_refetch
        if annotation_path.endswith(".jsonl"):
            self.items = [json.loads(l) for l in open(annotation_path) if l.strip()]
        else:
            self.items = json.load(open(annotation_path))

    def __len__(self) -> int:
        return len(self.items)

    def _build(self, item: Dict[str, Any]) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        pixel_values = None
        num_tiles = 0
        if item.get("image"):
            path = os.path.join(self.image_root, item["image"])
            pixel_values = preprocess.load_image(
                path, cfg.force_image_size, self.max_tiles, cfg.use_thumbnail
            )
            num_tiles = pixel_values.shape[0]

        pseudo = None
        if item.get("embedding"):
            pseudo = _load_embedding(os.path.join(self.image_root, item["embedding"]))
            pseudo = pseudo.reshape(-1, pseudo.shape[-1])

        convs = item["conversations"]
        input_ids: List[int] = [self.tok.bos_token_id]
        labels: List[int] = [IGNORE_INDEX]
        conv = build_chat_prompt("placeholder")
        system_part = conv.system_template.format(system_message=conv.system_message) + conv.sep
        sys_ids = self.tok.encode(system_part, add_bos=False)
        input_ids += sys_ids
        labels += [IGNORE_INDEX] * len(sys_ids)

        first_human = True
        for turn in convs:
            role = turn.get("from", turn.get("role"))
            value = turn["value"] if "value" in turn else turn["content"]
            if role in ("human", "user"):
                if first_human:
                    if pixel_values is not None and "<image>" not in value:
                        value = "<image>\n" + value
                    if pseudo is not None and ALIGNED not in value:
                        value = value + ALIGNED * pseudo.shape[0]
                    if pixel_values is not None:
                        image_tokens = (
                            IMG_START + IMG_CONTEXT * cfg.num_image_token * num_tiles + IMG_END
                        )
                        value = value.replace("<image>", image_tokens, 1)
                    first_human = False
                text = conv.roles[0] + value + conv.sep + conv.roles[1]
                ids = self.tok.encode(text, add_bos=False)
                input_ids += ids
                labels += [IGNORE_INDEX] * len(ids)
            else:
                text = value + conv.sep
                ids = self.tok.encode(text, add_bos=False)
                input_ids += ids
                labels += ids

        if len(input_ids) > self.max_length:
            raise ValueError(f"sample longer than max_length ({len(input_ids)})")

        out = {
            "input_ids": np.asarray(input_ids, np.int32),
            "labels": np.asarray(labels, np.int32),
        }
        if pixel_values is not None:
            out["pixel_values"] = pixel_values.astype(np.float32)
        if pseudo is not None:
            out["pseudo_embeds"] = pseudo.astype(np.float32)
        # sanity: slots must match payloads (internvl.py:274-282 raises likewise)
        n_ctx = int((out["input_ids"] == self.cfg.img_context_token_id).sum())
        assert n_ctx == num_tiles * cfg.num_image_token, (n_ctx, num_tiles)
        if pseudo is not None:
            n_al = int((out["input_ids"] == self.cfg.aligned_token_id).sum())
            assert n_al == pseudo.shape[0], (n_al, pseudo.shape)
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        for attempt in range(self.max_refetch):
            try:
                return self._build(self.items[(idx + attempt) % len(self.items)])
            except Exception:
                if attempt == self.max_refetch - 1:
                    raise
        raise RuntimeError("unreachable")

    def lengths(self) -> List[int]:
        """Approximate token lengths for length-grouped sampling (cheap: no
        image decode — counts text tokens + image-token budget)."""
        out = []
        for item in self.items:
            n = 64  # system + chrome
            for turn in item["conversations"]:
                n += len(turn.get("value", turn.get("content", ""))) // 2 + 8
            if item.get("image"):
                n += self.cfg.num_image_token * (self.max_tiles + 1)
            out.append(n)
        return out


def length_grouped_indices(
    lengths: Sequence[int], batch_size: int, mega_factor: int = 50, seed: int = 0
) -> List[int]:
    """LengthGroupedSampler: shuffle, then sort within megabatches
    (samplers/length_grouped.py:12-60)."""
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(lengths))
    mega = batch_size * mega_factor
    out: List[int] = []
    for i in range(0, len(idx), mega):
        chunk = sorted(idx[i : i + mega], key=lambda j: -lengths[j])
        out.extend(chunk)
    return out


def collate(
    samples: List[Dict[str, np.ndarray]],
    pad_token_id: int = 2,
    length_buckets: Sequence[int] = LENGTH_BUCKETS,
) -> Dict[str, np.ndarray]:
    """Right-pad to a bucketed length; flatten tiles/pseudo batch-wide."""
    B = len(samples)
    max_len = max(len(s["input_ids"]) for s in samples)
    S = next(b for b in length_buckets if b >= max_len)

    input_ids = np.full((B, S), pad_token_id, np.int32)
    labels = np.full((B, S), IGNORE_INDEX, np.int32)
    segment_ids = np.full((B, S), -1, np.int32)
    positions = np.zeros((B, S), np.int32)
    for i, s in enumerate(samples):
        n = len(s["input_ids"])
        input_ids[i, :n] = s["input_ids"]
        labels[i, :n] = s["labels"]
        segment_ids[i, :n] = 0
        positions[i, :n] = np.arange(n)

    out = {
        "input_ids": input_ids,
        "labels": labels,
        "segment_ids": segment_ids,
        "positions": positions,
    }
    tiles = [s["pixel_values"] for s in samples if "pixel_values" in s]
    if tiles:
        out["pixel_values"] = np.concatenate(tiles, axis=0)
    pseudo = [s["pseudo_embeds"] for s in samples if "pseudo_embeds" in s]
    if pseudo:
        out["pseudo_embeds"] = np.concatenate(pseudo, axis=0)
    return out


def pack_samples(
    samples: List[Dict[str, np.ndarray]],
    target_length: int,
    pad_token_id: int = 2,
) -> Dict[str, np.ndarray]:
    """Varlen packing: concatenate text-only samples into one row with
    per-sample segment ids + reset positions — the TPU-native replacement for
    the reference's cu_seqlens varlen attention (dispatch/internlm2.py:179-306,
    dataset/utils.py Packer)."""
    ids, lbl, seg, pos = [], [], [], []
    for k, s in enumerate(samples):
        n = len(s["input_ids"])
        ids.append(s["input_ids"])
        lbl.append(s["labels"])
        seg.append(np.full(n, k, np.int32))
        pos.append(np.arange(n, dtype=np.int32))
    ids = np.concatenate(ids)[:target_length]
    lbl = np.concatenate(lbl)[:target_length]
    seg = np.concatenate(seg)[:target_length]
    pos = np.concatenate(pos)[:target_length]
    n = len(ids)
    pad = target_length - n
    return {
        "input_ids": np.pad(ids, (0, pad), constant_values=pad_token_id)[None],
        "labels": np.pad(lbl, (0, pad), constant_values=IGNORE_INDEX)[None],
        "segment_ids": np.pad(seg, (0, pad), constant_values=-1)[None],
        "positions": np.pad(pos, (0, pad))[None],
    }


def batches_per_epoch(n_items: int, batch_size: int, *, drop_last: bool = True) -> int:
    """Batches data_loader yields per epoch — same range arithmetic as
    data_loader's loop, so resume fast-forward (cli/train.py) can never
    desync from the actual stream if drop_last/grouping defaults change."""
    return len(range(0, n_items - (batch_size - 1 if drop_last else 0), batch_size))


def data_loader(
    dataset: EITDataset,
    batch_size: int,
    *,
    shuffle_seed: int = 0,
    length_grouped: bool = True,
    drop_last: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    if length_grouped:
        order = length_grouped_indices(dataset.lengths(), batch_size, seed=shuffle_seed)
    else:
        order = list(np.random.RandomState(shuffle_seed).permutation(len(dataset)))
    for i in range(0, len(order) - (batch_size - 1 if drop_last else 0), batch_size):
        batch = [dataset[j] for j in order[i : i + batch_size]]
        yield collate(batch)
