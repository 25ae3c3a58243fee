"""Generic SFT / pretraining data pipeline.

Parity targets in train/xtuner/dataset/:
  - huggingface.py:22-94  process pipeline: origin -> map_fn -> template ->
    tokenize -> pack
  - map_fns/dataset_map_fns/ (alpaca, conversation/openai formats, ...)
  - utils.py Packer :132-191 (cumulative-length varlen packing) — expressed
    here as segment ids + reset positions (TPU-native varlen)
  - intern_repo.py JsonlDataset/PackedDataset (:22-165) — packed_length-sized
    rows for pretraining

Everything emits the same batch dict the e-IT/SFT loss consumes
(train/e_it.py): input_ids, labels, segment_ids, positions.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from callireader_tpu.runtime.conversation import build_chat_prompt
from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer
from callireader_tpu.train.e_it import IGNORE_INDEX

MapFn = Callable[[Dict], Dict]


# ---------------------------------------------------------------------------
# map fns: raw record -> {"conversation": [{"input": ..., "output": ...}]}
# ---------------------------------------------------------------------------


def alpaca_map_fn(example: Dict) -> Dict:
    inp = example.get("input", "")
    instr = example["instruction"]
    text = instr if not inp or inp == "<noinput>" else f"{instr}\n{inp}"
    return {"conversation": [{"input": text, "output": example["output"]}]}


def openai_map_fn(example: Dict) -> Dict:
    """[{role, content}] chat format."""
    conv = []
    pending_user: Optional[str] = None
    for msg in example["messages"]:
        if msg["role"] == "user":
            pending_user = msg["content"]
        elif msg["role"] == "assistant" and pending_user is not None:
            conv.append({"input": pending_user, "output": msg["content"]})
            pending_user = None
    return {"conversation": conv}


def sharegpt_map_fn(example: Dict) -> Dict:
    conv = []
    pending = None
    for turn in example["conversations"]:
        role = turn.get("from", turn.get("role"))
        value = turn.get("value", turn.get("content"))
        if role in ("human", "user"):
            pending = value
        elif pending is not None:
            conv.append({"input": pending, "output": value})
            pending = None
    return {"conversation": conv}


def alpaca_zh_map_fn(example: Dict) -> Dict:
    """Chinese alpaca variant: instruction_zh/input_zh/output_zh fields."""
    inp = example.get("input_zh", "")
    instr = example["instruction_zh"]
    text = instr if not inp or inp == "<noinput>" else f"{instr}\n{inp}"
    return {"conversation": [{"input": text, "output": example["output_zh"]}]}


def code_alpaca_map_fn(example: Dict) -> Dict:
    return {
        "conversation": [
            {"input": example["prompt"], "output": example["completion"]}
        ]
    }


def oasst1_map_fn(example: Dict) -> Dict:
    """### Human: ... ### Assistant: ... single-text transcripts."""
    conv = []
    for chunk in example["text"].split("### Human: ")[1:]:
        if "### Assistant: " not in chunk:
            continue
        q, a = chunk.split("### Assistant: ", 1)
        conv.append({"input": q.strip(), "output": a.strip()})
    return {"conversation": conv}


def wizardlm_map_fn(example: Dict) -> Dict:
    return sharegpt_map_fn(example)


def tiny_codes_map_fn(example: Dict) -> Dict:
    return {
        "conversation": [
            {"input": example["prompt"], "output": example["response"]}
        ]
    }


def sql_map_fn(example: Dict) -> Dict:
    return {
        "conversation": [
            {
                "input": f"{example['context']}\n{example['question']}",
                "output": example["answer"],
            }
        ]
    }


def medical_map_fn(example: Dict) -> Dict:
    instr = example.get("instruction", "")
    inp = example.get("input", "")
    text = f"{instr}\n{inp}".strip()
    return {"conversation": [{"input": text, "output": example["output"]}]}


def crime_kg_assistant_map_fn(example: Dict) -> Dict:
    return {
        "conversation": [
            {"input": example["input"], "output": example["output"]}
        ]
    }


def pretrain_map_fn(example: Dict) -> Dict:
    """Raw-text pretraining rows: everything is target."""
    return {"conversation": [{"input": "", "output": example["text"]}]}


MAP_FNS: Dict[str, MapFn] = {
    "alpaca": alpaca_map_fn,
    "alpaca_zh": alpaca_zh_map_fn,
    "code_alpaca": code_alpaca_map_fn,
    "openai": openai_map_fn,
    "sharegpt": sharegpt_map_fn,
    "oasst1": oasst1_map_fn,
    "wizardlm": wizardlm_map_fn,
    "tiny_codes": tiny_codes_map_fn,
    "sql": sql_map_fn,
    "medical": medical_map_fn,
    "crime_kg_assistant": crime_kg_assistant_map_fn,
    "pretrain": pretrain_map_fn,
}


# ---------------------------------------------------------------------------
# tokenize with template
# ---------------------------------------------------------------------------


def tokenize_conversation(
    conversation: List[Dict], tokenizer: InternLM2Tokenizer, max_length: int = 8192
) -> Dict[str, np.ndarray]:
    conv = build_chat_prompt("x")  # template instance for chrome strings
    input_ids: List[int] = [tokenizer.bos_token_id]
    labels: List[int] = [IGNORE_INDEX]
    system = conv.system_template.format(system_message=conv.system_message) + conv.sep
    ids = tokenizer.encode(system, add_bos=False)
    input_ids += ids
    labels += [IGNORE_INDEX] * len(ids)
    for turn in conversation:
        prompt = conv.roles[0] + turn["input"] + conv.sep + conv.roles[1]
        ids = tokenizer.encode(prompt, add_bos=False)
        input_ids += ids
        labels += [IGNORE_INDEX] * len(ids)
        ids = tokenizer.encode(turn["output"] + conv.sep, add_bos=False)
        input_ids += ids
        labels += ids
    return {
        "input_ids": np.asarray(input_ids[:max_length], np.int32),
        "labels": np.asarray(labels[:max_length], np.int32),
    }


def process_dataset(
    records: Sequence[Dict],
    tokenizer: InternLM2Tokenizer,
    *,
    map_fn: MapFn | str = "sharegpt",
    max_length: int = 8192,
) -> List[Dict[str, np.ndarray]]:
    """origin -> map -> template+tokenize (huggingface.py pipeline stages)."""
    if isinstance(map_fn, str):
        map_fn = MAP_FNS[map_fn]
    out = []
    for rec in records:
        conv = map_fn(rec)["conversation"]
        if conv:
            out.append(tokenize_conversation(conv, tokenizer, max_length))
    return out


# ---------------------------------------------------------------------------
# packed pretraining (intern_repo equivalent)
# ---------------------------------------------------------------------------


class JsonlTextDataset:
    """Line-indexed jsonl of {"content": str} (intern_repo.py JsonlDataset,
    offset-indexed instead of mmap — same random access contract)."""

    def __init__(self, path: str, text_key: str = "content"):
        self.path = path
        self.text_key = text_key
        self.offsets: List[int] = []
        with open(path, "rb") as f:
            off = 0
            for line in f:
                if line.strip():
                    self.offsets.append(off)
                off += len(line)

    def __len__(self) -> int:
        return len(self.offsets)

    def __getitem__(self, idx: int) -> str:
        with open(self.path, "rb") as f:
            f.seek(self.offsets[idx])
            return json.loads(f.readline())[self.text_key]


class PackedTextDataset:
    """Greedy-pack tokenized documents into fixed packed_length rows with
    segment ids + per-doc positions (intern_repo.py PackedDataset; the
    reference's cu_seqlens become segment ids for the flash kernel)."""

    def __init__(
        self,
        dataset: JsonlTextDataset,
        tokenizer: InternLM2Tokenizer,
        packed_length: int = 8192,
        pad_token_id: int = 2,
    ):
        self.packed_length = packed_length
        self.rows: List[Dict[str, np.ndarray]] = []
        ids_buf: List[np.ndarray] = []
        seg_buf: List[np.ndarray] = []
        pos_buf: List[np.ndarray] = []
        used = 0
        seg = 0

        def flush():
            nonlocal used, seg
            if not ids_buf:
                return
            ids = np.concatenate(ids_buf)
            segs = np.concatenate(seg_buf)
            poss = np.concatenate(pos_buf)
            pad = self.packed_length - len(ids)
            row = {
                "input_ids": np.pad(ids, (0, pad), constant_values=pad_token_id)[None],
                "labels": np.pad(
                    np.where(segs >= 0, ids, IGNORE_INDEX), (0, pad),
                    constant_values=IGNORE_INDEX,
                )[None],
                "segment_ids": np.pad(segs, (0, pad), constant_values=-1)[None],
                "positions": np.pad(poss, (0, pad))[None],
            }
            self.rows.append(row)
            ids_buf.clear(); seg_buf.clear(); pos_buf.clear()
            used = 0
            seg = 0

        for i in range(len(dataset)):
            toks = np.asarray(tokenizer.encode(dataset[i]), np.int32)
            start = 0
            while start < len(toks):
                room = self.packed_length - used
                take = toks[start : start + room]
                ids_buf.append(take)
                seg_buf.append(np.full(len(take), seg, np.int32))
                pos_buf.append(np.arange(len(take), dtype=np.int32))
                used += len(take)
                start += len(take)
                seg += 1
                if used == self.packed_length:
                    flush()
        flush()

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self.rows[idx]


def packed_loader(
    dataset: PackedTextDataset, batch_size: int, seed: int = 0
) -> Iterator[Dict[str, np.ndarray]]:
    order = np.random.RandomState(seed).permutation(len(dataset))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        rows = [dataset[j] for j in order[i : i + batch_size]]
        yield {k: np.concatenate([r[k] for r in rows], axis=0) for k in rows[0]}
