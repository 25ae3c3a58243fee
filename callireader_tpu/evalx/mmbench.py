"""MMBench-style multiple-choice VQA evaluation.

Parity target: train/xtuner/tools/mmbench.py (TSV with base64 images +
A/B/C/D options, rank-sharded inference, per-split accuracy). Single-controller
TPU version: the "distributed" part collapses into the engine's batched
generation; results land in JSON (plus the TSV-compatible records).
"""

from __future__ import annotations

import base64
import io
import json
import string
from typing import Dict, List, Optional

OPTION_LETTERS = ["A", "B", "C", "D"]


def load_tsv(path: str) -> List[Dict]:
    """MMBench TSV rows -> dicts with PIL images."""
    import csv

    from PIL import Image

    rows = []
    with open(path, newline="", encoding="utf-8") as f:
        for rec in csv.DictReader(f, delimiter="\t"):
            if rec.get("image"):
                rec["_image"] = Image.open(io.BytesIO(base64.b64decode(rec["image"])))
            rows.append(rec)
    return rows


def build_prompt(rec: Dict) -> str:
    q = rec.get("question", "")
    hint = rec.get("hint") or ""
    opts = []
    for letter in OPTION_LETTERS:
        if rec.get(letter):
            opts.append(f"{letter}. {rec[letter]}")
    parts = []
    if hint and hint != "nan":
        parts.append(hint)
    parts.append(q)
    parts.extend(opts)
    parts.append("Answer with the option's letter from the given choices directly.")
    return "\n".join(parts)


def extract_answer(response: str, rec: Dict) -> Optional[str]:
    """First standalone option letter, else option-text containment."""
    for ch in response:
        if ch in OPTION_LETTERS and rec.get(ch):
            return ch
    for letter in OPTION_LETTERS:
        text = rec.get(letter)
        if text and text != "nan" and text in response:
            return letter
    return None


def evaluate_mmbench(
    engine,
    tsv_path: str,
    save_json_path: Optional[str] = None,
    *,
    batch_size: int = 8,
    max_new_tokens: int = 16,
    limit: Optional[int] = None,
) -> Dict:
    rows = load_tsv(tsv_path)
    if limit:
        rows = rows[:limit]
    detailed = []
    correct = scored = 0
    for i in range(0, len(rows), batch_size):
        chunk = rows[i : i + batch_size]
        images = [r["_image"] for r in chunk]
        prompts = [build_prompt(r) for r in chunk]
        responses = engine.batch_chat(images, prompts, max_new_tokens=max_new_tokens)
        for rec, resp in zip(chunk, responses):
            pred = extract_answer(resp, rec)
            gt = rec.get("answer")
            rec_out = {
                "index": rec.get("index"),
                "question": rec.get("question"),
                "prediction": resp,
                "pred_option": pred,
                "answer": gt,
            }
            if gt:  # dev split has answers; test split doesn't
                scored += 1
                correct += int(pred == gt)
            detailed.append(rec_out)
    result = {
        "detailed": detailed,
        "accuracy": (correct / scored * 100) if scored else None,
        "scored": scored,
        "total": len(rows),
    }
    if save_json_path:
        with open(save_json_path, "w", encoding="utf-8") as f:
            json.dump(result, f, ensure_ascii=False, indent=4)
    return result
