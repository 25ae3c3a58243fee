"""External-judge evaluations.

Parity targets:
  - eval/eval_bilingual.py:10-31 — "STScore": mean cosine similarity of
    all-MiniLM-L6-v2 sentence embeddings between answers and ground truth.
  - eval/eval_intent.py — DeepSeek-chat LLM judge with a threaded queue,
    robust JSON parsing, atomic writes.

Both depend on assets/services this zero-egress TPU image may not have
(sentence-transformers weights, external API). Each gate cleanly:
``STScoreJudge`` works with any callable embedder (sentence-transformers when
installed, or the hash-embedding fallback for plumbing tests);
``LLMJudge`` accepts any OpenAI-compatible client factory.
"""

from __future__ import annotations

import json
import os
import re
import threading
import queue
from typing import Callable, Dict, List, Optional

import numpy as np


def default_embedder(model_name: str = "all-MiniLM-L6-v2") -> Callable[[List[str]], np.ndarray]:
    try:
        # zero-egress images: fail fast to the fallback instead of HTTP retries
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        from sentence_transformers import SentenceTransformer  # type: ignore

        model = SentenceTransformer(model_name)
        return lambda texts: np.asarray(model.encode(texts))
    except Exception:
        # deterministic bag-of-character hashing fallback (plumbing only — NOT
        # comparable to paper STScores; a warning flags it in results)
        def hash_embed(texts: List[str]) -> np.ndarray:
            out = np.zeros((len(texts), 256), np.float32)
            for i, t in enumerate(texts):
                for ch in t:
                    out[i, hash(ch) % 256] += 1.0
            n = np.linalg.norm(out, axis=1, keepdims=True)
            return out / np.maximum(n, 1e-9)

        hash_embed.is_fallback = True  # type: ignore[attr-defined]
        return hash_embed


class STScoreJudge:
    """Cosine-similarity judge over sentence embeddings (eval_bilingual.py)."""

    def __init__(self, embedder: Optional[Callable] = None):
        self.embed = embedder or default_embedder()

    def score(self, answers: List[str], references: List[str]) -> Dict:
        a = self.embed(answers)
        b = self.embed(references)
        a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-9)
        b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-9)
        sims = (a * b).sum(axis=1)
        return {
            "STScore": float(sims.mean()) if len(sims) else 0.0,
            "per_sample": sims.tolist(),
            "fallback_embedder": bool(getattr(self.embed, "is_fallback", False)),
        }

    def score_result_file(self, result_json_path: str) -> Dict:
        data = json.load(open(result_json_path, encoding="utf-8"))
        answers = [d["answer"] for d in data["detailed"]]
        refs = [d["gt"] for d in data["detailed"]]
        return self.score(answers, refs)


INTENT_JUDGE_PROMPT = (
    "You are an expert in Chinese calligraphy appreciation. Given a calligraphy "
    "work's textual content, a model's analysis of the creation intent, and a "
    "reference analysis, score the model analysis from 0 to 10 for correctness "
    "and depth. Reply with JSON: {{\"score\": <int>}}.\n"
    "Content: {content}\nModel analysis: {answer}\nReference: {reference}\n"
)


def _parse_json_score(text: str) -> Optional[float]:
    """Robust JSON extraction (eval_intent.py parsing behavior)."""
    for m in re.finditer(r"\{[^{}]*\}", text, re.DOTALL):
        try:
            obj = json.loads(m.group(0))
            if "score" in obj:
                return float(obj["score"])
        except Exception:
            continue
    m = re.search(r"(\d+(?:\.\d+)?)", text)
    return float(m.group(1)) if m else None


class LLMJudge:
    """Threaded LLM-judge queue with atomic result writes (eval_intent.py)."""

    def __init__(
        self,
        client_factory: Optional[Callable] = None,
        model: str = "deepseek-chat",
        num_workers: int = 4,
    ):
        self.model = model
        self.num_workers = num_workers
        if client_factory is None:
            def client_factory():  # type: ignore[no-redef]
                from openai import OpenAI  # type: ignore

                return OpenAI(
                    api_key=os.environ["DEEPSEEK_API_KEY"],
                    base_url="https://api.deepseek.com",
                )

        self.client_factory = client_factory

    def _judge_one(self, client, rec: Dict) -> Optional[float]:
        prompt = INTENT_JUDGE_PROMPT.format(
            content=rec.get("calligraphy_content", ""),
            answer=rec.get("answer", ""),
            reference=rec.get("gt", ""),
        )
        for _ in range(3):
            try:
                resp = client.chat.completions.create(
                    model=self.model,
                    messages=[{"role": "user", "content": prompt}],
                    temperature=0.0,
                )
                score = _parse_json_score(resp.choices[0].message.content)
                if score is not None:
                    return score
            except Exception:
                continue
        return None

    def score_result_file(self, result_json_path: str, save_path: Optional[str] = None) -> Dict:
        data = json.load(open(result_json_path, encoding="utf-8"))
        records = data["detailed"]
        q: "queue.Queue" = queue.Queue()
        for i, r in enumerate(records):
            q.put((i, r))
        scores: List[Optional[float]] = [None] * len(records)

        def worker():
            client = self.client_factory()
            while True:
                try:
                    i, rec = q.get_nowait()
                except queue.Empty:
                    return
                scores[i] = self._judge_one(client, rec)
                q.task_done()

        threads = [threading.Thread(target=worker) for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        valid = [s for s in scores if s is not None]
        result = {
            "mean_score": float(np.mean(valid)) if valid else None,
            "judged": len(valid),
            "total": len(records),
            "per_sample": scores,
        }
        if save_path:
            tmp = save_path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(result, f, ensure_ascii=False, indent=4)
            os.replace(tmp, save_path)  # atomic write (eval_intent.py behavior)
        return result
