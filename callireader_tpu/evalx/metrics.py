"""CalliBench metrics.

Parity targets:
  - char-set precision/recall/F1:  utils/utils.py:516-542 (greedy one-to-one
    matching of predicted chars against ground-truth chars)
  - NED: Levenshtein distance / max length (evaluate.py:149-152)
  - punctuation strippers: evaluate.py:44-53
  - choice accuracy rules: evaluate.py:80-125 (multi-letter rejection,
    correct-text containment overrides)
  - trad->simp conversion: evaluate.py:41 via OpenCC when installed; offline
    fallback = bundled char-level table (assets/t2s.txt, ~2.1k pairs).
"""

from __future__ import annotations

import re
from typing import Callable, List, Sequence, Tuple

_CHINESE_PUNCT = re.compile(
    r"[。？！、，「」『』‘’“”"
    r"–—…【】《》：；]"
)
_ENGLISH_PUNCT = re.compile(r"[,\.!?:\'\";\(\)\[\]\{\}\-\n\*1234567890]")


def remove_chinese_punctuation(text: str) -> str:
    return _CHINESE_PUNCT.sub("", text)


def remove_english_punctuation(text: str) -> str:
    return _ENGLISH_PUNCT.sub("", text)


def get_clean_string(text: str) -> str:
    return remove_chinese_punctuation(remove_english_punctuation(text))


_T2S_TABLE = None


def _load_t2s_table() -> dict:
    """Bundled ~2.1k-char traditional->simplified map (assets/t2s.txt, one
    `<trad><simp>` pair per line). Char-level: deliberately conservative —
    context-dependent characters whose char-level conversion would corrupt
    classical text (著/乾/藉/祇) are left unmapped."""
    global _T2S_TABLE
    if _T2S_TABLE is None:
        import os

        path = os.path.join(os.path.dirname(__file__), "..", "assets", "t2s.txt")
        table = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if len(line) == 2:
                    table[ord(line[0])] = line[1]
        _T2S_TABLE = table
    return _T2S_TABLE


_T2S_PHRASES = None


def _load_t2s_phrases():
    """Curated phrase table (assets/t2s_phrases.txt) for the trad chars whose
    simplified form is CONTEXT-DEPENDENT (乾/著/藉/祇/瀋/覆/徵...) — the
    char table deliberately leaves those unmapped. `trad<space>simp` per
    line; identity rows (狼藉 狼藉) protect phrases from partial matches."""
    global _T2S_PHRASES
    if _T2S_PHRASES is None:
        import os

        path = os.path.join(os.path.dirname(__file__), "..", "assets",
                            "t2s_phrases.txt")
        table = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) == 2:
                    table[parts[0]] = parts[1]
        maxlen = max((len(k) for k in table), default=1)
        _T2S_PHRASES = (table, maxlen)
    return _T2S_PHRASES


def _t2s_fallback(text: str) -> str:
    """Longest-match phrase conversion over the bundled tables — the offline
    stand-in for OpenCC's phrase-aware t2s (its TSPhrases pass). Scans left
    to right: longest phrase hit first, then the char table."""
    phrases, maxlen = _load_t2s_phrases()
    chars = _load_t2s_table()
    out = []
    i, n = 0, len(text)
    while i < n:
        hit = None
        for ln in range(min(maxlen, n - i), 1, -1):
            cand = phrases.get(text[i : i + ln])
            if cand is not None:
                hit = (cand, ln)
                break
        if hit is not None:
            out.append(hit[0])
            i += hit[1]
        else:
            out.append(chars.get(ord(text[i]), text[i]))
            i += 1
    return "".join(out)


def t2s(text: str) -> str:
    """Traditional->simplified: OpenCC (phrase-aware) when present, the
    bundled longest-match phrase + char tables otherwise (evaluate.py:41
    parity — offline CalliBench F1/NED on traditional-script outputs stays
    meaningful, including the phrase-dependent characters)."""
    try:
        import opencc  # type: ignore

        return opencc.OpenCC("t2s").convert(text)
    except Exception:
        return _t2s_fallback(text)


def levenshtein(a: Sequence, b: Sequence) -> int:
    try:
        import Levenshtein  # type: ignore

        if isinstance(a, list):
            return Levenshtein.distance(a, b)
        return Levenshtein.distance(a, b)
    except Exception:
        # classic DP fallback
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]


def calculate_metrics(
    y_pred: Sequence, y_gt: Sequence, cmp: Callable = lambda a, b: a == b
) -> Tuple[float, float, float]:
    """Greedy set matching P/R/F1 (utils.py:516-542)."""
    matched = set()
    TP = FP = 0
    for p in y_pred:
        hit = False
        for i, g in enumerate(y_gt):
            if cmp(p, g) and i not in matched:
                matched.add(i)
                TP += 1
                hit = True
                break
        if not hit:
            FP += 1
    FN = len(y_gt) - TP
    precision = TP / (TP + FP) if TP + FP > 0 else 0.0
    recall = TP / (TP + FN) if TP + FN > 0 else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall > 0 else 0.0
    return precision, recall, f1


def ned(pred: Sequence, gt: Sequence) -> float:
    max_len = max(len(pred), len(gt))
    if max_len == 0:
        return 0.0
    return levenshtein(list(pred), list(gt)) / max_len


def mmlu_accuracy(predictions: List[str], answers: List[str]) -> float:
    """First-A-D-letter accuracy (xtuner evaluation/metrics/mmlu_metric.py)."""
    assert len(predictions) == len(answers)
    if not predictions:
        return 0.0
    correct = 0
    for pred, ans in zip(predictions, answers):
        first = next((c for c in pred if c in "ABCD"), None)
        correct += int(first == ans)
    return correct / len(predictions) * 100


def reward_accuracy(chosen_rewards: Sequence[float], rejected_rewards: Sequence[float]) -> float:
    """Pairwise ranking accuracy (xtuner evaluation/metrics/reward_metric.py)."""
    assert len(chosen_rewards) == len(rejected_rewards)
    if not chosen_rewards:
        return 0.0
    wins = sum(c > r for c, r in zip(chosen_rewards, rejected_rewards))
    return wins / len(chosen_rewards) * 100


def evaluate_choice_accuracy(
    responses: List[str], correct_answers: List[Tuple[str, str, str, str]]
) -> float:
    """(correct_letter, correct_text, wrong_text_0, wrong_text_1) per sample
    (evaluate.py:80-125)."""
    assert len(responses) == len(correct_answers)
    correct = 0
    for response, ans in zip(responses, correct_answers):
        has = [l in response for l in "ABC"]
        contain_gt = ans[1] in response
        contain_w0 = ans[2] in response
        contain_w1 = ans[3] in response
        if sum(has) > 1:
            ok = False
        else:
            chosen = "A" if has[0] else "B" if has[1] else "C" if has[2] else None
            ok = chosen == ans[0]
        if contain_gt:
            ok = not (contain_w0 or contain_w1)
        correct += int(ok)
    return correct / len(responses) * 100 if responses else 0.0
