"""External-judge CLI over CalliBench result files.

Parity targets: eval/eval_bilingual.py (STScore) and eval/eval_intent.py
(LLM judge) — run AFTER cli/evaluate.py produced bilingual.json / intent.json.

  python -m callireader_tpu.cli.judge --type bilingual --input outputs/exp/bilingual.json
  python -m callireader_tpu.cli.judge --type intent --input outputs/exp/intent.json \
      --save outputs/exp/intent_scores.json     # needs DEEPSEEK_API_KEY
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="judge eval results")
    parser.add_argument("--type", choices=["bilingual", "intent"], required=True)
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--save", type=str, default=None)
    parser.add_argument("--model", type=str, default="deepseek-chat")
    parser.add_argument("--workers", type=int, default=4)
    args = parser.parse_args(argv)

    if args.type == "bilingual":
        from callireader_tpu.evalx.judges import STScoreJudge

        result = STScoreJudge().score_result_file(args.input)
        if result.get("fallback_embedder"):
            print(
                "[judge] WARNING: sentence-transformers unavailable — hash-embedding "
                "fallback; scores are NOT comparable to paper STScores",
                file=sys.stderr,
            )
        out = {"STScore": result["STScore"], "n": len(result["per_sample"])}
    else:
        from callireader_tpu.evalx.judges import LLMJudge

        judge = LLMJudge(model=args.model, num_workers=args.workers)
        out = judge.score_result_file(args.input, save_path=args.save)

    print(json.dumps(out, ensure_ascii=False))
    if args.save and args.type == "bilingual":
        with open(args.save, "w", encoding="utf-8") as f:
            json.dump(out, f, ensure_ascii=False, indent=4)


if __name__ == "__main__":
    main()
