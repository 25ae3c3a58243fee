"""Unified CLI entry point with the xtuner-style mode table.

Parity target: train/xtuner/entry_point.py:13-15,210-302 — `xtuner MODE ...`
dispatch. Multi-host launch differs by design: instead of auto-spawning
torchrun (:274-293), JAX multi-host init is a runtime call
(parallel/spmd.initialize_multihost) driven by TPU pod metadata, so every
mode below is already multi-host capable when run under a pod launcher.

  python -m callireader_tpu MODE [ARGS...]
"""

from __future__ import annotations

import sys

MODES = (
    "list-cfg", "copy-cfg", "train", "test", "chat", "serve", "inference",
    "evaluate", "convert", "preprocess", "mmbench", "judge", "get-embeddings",
    "check-custom-dataset", "log-dataset",
)

HELP = f"""callireader-tpu command line

    python -m callireader_tpu MODE MODE_ARGS

Where MODE is one of {MODES}

  1. List predefined training configs:
       python -m callireader_tpu list-cfg
  2. Copy a predefined config for editing:
       python -m callireader_tpu copy-cfg e_it ./my_e_it.py
  3. Train (e-IT / SFT / DPO):
       python -m callireader_tpu train --preset callireader-8b --data ...
  4. Convert checkpoints:
       python -m callireader_tpu convert export --checkpoint ... --out ...
       python -m callireader_tpu convert merge --checkpoint ... --out ...
       python -m callireader_tpu convert split SRC DST --max-shard-size 2GB
       python -m callireader_tpu convert consolidate SRC DST --dtype bfloat16
  5. Chat / batch serve / HTTP serve:
       python -m callireader_tpu chat --image x.jpg "读出图中所有文字。"
       python -m callireader_tpu serve --input req.jsonl --output out.jsonl
       python -m callireader_tpu serve --http 8000   # OpenAI-compatible API
  6. Inference / CalliBench / MMBench / judge:
       python -m callireader_tpu inference --image_path x.jpg
       python -m callireader_tpu evaluate --task full_page --parquet ...
       python -m callireader_tpu mmbench --data-path ... 
       python -m callireader_tpu judge --task bilingual --result ...
  7. Preprocess datasets:
       python -m callireader_tpu preprocess arxiv SRC DST --categories cs.CL
       python -m callireader_tpu preprocess refcoco --ann-path ... --save-path ...
  8. Dataset checks:
       python -m callireader_tpu check-custom-dataset ./my_e_it.py --data ...
       python -m callireader_tpu log-dataset --data ...
"""


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(HELP)
        return 0
    mode, rest = argv[0], argv[1:]
    if mode == "list-cfg":
        from callireader_tpu.configs import list_configs

        for name in list_configs():
            print(name)
        return 0
    if mode == "copy-cfg":
        from callireader_tpu.configs import copy_config

        dst = copy_config(rest[0], rest[1] if len(rest) > 1 else ".")
        print(f"copied to {dst}")
        return 0
    if mode in ("train", "check-custom-dataset", "log-dataset"):
        from callireader_tpu.cli import train as m

        if mode == "check-custom-dataset":
            rest = ["--check-data", *rest]
        return m.main(rest)
    if mode in ("test", "evaluate"):
        from callireader_tpu.cli import evaluate as m

        return m.main(rest)
    if mode == "chat":
        from callireader_tpu.cli import chat as m

        return m.main(rest)
    if mode == "serve":
        from callireader_tpu.cli import serve as m

        return m.main(rest)
    if mode == "inference":
        from callireader_tpu.cli import inference as m

        return m.main(rest)
    if mode == "convert":
        from callireader_tpu.cli import convert as m

        return m.main(rest)
    if mode == "preprocess":
        from callireader_tpu.cli import preprocess as m

        return m.main(rest)
    if mode == "judge":
        from callireader_tpu.cli import judge as m

        return m.main(rest)
    if mode == "get-embeddings":
        from callireader_tpu.cli import get_embeddings as m

        return m.main(rest)
    if mode == "mmbench":
        from callireader_tpu.cli import evaluate as m

        return m.main(["--type", "mmbench", *rest])
    print(f"unknown mode {mode!r}\n{HELP}", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
