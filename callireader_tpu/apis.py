"""Simplified programmatic API.

Parity target: train/xtuner/apis/ (function-level wrappers around the CLI
machinery for embedding in other programs).

    from callireader_tpu import apis

    engine = apis.load_engine(preset="callireader-8b", checkpoint="...")
    text = apis.recognize(engine, "page.jpg")
    answer = apis.ask(engine, "page.jpg", "作者是谁？")
    state = apis.finetune(engine, "ann.json", image_root="imgs/", max_iters=100)
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple


def load_engine(
    preset: str = "callireader-8b",
    checkpoint: Optional[str] = None,
    random_init: bool = False,
):
    from callireader_tpu.cli.common import build_engine

    return build_engine(
        preset=preset, checkpoint_dir=checkpoint, random_init_ok=random_init
    )


def recognize(
    engine, image, *, use_p: bool = True, repetition_penalty: float = 1.0,
    max_new_tokens: int = 1024,
) -> str:
    """Full-page recognition (inference.py single_rec semantics)."""
    return engine.chat_ocr(
        image, "这幅书法作品内容是什么？",
        use_p=use_p, repetition_penalty=repetition_penalty,
        max_new_tokens=max_new_tokens,
    )


def ask(
    engine, image, question: str, *,
    history: Optional[List[Tuple[str, str]]] = None,
    use_p: bool = True, max_new_tokens: int = 1024,
):
    return engine.chat_ocr(
        image, question, history=history, return_history=True,
        use_p=use_p, max_new_tokens=max_new_tokens,
    )


def finetune(
    annotation_path: str, *, image_root: str = "", out_dir: str = "./work_dir",
    preset: str = "callireader-8b", checkpoint: Optional[str] = None,
    max_iters: int = 100, batch_size: int = 2, lora_rank: int = 128,
    lora_alpha: float = 256.0, learning_rate: float = 5e-5,
) -> str:
    """Run e-IT fine-tuning programmatically; returns the work dir (contains
    final/ orbax state and export_official/ deployable safetensors)."""
    from callireader_tpu.cli import train as train_cli

    argv = [
        "--data", annotation_path,
        "--image-root", image_root,
        "--out", out_dir,
        "--preset", preset,
        "--batch-size", str(batch_size),
        "--max-iters", str(max_iters),
        "--lora-rank", str(lora_rank),
        "--lora-alpha", str(lora_alpha),
        "--lr", str(learning_rate),
    ]
    argv += ["--checkpoint", checkpoint] if checkpoint else ["--random-init"]
    train_cli.main(argv)
    return out_dir


def evaluate_full_page(engine, parquet_path: str, save_json_path: Optional[str] = None, **kw):
    from callireader_tpu.evalx import callibench

    return callibench.test_full_page(engine, parquet_path, save_json_path, **kw)
