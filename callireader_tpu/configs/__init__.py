"""Config zoo: named training/eval recipes (the reference ships ~700 mmengine
configs under train/xtuner/configs/; here each recipe is a plain dict the
train CLI consumes, and list-cfg/copy-cfg enumerate this package)."""

from __future__ import annotations

import os
import shutil
from typing import Dict, List

_DIR = os.path.dirname(__file__)


def list_configs() -> List[str]:
    return sorted(
        f[:-3] for f in os.listdir(_DIR)
        if f.endswith(".py") and not f.startswith("_")
    )


def get_config(name: str) -> Dict:
    import importlib

    mod = importlib.import_module(f"callireader_tpu.configs.{name}")
    return mod.config()


def copy_config(name: str, dst: str) -> str:
    src = os.path.join(_DIR, name + ".py")
    if not os.path.exists(src):
        raise ValueError(f"unknown config {name!r}; have {list_configs()}")
    if os.path.isdir(dst):
        dst = os.path.join(dst, name + "_copy.py")
    shutil.copyfile(src, dst)
    return dst
