"""Config zoo: named training/eval recipes (the reference ships ~700 mmengine
configs under train/xtuner/configs/; here each recipe is a plain dict the
train CLI consumes, and list-cfg/copy-cfg enumerate this package)."""

from __future__ import annotations

import os
import shutil
from typing import Dict, List

_DIR = os.path.dirname(__file__)


def _file_configs() -> List[str]:
    return sorted(
        f[:-3] for f in os.listdir(_DIR)
        if f.endswith(".py") and not f.startswith("_") and f != "zoo.py"
    )


def list_configs(include_zoo: bool = True) -> List[str]:
    """Hand-written recipes first, then the generated zoo matrix
    (configs/zoo.py — the xtuner configs/ expansion)."""
    names = _file_configs()
    if include_zoo:
        from callireader_tpu.configs import zoo

        names += zoo.list_zoo()
    return names


def get_config(name: str) -> Dict:
    import importlib

    if name in _file_configs():
        mod = importlib.import_module(f"callireader_tpu.configs.{name}")
        return mod.config()
    from callireader_tpu.configs import zoo

    try:
        return zoo.generate(name)
    except ValueError:
        raise ValueError(
            f"unknown config {name!r}; have {_file_configs()} plus the "
            f"generated zoo (python -m callireader_tpu list-cfg)"
        )


def copy_config(name: str, dst: str) -> str:
    if os.path.isdir(dst):
        dst = os.path.join(dst, name + "_copy.py")
    src = os.path.join(_DIR, name + ".py")
    if os.path.exists(src):
        shutil.copyfile(src, dst)
        return dst
    # zoo member: materialize the generated dict as an editable config()
    cfg = get_config(name)  # raises for unknown names
    with open(dst, "w") as f:
        f.write(
            f'"""Materialized zoo recipe {name!r} '
            f"(python -m callireader_tpu copy-cfg).\"\"\"\n\n\n"
            f"def config():\n    return {cfg!r}\n"
        )
    return dst
