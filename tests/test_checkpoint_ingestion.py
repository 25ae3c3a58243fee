"""Disk -> engine ingestion dry-run on a COMPLETE fake reference checkpoint.

The environment ships no real weights, so this is the strongest available
proof of the ingestion path: export a random engine pytree to the reference's
exact on-disk layout — sharded safetensors + model.safetensors.index.json plus
every torch side file of /root/reference/config/configu.py:7-13,61-62
(gauss_norm_mu_sigma.pth, orderformer.pth, best.pt in ultralytics state-dict
form, ...) — then boot build_engine(--checkpoint) from that directory and
require the loaded pytree and the generated tokens to match the in-memory
engine exactly.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.runtime.engine import CalliReaderEngine, init_all_params
from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

CFG = callireader_tiny()
TOK_PATH = "callireader_tpu/assets/tokenizer.model"


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    pytest.importorskip("torch")
    from callireader_tpu.train import checkpoint as ckpt

    params = init_all_params(jax.random.PRNGKey(3), CFG, dtype=jnp.bfloat16)
    d = str(tmp_path_factory.mktemp("fake_ref_ckpt"))
    # small shard cap so the tiny export still produces a multi-shard set
    ckpt.export_full_reference_checkpoint(params, CFG, d, max_shard_bytes=1 << 21)
    return d, params


def test_directory_layout(exported):
    d, _ = exported
    index = json.load(open(os.path.join(d, "model.safetensors.index.json")))
    shards = set(index["weight_map"].values())
    assert len(shards) > 1, "shard cap should force a multi-shard export"
    for s in shards:
        assert os.path.exists(os.path.join(d, s))
    # the resampler rides the main safetensors set (deployed layout)
    assert any(k.startswith("resampler.") for k in index["weight_map"])
    assert "normed_emb.weight" in index["weight_map"]
    for side in ("gauss_norm_mu_sigma.pth", "gauss_norm.pth", "orderformer.pth",
                 "best.pt", "callialign.pth", "mlp1.pth", "vit_model.pt",
                 "token_embedding.pth"):
        assert os.path.exists(os.path.join(d, "params", side)), side


def test_roundtrip_pytree_exact(exported):
    from callireader_tpu.runtime.weights import convert_reference_checkpoint

    d, params = exported
    loaded = convert_reference_checkpoint(d, CFG, dtype=jnp.bfloat16)
    # bf16 -> f32 on disk -> bf16 is exact; identity-BN unfold is exact
    for name in ("llm", "vision", "projector", "resampler", "align",
                 "orderformer", "detector"):
        assert name in loaded, name
        ref = jax.tree_util.tree_leaves_with_path(params[name])
        got = dict(jax.tree_util.tree_leaves_with_path(loaded[name]))
        assert len(ref) == len(got)
        for path, leaf in ref:
            np.testing.assert_array_equal(
                np.asarray(got[path], np.float32), np.asarray(leaf, np.float32),
                err_msg=f"{name}{jax.tree_util.keystr(path)}",
            )


def _toy_image(w=60, h=80):
    rng = np.random.RandomState(7)
    arr = np.full((h, w, 3), 240, np.uint8)
    for x, y in [(10, 10), (10, 35), (35, 20)]:
        arr[y:y + 12, x:x + 12] = rng.randint(0, 60, (12, 12, 3))
    return Image.fromarray(arr)


@pytest.mark.slow
def test_disk_boot_token_parity(exported):
    """build_engine(--checkpoint <dir>) produces the same generations as the
    engine holding the original in-memory pytree."""
    from callireader_tpu.cli.common import build_engine

    d, params = exported
    disk = build_engine(preset="callireader-tiny", checkpoint_dir=d,
                        trained_assets=False)
    # side files were auto-discovered: no component fell back to random init
    np.testing.assert_array_equal(
        np.asarray(disk.params["orderformer"]["embed_bias"], np.float32),
        np.asarray(params["orderformer"]["embed_bias"], np.float32))

    tok = InternLM2Tokenizer(TOK_PATH)
    mem = CalliReaderEngine(CFG, params, tok)

    img = _toy_image()
    r_disk, r_mem = (e.chat(img, "这幅书法作品内容是什么？", max_new_tokens=8)
                     for e in (disk, mem))
    assert r_disk == r_mem
    r_disk2, r_mem2 = (e.chat_ocr(img, "读出图中所有文字。", max_new_tokens=8)
                       for e in (disk, mem))
    assert r_disk2 == r_mem2
