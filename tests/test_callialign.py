"""CalliAlign training machinery (train/callialign_train.py).

CPU tests on the tiny config: base-init replication (the LoRA asset is a
delta over the engine's deterministic seed-0 init, so the reconstruction MUST
be bit-exact), LoRA zero-start + merge/functional equivalence, asset
round-trip, data synthesis determinism. The full-scale training itself runs
on TPU (scripts/train_callialign.py); the committed asset is validated by
test_callialign_fixture.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.core.dtypes import FP32_POLICY
from callireader_tpu.models import resampler
from callireader_tpu.runtime.engine import init_all_params
from callireader_tpu.train import callialign_train as ca

TINY = callireader_tiny()


def test_base_init_replicates_engine_init():
    """base_resampler_params / align_table must reproduce init_all_params'
    subtrees bit-exactly — the asset is a delta over THIS base."""
    full = init_all_params(jax.random.PRNGKey(0), TINY, dtype=jnp.bfloat16)
    base = ca.base_resampler_params(TINY.resampler, jnp.bfloat16)
    fa = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(full["resampler"])}
    fb = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(base)}
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))
    table = ca.align_table(TINY.llm.vocab_size, TINY.llm.hidden_size, jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(full["align"]["normed_emb"]), np.asarray(table)
    )


def test_lora_zero_start_and_functional_merge_equivalence():
    """B=0 init: the LoRA'd forward equals the base forward at step 0; after
    perturbing B, the functional (h@A)@B path must match the merged-matrix
    path (what inference runs)."""
    cfg = TINY.resampler
    base = ca.base_resampler_params(cfg, jnp.float32)
    lora = ca.init_lora(jax.random.PRNGKey(1), base["layers"], rank=4)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, cfg.dim), jnp.float32)

    out_base = resampler.forward(base, cfg, x, policy=FP32_POLICY)
    out_zero = resampler.forward(base, cfg, x, policy=FP32_POLICY, lora=lora)
    np.testing.assert_allclose(np.asarray(out_zero), np.asarray(out_base), atol=1e-6)

    lora = {k: (v if k.endswith("_a") else
                jax.random.normal(jax.random.PRNGKey(3), v.shape) * 0.02)
            for k, v in lora.items()}
    trained = {"small": ca.small_leaves(base), "lora": lora}
    merged = ca.merge_full(base, trained, jnp.float32)
    out_fn = resampler.forward(base, cfg, x, policy=FP32_POLICY, lora=lora)
    out_merged = resampler.forward(merged, cfg, x, policy=FP32_POLICY)
    assert not np.allclose(np.asarray(out_merged), np.asarray(out_base))
    np.testing.assert_allclose(
        np.asarray(out_fn), np.asarray(out_merged), atol=1e-4, rtol=1e-4
    )


def test_asset_roundtrip(tmp_path):
    cfg = TINY.resampler
    base = ca.base_resampler_params(cfg, jnp.bfloat16)
    lora = ca.init_lora(jax.random.PRNGKey(1), base["layers"], rank=4)
    lora = {k: jax.random.normal(jax.random.PRNGKey(5), v.shape) * 0.01
            for k, v in lora.items()}
    trained = {"small": ca.small_leaves(base), "lora": lora}
    path = str(tmp_path / "ca.npz")
    ca.save_asset(path, jax.device_get(trained), {"rank": 4, "lora_scale": 1.0})
    loaded, meta = ca.load_asset(path)
    assert meta["rank"] == 4 and meta["version"] == ca.ASSET_VERSION
    merged_direct = ca.merge_full(base, trained, jnp.float32)
    merged_loaded = ca.merge_full(base, loaded, jnp.float32)
    # f16 storage of the LoRA factors: merged weights match to f16 precision
    for k in ca.LORA_MATS:
        np.testing.assert_allclose(
            np.asarray(merged_loaded["layers"][k]),
            np.asarray(merged_direct["layers"][k]), atol=2e-3, rtol=2e-2,
        )


def test_vit_lora_and_v2_asset_roundtrip(tmp_path):
    """v2 asset (resampler + char-ViT deltas): save -> load -> apply_asset
    must return a char_vision whose forward matches the functional-LoRA
    forward, and the engine must route char encodes through it."""
    from callireader_tpu.models import internvit

    cfg = TINY
    vbase = ca.base_vision_params(cfg, jnp.float32)
    vlora = ca.init_vit_lora(jax.random.PRNGKey(4), vbase["layers"], rank=4)
    vlora = {k: (v if k.endswith("_a") else
                 jax.random.normal(jax.random.PRNGKey(6), v.shape) * 0.02)
             for k, v in vlora.items()}
    rbase = ca.base_resampler_params(cfg.resampler, jnp.float32)
    trained = {
        "small": ca.small_leaves(rbase),
        "lora": ca.init_lora(jax.random.PRNGKey(1), rbase["layers"], rank=4),
        "vit_small": ca.vit_small_leaves(vbase),
        "vit_lora": vlora,
    }
    path = str(tmp_path / "ca2.npz")
    ca.save_asset(path, jax.device_get(trained), {"rank": 4, "lora_scale": 1.0})
    loaded, meta = ca.load_asset(path)
    assert meta["version"] == 2 and "vit_lora" in loaded

    applied = ca.apply_asset(cfg, path, jnp.float32)
    assert set(applied) == {"resampler", "char_vision"}
    x = jax.random.normal(jax.random.PRNGKey(7),
                          (2, cfg.force_image_size, cfg.force_image_size, 3),
                          jnp.float32)
    out_fn = internvit.forward(vbase, cfg.vision, x, use_flash=False,
                               lora=vlora)
    out_merged = internvit.forward(applied["char_vision"], cfg.vision, x,
                                   use_flash=False)
    base_out = internvit.forward(vbase, cfg.vision, x, use_flash=False)
    assert not np.allclose(np.asarray(out_merged), np.asarray(base_out))
    np.testing.assert_allclose(np.asarray(out_fn), np.asarray(out_merged),
                               atol=5e-3, rtol=5e-2)


def test_engine_char_vision_routing():
    """With params['char_vision'] present, char encodes use it and tile
    encodes keep using params['vision']."""
    from callireader_tpu.runtime.engine import CalliReaderEngine, init_all_params
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

    cfg = TINY
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    params = init_all_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    contents = rng.randint(0, 255, (2, 42, 42, 3), np.uint8)  # < 56 canvas

    eng = CalliReaderEngine(cfg, dict(params), tok, gray_chars=True,
                            device_resize_chars=False)
    base_feats = np.asarray(eng.encode_char_contents(contents))
    tile = rng.randint(0, 255,
                       (1, cfg.force_image_size, cfg.force_image_size, 3),
                       np.uint8).astype(np.float32)
    base_tiles = np.asarray(eng.encode_image_tiles(tile))

    cv = internvit_scaled = jax.tree.map(lambda v: v * 1.5, params["vision"])
    eng2 = CalliReaderEngine(cfg, {**params, "char_vision": cv}, tok,
                             gray_chars=True, device_resize_chars=False)
    alt_feats = np.asarray(eng2.encode_char_contents(contents))
    alt_tiles = np.asarray(eng2.encode_image_tiles(tile))
    assert not np.allclose(alt_feats, base_feats)  # char path switched
    np.testing.assert_allclose(alt_tiles, base_tiles, atol=1e-5)  # tile path didn't
    del internvit_scaled


def test_fixture_and_glyph_data():
    """Fixture crops load with single-token labels; glyphs are deterministic
    per char; augmentation keeps crops inside the raw bucket."""
    if not os.path.exists(ca.FIXTURE_JPG):
        pytest.skip("reference fixture not present")
    from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    fx = ca.fixture_samples(tok)
    assert len(fx) == 95  # 96 GT chars minus the one byte-fallback char
    for crop, box, char, tid in fx[:5]:
        assert crop.ndim == 2 and crop.dtype == np.uint8
        assert tok.encode(char, add_bos=False) == [tid]
        y1, x1, y2, x2 = box
        assert 0 <= y1 < y2 <= crop.shape[0] and 0 <= x1 < x2 <= crop.shape[1]

    g1, g2 = ca.glyph_for_char("书"), ca.glyph_for_char("书")
    np.testing.assert_array_equal(g1, g2)
    assert not np.array_equal(g1, ca.glyph_for_char("法"))

    rng = np.random.RandomState(0)
    for crop, box, _c, _t in fx[:3]:
        a = ca.augment_luma(crop, rng, box=box)
        assert a.dtype == np.uint8 and max(a.shape) <= ca.RAW_BUCKET
    raw, src, tgt = ca.pack_raw_batch([ca.augment_luma(fx[0][0], rng, box=fx[0][1])])
    assert raw.shape == (1, ca.RAW_BUCKET, ca.RAW_BUCKET)
    assert (tgt <= 350).all() and (tgt >= 1).all()


def test_train_step_learns_tiny():
    """Two-class sanity: a few steps on the tiny config must drive the
    InfoNCE loss down and reach perfect train accuracy (end-to-end gradient
    path through bicubic canvas -> ViT -> LoRA resampler -> table CE)."""
    import optax

    cfg = TINY
    # label space: token ids 11/22 -> class indices 0/1 (the sub-table CE)
    frozen = ca.build_frozen(cfg, jnp.float32, class_token_ids=[11, 22])
    base = ca.base_resampler_params(cfg.resampler, jnp.float32)
    trainable = {
        "small": ca.small_leaves(base),
        "lora": ca.init_lora(jax.random.PRNGKey(1), base["layers"], rank=4),
        "vit_small": ca.vit_small_leaves(frozen["vision"]),
        "vit_lora": ca.init_vit_lora(jax.random.PRNGKey(2),
                                     frozen["vision"]["layers"], rank=4),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
        "aux": ca.init_aux_head(jax.random.PRNGKey(3), cfg, 2),
    }
    opt = optax.adam(3e-3)
    opt_state = opt.init(trainable)
    step = ca.make_step_fn(cfg, cfg.force_image_size, FP32_POLICY, opt,
                           use_flash=False)

    rng = np.random.RandomState(0)
    crops = [ca.glyph_for_char("书"), ca.glyph_for_char("法")]
    cls = np.asarray([0, 1], np.int32)
    raw, src, tgt = ca.pack_raw_batch(crops, input_size=cfg.force_image_size)
    batch = (jnp.asarray(raw), jnp.asarray(src), jnp.asarray(tgt),
             jnp.asarray(cls))
    first = None
    for i in range(100):
        trainable, opt_state, loss, acc, aux_acc = step(
            trainable, opt_state, frozen, base, batch)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.1
    assert float(acc) == 1.0
    assert float(aux_acc) == 1.0
    del rng
