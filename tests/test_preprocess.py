"""Preprocessing: tiling parity, char-slice vs content-canvas equivalence."""

import numpy as np
from PIL import Image

from callireader_tpu.vision import preprocess


def _img(w, h, seed=0):
    return Image.fromarray(
        np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)
    )


def test_dynamic_tile_counts():
    # square -> 1 tile, no thumbnail
    assert len(preprocess.dynamic_tile(_img(448, 448), use_thumbnail=True)) == 1
    # 2:1 -> 2 tiles + thumbnail
    tiles = preprocess.dynamic_tile(_img(896, 448), use_thumbnail=True)
    assert len(tiles) == 3
    # extreme panorama capped at max 12 (+1)
    tiles = preprocess.dynamic_tile(_img(4480, 448), use_thumbnail=True, max_num=12)
    assert len(tiles) <= 13


def test_load_image_shapes():
    out = preprocess.load_image(_img(500, 300), 448)
    assert out.ndim == 4 and out.shape[1:] == (448, 448, 3)
    u8 = preprocess.load_image(_img(500, 300), 448, as_uint8=True)
    assert u8.dtype == np.uint8


def test_char_content_matches_full_slice():
    """The bandwidth-lean content canvas + device pad must equal the full
    448-canvas char slice bit-for-bit (padding is constant white)."""
    for seed, (w, h) in enumerate([(30, 80), (400, 120), (448, 448), (10, 10)]):
        img = _img(w, h, seed)
        full = preprocess.load_char_slice(img, 448, as_uint8=True)[0]  # (448,448,3)
        content = preprocess.load_char_content(img, 448)
        canvas = content.shape[0]
        pad = (448 - canvas) // 2
        rebuilt = np.full((448, 448, 3), 255, np.uint8)
        rebuilt[pad : pad + canvas, pad : pad + canvas] = content
        np.testing.assert_array_equal(rebuilt, full, err_msg=f"size {(w,h)}")


def test_bucketing():
    assert preprocess.bucket_tiles(1) == 1
    assert preprocess.bucket_tiles(6) == 7
    assert preprocess.bucket_tiles(13) == 13
    padded, n = preprocess.pad_to_bucket(np.zeros((6, 4, 4, 3), np.float32))
    assert padded.shape[0] == 7 and n == 6


def test_uint8_normalize_matches_host():
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from callireader_tpu.models.internvit import normalize_uint8

    img = _img(448, 448, 3)
    host = preprocess.to_tensor_normalized(img, 448)
    dev = np.asarray(normalize_uint8(jnp.asarray(preprocess.to_tensor_uint8(img, 448))))
    np.testing.assert_allclose(dev, host, atol=1e-5)
