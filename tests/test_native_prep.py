"""Native C++ char preprocessing vs the PIL reference path."""

import numpy as np
import pytest
from PIL import Image

from callireader_tpu.vision import native, preprocess


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("g++ unavailable / native build failed")
    return native.get_lib()


def test_resize_matches_pil(lib):
    rng = np.random.RandomState(0)
    for sh, sw, dh, dw in [(100, 80, 350, 280), (500, 300, 200, 120), (64, 64, 64, 64)]:
        src = rng.randint(0, 255, (sh, sw, 3), np.uint8)
        pil = np.asarray(Image.fromarray(src).resize((dw, dh), Image.BICUBIC))
        ours = native.resize_bicubic(src, dh, dw)
        diff = np.abs(pil.astype(np.int16) - ours.astype(np.int16))
        assert diff.max() <= 2, (sh, sw, dh, dw, diff.max())


def test_char_content_batch_matches_python(lib):
    rng = np.random.RandomState(1)
    crops = [
        rng.randint(0, 255, (h, w, 3), np.uint8)
        for h, w in [(30, 80), (400, 120), (448, 448), (12, 9)]
    ]
    canvas = preprocess.char_content_canvas(448)
    canvas = canvas if (448 - canvas) % 2 == 0 else canvas + 1
    out = native.char_content_batch(crops, canvas, lo=200, hi=350)
    assert out.shape == (4, canvas, canvas, 3)
    for i, crop in enumerate(crops):
        ref = preprocess.load_char_content(crop, 448)
        diff = np.abs(ref.astype(np.int16) - out[i].astype(np.int16))
        # identical geometry (white padding in exactly the same cells)
        np.testing.assert_array_equal(ref == 255, out[i] == 255)
        assert diff.max() <= 3, (i, diff.max())


def test_batch_is_parallel_consistent(lib):
    rng = np.random.RandomState(2)
    crops = [rng.randint(0, 255, (64, 48, 3), np.uint8) for _ in range(16)]
    a = native.char_content_batch(crops, 350, 200, 350, nthreads=1)
    b = native.char_content_batch(crops, 350, 200, 350, nthreads=8)
    np.testing.assert_array_equal(a, b)
