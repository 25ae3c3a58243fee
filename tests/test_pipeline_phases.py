"""Phased box-stage schedule parity.

bench.py and the CalliBench batched driver run detection FOUR batches ahead
of its decode via engine.detect_dispatch / detect_fetch / columns_stage /
order_stage (only the readback phases occupy the device-free gap). These
tests pin that the phases — including when interleaved in the exact
steady-state order the pipeline uses, with stale handles outstanding across
other phases — produce byte-identical results to the unphased
batch_sort_boxes, with a REAL (random-weight) Detector so the dispatch/fetch
path is the one that runs on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.core.config import callireader_tiny
from callireader_tpu.models.detector import Detector
from callireader_tpu.runtime.engine import CalliReaderEngine, init_all_params
from callireader_tpu.runtime.tokenizer import InternLM2Tokenizer

CFG = callireader_tiny()


@pytest.fixture(scope="module")
def engine():
    params = init_all_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    tok = InternLM2Tokenizer("callireader_tpu/assets/tokenizer.model")
    eng = CalliReaderEngine(CFG, params, tok, use_flash=False)
    # low-conf operating point so the random-weight detector emits boxes
    import dataclasses

    det_cfg = dataclasses.replace(CFG.detector, conf_threshold=1e-4,
                                  max_detections=40)
    eng.detector = Detector(eng.params["detector"], det_cfg)
    return eng


def _pages(seed, n=2):
    rng = np.random.RandomState(seed)
    return [rng.randint(60, 255, (96, 72, 3), np.uint8) for _ in range(n)]


def test_phases_compose_to_batch_sort_boxes(engine):
    imgs = _pages(0)
    direct = engine.batch_sort_boxes(imgs)
    dets = engine.detect_fetch(imgs, engine.detect_dispatch(imgs))
    phased = engine.order_stage(engine.columns_stage(imgs, dets))
    assert phased == direct
    assert any(len(p) > 0 for p in direct)  # non-degenerate


def test_order_dispatch_fetch_split_parity(engine):
    """order_dispatch/order_fetch (async OrderFormer forward queued behind
    other work, readback later) == order_stage, including with unrelated
    device programs and another chunk's phases between dispatch and fetch."""
    imgs_a, imgs_b = _pages(7), _pages(8)
    dets_a = engine.detect_fetch(imgs_a, engine.detect_dispatch(imgs_a))
    dets_b = engine.detect_fetch(imgs_b, engine.detect_dispatch(imgs_b))
    want_a = engine.order_stage(engine.columns_stage(imgs_a, dets_a))
    want_b = engine.order_stage(engine.columns_stage(imgs_b, dets_b))

    od_a = engine.order_dispatch(engine.columns_stage(imgs_a, dets_a))
    # interleave: another chunk's full box stage + an unrelated program
    od_b = engine.order_dispatch(engine.columns_stage(imgs_b, dets_b))
    _ = np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert engine.order_fetch(od_b) == want_b
    assert engine.order_fetch(od_a) == want_a
    assert any(len(p) > 0 for p in want_a)


def test_pipeline_interleaving_with_stale_handles(engine):
    """Drive three chunks in the bench's steady-state phase order: a chunk's
    handle stays outstanding while other chunks' fetch/columns/order phases
    and unrelated device programs run in between."""
    chunks = [_pages(s) for s in (1, 2, 3)]
    want = [engine.batch_sort_boxes(c) for c in chunks]

    # prime: ordered[0], dets[1], handle[2]  (bench.py priming order)
    dets0 = engine.detect_fetch(chunks[0], engine.detect_dispatch(chunks[0]))
    ordered = {0: engine.order_stage(engine.columns_stage(chunks[0], dets0))}
    dets = {1: engine.detect_fetch(chunks[1], engine.detect_dispatch(chunks[1]))}
    handle = {2: engine.detect_dispatch(chunks[2])}

    got = {}
    for i in range(3):
        got[i] = ordered.pop(i)
        if i + 1 < 3:
            inter = engine.columns_stage(chunks[i + 1], dets.pop(i + 1))
            # an unrelated device program runs between dispatch and fetch
            _ = np.asarray(jnp.ones((4, 4)) @ jnp.ones((4, 4)))
            ordered[i + 1] = engine.order_stage(inter)
        if i + 2 < 3:
            dets[i + 2] = engine.detect_fetch(chunks[i + 2], handle.pop(i + 2))

    for i in range(3):
        assert got[i] == want[i], f"chunk {i} diverged"


def test_saturated_page_deferred_to_order_stage(engine):
    """>250-box pages are deferred by columns_stage (pure host) and resolved
    by the serial fallback inside order_stage (device-free gap), matching
    batch_sort_boxes."""
    imgs = _pages(5)
    real = engine.detector

    class Saturating:
        def __call__(self, img):
            return real(img)

        def batch(self, images):
            outs = real.batch(images)
            rng = np.random.RandomState(0)
            # first page: 251 spread-out boxes saturate the batch path
            outs[0] = [
                [float(x), float(y), float(x + 6), float(y + 6)]
                for x, y in rng.randint(0, 60, (251, 2))
            ]
            return outs

    try:
        engine.detector = Saturating()
        dets = engine.detect_fetch(imgs, engine.detect_dispatch(imgs))
        inter = engine.columns_stage(imgs, dets)
        assert [i for i, _ in inter["saturated"]] == [0]
        assert inter["results"][0] is None  # unresolved until order_stage
        phased = engine.order_stage(inter)
        assert phased == engine.batch_sort_boxes(imgs)
        assert phased[0] is not None
    finally:
        engine.detector = real


def test_stub_detector_phases(engine):
    """Callables without dispatch (test/bench stubs) still work through the
    phased entry points via the eager fallback."""
    imgs = _pages(4)
    real = engine.detector
    try:
        engine.detector = lambda img: [[4.0, 4.0, 20.0, 20.0]]
        handle = engine.detect_dispatch(imgs)
        assert handle[0] == "dets"
        dets = engine.detect_fetch(imgs, handle)
        out = engine.order_stage(engine.columns_stage(imgs, dets))
        assert out == engine.batch_sort_boxes(imgs)
    finally:
        engine.detector = real
