"""Detector: forward shapes, NMS, letterbox round trip, BN folding math,
ultralytics converter structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from callireader_tpu.core.config import DetectorConfig
from callireader_tpu.models import detector
from callireader_tpu.runtime import detector_weights as dw

DCFG = DetectorConfig(img_size=64, max_detections=20)


def test_forward_candidate_count():
    params = detector.init_params(jax.random.PRNGKey(0), DCFG)
    import jax.numpy as jnp

    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    boxes, scores = detector.forward(params, DCFG, x)
    n = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    assert boxes.shape == (1, n, 4)
    assert scores.shape == (1, n)


def test_nms_suppresses_overlaps():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = detector.nms_numpy(boxes, scores, iou_thr=0.5, max_det=10)
    assert list(keep) == [0, 2]


def test_letterbox_geometry():
    img = np.zeros((100, 200, 3), np.uint8)
    out, scale, (px, py) = detector.letterbox(img, 64)
    assert out.shape == (64, 64, 3)
    assert abs(scale - 64 / 200) < 1e-9
    assert px == 0 and py == (64 - 32) // 2


def test_detector_callable_end_to_end():
    params = detector.init_params(jax.random.PRNGKey(0), DCFG)
    det = detector.Detector(params, DCFG)
    out = det(np.random.RandomState(0).randint(0, 255, (120, 90, 3), np.uint8))
    assert isinstance(out, list)
    for b in out:
        x1, y1, x2, y2 = b
        assert 0 <= x1 <= 90 and 0 <= y2 <= 120


def test_fold_bn_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    cout, cin, k = 4, 3, 3
    conv_w = rng.randn(cout, cin, k, k).astype(np.float32)
    gamma = rng.rand(cout).astype(np.float32) + 0.5
    beta = rng.randn(cout).astype(np.float32)
    mean = rng.randn(cout).astype(np.float32)
    var = rng.rand(cout).astype(np.float32) + 0.1

    x = torch.tensor(rng.randn(1, cin, 8, 8).astype(np.float32))
    conv = torch.nn.Conv2d(cin, cout, k, padding=1, bias=False)
    conv.weight.data = torch.tensor(conv_w)
    bn = torch.nn.BatchNorm2d(cout, eps=dw.BN_EPS).eval()
    bn.weight.data = torch.tensor(gamma)
    bn.bias.data = torch.tensor(beta)
    bn.running_mean.data = torch.tensor(mean)
    bn.running_var.data = torch.tensor(var)
    with torch.no_grad():
        golden = bn(conv(x)).numpy()

    wf, bf = dw.fold_bn(conv_w, gamma, beta, mean, var)
    conv2 = torch.nn.Conv2d(cin, cout, k, padding=1, bias=True)
    conv2.weight.data = torch.tensor(wf)
    conv2.bias.data = torch.tensor(bf)
    with torch.no_grad():
        ours = conv2(x).numpy()
    np.testing.assert_allclose(ours, golden, atol=1e-5)


def test_ultralytics_converter_structure():
    """Synthetic v8-layout state dict -> pytree matching our init structure."""
    init = detector.init_params(jax.random.PRNGKey(0), DCFG)

    rng = np.random.RandomState(1)
    sd = {}

    def add_conv(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight"] = rng.randn(cout, cin, k, k).astype(np.float32)
        sd[f"{prefix}.bn.weight"] = np.ones(cout, np.float32)
        sd[f"{prefix}.bn.bias"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.bn.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.bn.running_var"] = np.ones(cout, np.float32)

    def add_from(template, prefix):
        kh, kw, cin, cout = template["w"].shape
        add_conv(prefix, cin, cout, kh)

    b = init["backbone"]
    add_from(b["stem"], "0"); add_from(b["down1"], "1")
    for mod_idx, key in (("2", "c2f1"), ("4", "c2f2"), ("6", "c2f3"), ("8", "c2f4")):
        add_from(b[key]["cv1"], f"{mod_idx}.cv1")
        add_from(b[key]["cv2"], f"{mod_idx}.cv2")
        for i, blk in enumerate(b[key]["blocks"]):
            add_from(blk["cv1"], f"{mod_idx}.m.{i}.cv1")
            add_from(blk["cv2"], f"{mod_idx}.m.{i}.cv2")
    add_from(b["down2"], "3"); add_from(b["down3"], "5"); add_from(b["down4"], "7")
    add_from(b["sppf"]["cv1"], "9.cv1"); add_from(b["sppf"]["cv2"], "9.cv2")
    n = init["neck"]
    for mod_idx, key in (("12", "c2f_p4"), ("15", "c2f_p3"), ("18", "c2f_n4"), ("21", "c2f_n5")):
        add_from(n[key]["cv1"], f"{mod_idx}.cv1")
        add_from(n[key]["cv2"], f"{mod_idx}.cv2")
        for i, blk in enumerate(n[key]["blocks"]):
            add_from(blk["cv1"], f"{mod_idx}.m.{i}.cv1")
            add_from(blk["cv2"], f"{mod_idx}.m.{i}.cv2")
    add_from(n["down_p3"], "16"); add_from(n["down_p4"], "19")
    for i, name in enumerate(("p3", "p4", "p5")):
        for br, cv in (("box", "cv2"), ("cls", "cv3")):
            h = init["head"][name][br]
            add_from(h["cv1"], f"22.{cv}.{i}.0")
            add_from(h["cv2"], f"22.{cv}.{i}.1")
            kh, kw, cin, cout = h["out"]["w"].shape
            sd[f"22.{cv}.{i}.2.weight"] = rng.randn(cout, cin, kh, kh).astype(np.float32)
            sd[f"22.{cv}.{i}.2.bias"] = np.zeros(cout, np.float32)

    converted = dw.convert_yolov8(sd)
    # structures must match exactly so the forward runs unchanged
    a = jax.tree.structure(init)
    b_ = jax.tree.structure(jax.tree.map(lambda x: x, converted))
    assert a == b_
    import jax.numpy as jnp

    boxes, scores = detector.forward(
        jax.tree.map(jnp.asarray, converted), DCFG, jnp.zeros((1, 64, 64, 3))
    )
    assert np.isfinite(np.asarray(boxes)).all()


def test_detector_training_loss_decreases():
    """Anchor-free BCE+DFL training (train/detector_train.py) reduces the
    loss quickly on synthetic pages — the arch + assignment + loss wiring
    learns (full convergence/recall is scripts/train_detector.py)."""
    import optax  # noqa: F401

    from callireader_tpu.train import detector_train as dt

    cfg = DetectorConfig(img_size=64)
    params = detector.init_params(jax.random.PRNGKey(0), cfg)
    tc = dt.DetTrainConfig(total_steps=12, warmup=2, learning_rate=2e-3)
    tx = dt.make_optimizer(tc)
    opt = tx.init(params)
    step = jax.jit(dt.make_train_step(cfg, tc, tx))
    rng = np.random.RandomState(0)
    losses = []
    for _ in range(12):
        imgs, gt, mask = dt.synth_pages(rng, 2, 64, max_boxes=4)
        params, opt, m = step(
            params, opt, jnp.asarray(imgs), jnp.asarray(gt), jnp.asarray(mask)
        )
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses


def test_detector_assignment_targets():
    """FCOS-style assignment: anchors inside a GT box with representable ltrb
    are positive; targets are the stride-unit distances; anchors outside any
    box are negative."""
    from callireader_tpu.train import detector_train as dt

    # one 32x32 GT box at (16,16)-(48,48) on a 64px image, stride 8 scale
    gt = jnp.asarray([[[16.0, 16.0, 48.0, 48.0]]])
    mask = jnp.asarray([[True]])
    Hs = Ws = 8  # 64 / 8
    pos, tgt = dt._scale_targets(gt, mask, Hs, Ws, 8, reg_max=16)
    pos = np.asarray(pos)[0].reshape(8, 8)
    tgt = np.asarray(tgt)[0].reshape(8, 8, 4)
    # cells whose centers (4,12,...,60) lie strictly inside [16,48]
    assert pos[3, 3] and pos[4, 4] and pos[2, 2]  # centers 28, 36, 20
    assert not pos[0, 0] and not pos[7, 7]
    # ltrb at cell (3,3): center (28,28) -> l=t=(28-16)/8=1.5, r=b=(48-28)/8=2.5
    np.testing.assert_allclose(tgt[3, 3], [1.5, 1.5, 2.5, 2.5], atol=1e-5)
    # a GT too large for the scale's DFL range is not assigned at stride 8
    big = jnp.asarray([[[0.0, 0.0, 300.0, 300.0]]])
    pos_big, _ = dt._scale_targets(big, mask, 8, 8, 8, reg_max=16)
    assert not np.asarray(pos_big).any()
