"""Golden-fixture tests on the reference's only real fixture
(/root/reference/examples/0.jpg + 0.json: a 788x2000 calligraphy page with 96
labelme char boxes carrying ground-truth column (`col`) and in-column order
(`turn`)).

These freeze the order-sensitive host heuristics (SURVEY §7f): merge_boxes is
cross-checked for EXACT equality against the reference implementation executed
directly (extracted via ast from /root/reference/utils/utils.py to avoid its
torchvision import), and the column clustering / reading-order assignment are
checked against the fixture's human annotations. Any behavioral drift of
vision/boxes.py vs utils/utils.py:273-331 or modeling_internvl_chat.py:395-553
fails here.
"""

import ast
import collections
import copy
import json
import os

import numpy as np
import pytest

from callireader_tpu.vision import boxes as boxes_mod

FIXTURE_JSON = "/root/reference/examples/0.json"
FIXTURE_JPG = "/root/reference/examples/0.jpg"
REF_UTILS = "/root/reference/utils/utils.py"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(FIXTURE_JSON) and os.path.exists(REF_UTILS)),
    reason="reference fixture not available",
)

_REF_FN_NAMES = (
    "calculate_iou",
    "intersection_length",
    "union_length",
    "distance_or_intersection",
    "union",
    "merge_boxes",
)


def _reference_fns():
    """Extract the pure box functions from the reference source without
    importing the module (it imports torchvision at top level)."""
    tree = ast.parse(open(REF_UTILS).read())
    ns = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in _REF_FN_NAMES:
            mod = ast.Module(body=[node], type_ignores=[])
            exec(compile(mod, REF_UTILS, "exec"), ns)
    assert set(_REF_FN_NAMES) <= set(ns), "reference source drifted"
    return ns


def _fixture():
    d = json.load(open(FIXTURE_JSON))
    W, H = d["imageWidth"], d["imageHeight"]
    boxes = [
        [[s["points"][0][0] * W, s["points"][0][1] * H],
         [s["points"][1][0] * W, s["points"][1][1] * H]]
        for s in d["shapes"]
    ]
    return d, W, H, boxes


def _flat(b):
    return [b[0][0], b[0][1], b[1][0], b[1][1]]


def test_merge_boxes_exact_parity_with_reference():
    ref = _reference_fns()
    _, _, _, boxes = _fixture()
    variants = [boxes, boxes[:50], boxes[20:80]]
    rng = np.random.RandomState(0)
    shuffled = list(boxes)
    rng.shuffle(shuffled)
    variants.append(shuffled)
    for var in variants:
        ours = boxes_mod.merge_boxes(copy.deepcopy(var))
        theirs = ref["merge_boxes"](copy.deepcopy(var))
        assert ours == theirs, f"merge_boxes drifted on {len(var)} boxes"
    # the full page merges into the fixture's six annotated columns
    assert len(boxes_mod.merge_boxes(copy.deepcopy(boxes))) == 6


def test_calculate_iou_parity_with_reference():
    ref = _reference_fns()
    _, _, _, boxes = _fixture()
    flats = [_flat(b) for b in boxes[:20]]
    for i in range(len(flats)):
        for j in range(len(flats)):
            for mini in (False, True):
                ours = boxes_mod.calculate_iou(flats[i], flats[j], mini=mini)
                theirs = ref["calculate_iou"](flats[i], flats[j], mini=mini)
                assert ours == pytest.approx(theirs, abs=1e-12)


def test_column_clustering_matches_ground_truth():
    """char2col_with_kmeans must partition the 96 chars exactly as the
    human-annotated `col` labels do (bijection GT col <-> predicted column)."""
    d, W, H, boxes = _fixture()
    data = boxes_mod.char2col_with_kmeans(copy.deepcopy(boxes), W, H)
    cols = [s["points"] for s in data["shapes"]]
    assert len(cols) == 6

    gt2pred = collections.defaultdict(set)
    for s in d["shapes"]:
        fb = [s["points"][0][0] * W, s["points"][0][1] * H,
              s["points"][1][0] * W, s["points"][1][1] * H]
        best, bi = -1.0, None
        for ci, c in enumerate(cols):
            v = boxes_mod.calculate_iou(_flat(c), fb, mini=True)
            if v > best:
                best, bi = v, ci
        assert best >= 0.8, f"char {s['label']} not contained in any column"
        gt2pred[s["col"]].add(bi)
    # every GT column maps to exactly one predicted column, and no two GT
    # columns share a predicted column
    assert all(len(v) == 1 for v in gt2pred.values()), dict(gt2pred)
    pred_ids = [next(iter(v)) for v in gt2pred.values()]
    assert len(set(pred_ids)) == 6


def test_reading_order_assignment_reproduces_annotation():
    """Per-column char assignment (mini-IoU >= 0.8, engine.sort_boxes logic)
    + y-sort must reproduce the fixture's (col, turn) reading order exactly —
    i.e. the six annotated text lines."""
    d, W, H, boxes = _fixture()
    data = boxes_mod.char2col_with_kmeans(copy.deepcopy(boxes), W, H)
    cols = [s["points"] for s in data["shapes"]]

    produced = []
    for c in cols:
        lst = []
        for s in d["shapes"]:
            fb = [s["points"][0][0] * W, s["points"][0][1] * H,
                  s["points"][1][0] * W, s["points"][1][1] * H]
            if boxes_mod.calculate_iou(_flat(c), fb, mini=True) >= 0.8:
                lst.append(((fb[1] + fb[3]) / 2, s["label"]))
        lst.sort(key=lambda t: t[0])
        produced.append("".join(l for _, l in lst))

    bycol = collections.defaultdict(list)
    for s in d["shapes"]:
        bycol[s["col"]].append((s["turn"], s["label"]))
    gt_lines = ["".join(l for _, l in sorted(v)) for _, v in sorted(bycol.items())]

    assert sorted(produced) == sorted(gt_lines)
    # every char lands in exactly one column (no double-assignments / drops)
    assert sum(len(t) for t in produced) == len(d["shapes"]) == 96


def test_kmeans_split_branch_behavior_snapshot():
    """Force the area-kmeans branch (coef_var > 0.66 and min/mean <= 1/8,
    modeling_internvl_chat.py:395-469) by narrowing the signature chars
    (GT cols 5-6) to 10% width while keeping GT cols 1-2 as main text, and
    freeze the resulting class assignment. The reassignment heuristics
    (width/height/area thresholds + merge-survivor rule,
    modeling_internvl_chat.py:418-469) deliberately pull signature chars whose
    heights match the main text back into the main class — this snapshot pins
    that exact behavior so any drift in kmeans_split/reassign/merge fails."""
    d, W, H, _ = _fixture()
    boxes = []
    for s in d["shapes"]:
        if not (s["col"] in (1, 2) or s["col"] >= 5):
            continue
        (x1, y1), (x2, y2) = s["points"]
        x1, y1, x2, y2 = x1 * W, y1 * H, x2 * W, y2 * H
        if s["col"] >= 5:  # narrow width only; heights keep columns mergeable
            cx = (x1 + x2) / 2
            hw = (x2 - x1) * 0.05
            x1, x2 = cx - hw, cx + hw
        boxes.append([[x1, y1], [x2, y2]])

    S = np.array([(b[1][0] - b[0][0]) * (b[1][1] - b[0][1]) for b in boxes])
    assert float(np.std(S) / np.mean(S)) > 0.66
    assert float(S.min() / S.mean()) <= 1 / 8

    data = boxes_mod.char2col_with_kmeans(copy.deepcopy(boxes), W, H)
    assert data["boxes2class"] is not None, "kmeans branch not taken"
    sizes = {k: len(v) for k, v in data["boxes2class"].items()}
    assert sizes == {1: 57, 2: 3}, sizes  # golden snapshot (frozen heuristics)


def test_dedup_keeps_fixture_removes_duplicates():
    _, _, _, boxes = _fixture()
    # the annotated boxes are all distinct characters: nothing removed
    assert len(boxes_mod.dedup_boxes_iou(copy.deepcopy(boxes), 0.8)) == 96
    # an injected near-duplicate (2px jitter) is removed
    dup = [[boxes[0][0][0] + 2, boxes[0][0][1] + 2],
           [boxes[0][1][0] + 2, boxes[0][1][1] + 2]]
    out = boxes_mod.dedup_boxes_iou(copy.deepcopy(boxes) + [dup], 0.8)
    assert len(out) == 96


def test_refine_leaves_small_page_whole_and_splits_big():
    d, W, H, boxes = _fixture()
    img = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(FIXTURE_JPG))
    data = {"imageHeight": H, "imageWidth": W,
            "shapes": [{"points": b} for b in boxes]}
    subs = boxes_mod.refine(img, copy.deepcopy(data))
    assert len(subs) == 1 and len(subs[0][1]["shapes"]) == 96  # 96 < 300: whole

    subs2 = boxes_mod.refine(img, copy.deepcopy(data), max_chars=50)
    assert len(subs2) >= 2
    total = sum(len(sd["shapes"]) for _, sd in subs2)
    assert total <= 96  # cut-crossing chars are masked out, never duplicated
    assert all(len(sd["shapes"]) < 50 for _, sd in subs2)
