"""Box geometry golden tests + CalliBench metric parity."""

import numpy as np

from callireader_tpu.evalx import metrics
from callireader_tpu.vision import boxes


def test_iou():
    a = [0, 0, 10, 10]
    b = [5, 5, 15, 15]
    iou = boxes.calculate_iou(a, b)
    assert abs(iou - 25 / 175) < 1e-9
    assert abs(boxes.calculate_iou(a, b, mini=True) - 0.25) < 1e-9


def test_merge_boxes_column():
    # three vertically stacked chars with strong x-overlap -> one column
    chars = [
        [[10, 10], [30, 30]],
        [[11, 40], [31, 60]],
        [[9, 70], [29, 90]],
        # far-away second column
        [[100, 10], [120, 30]],
        [[101, 40], [121, 60]],
    ]
    cols = boxes.merge_boxes([list(map(list, b)) for b in chars])
    assert len(cols) == 2
    # first column spans all three boxes
    spans = sorted(cols, key=lambda c: c[0][0])
    assert spans[0][0][1] <= 10 and spans[0][1][1] >= 90


def test_dedup_boxes_iou():
    b = [[[0, 0], [10, 10]], [[0.2, 0.2], [10, 10]], [[50, 50], [60, 60]]]
    out = boxes.dedup_boxes_iou(b, 0.8)
    assert len(out) == 2


def test_dedup_vectorized_equals_reference_loop():
    """The vectorized greedy dedup must reproduce the reference's
    pop-in-place loop (modeling_internvl_chat.py:374-392) box-for-box,
    including on dense duplicate clusters, chains (A~B, B~C, A!~C),
    degenerate zero-area boxes, and every threshold regime."""
    rng = np.random.RandomState(7)
    for trial in range(200):
        n = rng.randint(0, 40)
        base = rng.uniform(0, 300, (max(n, 1), 2))
        wh = rng.uniform(1, 60, (max(n, 1), 2))
        bxs = []
        for i in range(n):
            x0, y0 = base[i]
            w, h = wh[i]
            bxs.append([[x0, y0], [x0 + w, y0 + h]])
            # half the time add a near-duplicate / chained jitter copy
            if rng.rand() < 0.5:
                d = rng.uniform(0, w * 0.3)
                bxs.append([[x0 + d, y0], [x0 + w + d, y0 + h]])
        if rng.rand() < 0.2 and bxs:  # degenerate zero-area
            x0, y0 = rng.uniform(0, 300, 2)
            bxs.append([[x0, y0], [x0, y0]])
        rng.shuffle(bxs)
        thr = rng.choice([0.0, 0.3, 0.8, 0.95])
        import copy

        fast = boxes.dedup_boxes_iou(copy.deepcopy(bxs), thr)
        slow = boxes._dedup_boxes_iou_loop(copy.deepcopy(bxs), thr)
        assert fast == slow, f"trial {trial}: {len(fast)} vs {len(slow)}"


def test_most_frequent_rgb():
    img = np.zeros((4, 4, 3), np.uint8)
    img[0, 0] = [1, 2, 3]
    assert boxes.most_frequent_rgb_fast(img) == (0, 0, 0)


def test_char2col_uniform_no_split():
    chars = [[[10 + i, 10 + 30 * i], [30 + i, 30 + 30 * i]] for i in range(4)]
    out = boxes.char2col_with_kmeans(chars, 200, 200)
    assert out["boxes2class"] is None
    assert len(out["shapes"]) >= 1


def test_char2col_bimodal_splits():
    big = [[[10, 10 + 60 * i], [60, 60 + 60 * i]] for i in range(4)]
    small = [[[150, 10 + 8 * i], [154, 14 + 8 * i]] for i in range(4)]
    out = boxes.char2col_with_kmeans(big + small, 200, 300)
    assert out["boxes2class"] is not None


def test_metrics_prf1():
    p, r, f1 = metrics.calculate_metrics(list("abcd"), list("abce"))
    assert p == 0.75 and r == 0.75 and abs(f1 - 0.75) < 1e-9
    # duplicate predictions only match once
    p, r, f1 = metrics.calculate_metrics(list("aa"), list("a"))
    assert p == 0.5 and r == 1.0


def test_ned():
    assert metrics.ned("kitten", "sitting") == 3 / 7
    assert metrics.ned("", "") == 0.0


def test_clean_string():
    assert metrics.get_clean_string("你好，世界。ABC123!") == "你好世界ABC"


def test_choice_accuracy_rules():
    gts = [("A", "王羲之", "颜真卿", "柳公权")] * 4
    responses = [
        "A",            # correct letter
        "A B",          # multi-letter -> wrong
        "王羲之",        # correct text containment
        "王羲之和颜真卿",  # contains correct AND wrong text -> wrong
    ]
    acc = metrics.evaluate_choice_accuracy(responses, gts)
    assert acc == 50.0


def test_levenshtein_fallback_matches():
    a, b = list("书法作品"), list("书発作品集")
    try:
        import Levenshtein

        expected = Levenshtein.distance(a, b)
    except Exception:
        expected = 2
    assert metrics.levenshtein(a, b) == expected


def test_half_divide_splits_and_masks():
    img = np.full((100, 200, 3), 240, np.uint8)
    img[40:60, 95:105] = 10  # char crossing the split
    data = {
        "imageHeight": 100,
        "imageWidth": 200,
        "shapes": [
            {"points": [[10, 10], [30, 30]]},     # left
            {"points": [[150, 10], [170, 30]]},   # right
            {"points": [[95, 40], [105, 60]]},    # crosses split -> masked
        ],
    }
    li, ld, ri, rd = boxes.half_divide(img, data)
    assert li.shape[1] == 100 and ri.shape[1] == 100
    assert len(ld["shapes"]) == 1 and len(rd["shapes"]) == 1
    assert rd["shapes"][0]["points"][0][0] == 50  # shifted by split
    # crossing char masked with background color
    assert (li[45, 96] > 200).all()


def test_refine_caps_chars():
    img = np.full((100, 400, 3), 240, np.uint8)
    shapes = [{"points": [[x, 10], [x + 2, 20]]} for x in range(5, 395, 1)]
    data = {"imageHeight": 100, "imageWidth": 400, "shapes": shapes}
    subs = boxes.refine(img, data, max_chars=100)
    assert len(subs) >= 4
    for _, d in subs:
        assert len(d["shapes"]) < 100


def test_draw_boxes(tmp_path):
    img = np.full((50, 50, 3), 255, np.uint8)
    out = boxes.draw_boxes(img, [[5, 5, 20, 20], [[25, 25], [40, 40]]],
                           str(tmp_path / "o.png"), numbered=True)
    assert out.shape == img.shape
    assert (out != 255).any()
    assert (tmp_path / "o.png").exists()


def test_t2s_bundled_table():
    """Offline trad->simp conversion (evaluate.py:41 parity without opencc):
    the bundled table must convert common traditional text, leave simplified
    text untouched, and keep context-dependent chars (乾/著) unmapped."""
    from callireader_tpu.evalx import metrics

    assert metrics.t2s("書法藝術萬歲") == "书法艺术万岁"
    assert metrics.t2s("漢字傳統與簡體轉換測試") == "汉字传统与简体转换测试"
    assert metrics.t2s("已经是简体的文字不变") == "已经是简体的文字不变"
    assert metrics.t2s("乾坤著作") == "乾坤著作"  # conservative: ambiguous chars kept
    table = metrics._load_t2s_table()
    assert len(table) >= 2000


def test_t2s_phrase_aware_fallback():
    """Phrase-dependent characters (OpenCC TSPhrases behavior): the bundled
    longest-match phrase table converts the dominant ambiguous cases the
    char table must not touch (evaluate.py:41 uses the opencc library)."""
    from callireader_tpu.evalx import metrics

    cases = [
        ("頭髮", "头发"), ("發現", "发现"),              # 髮/發 both -> 发
        ("乾燥的餅乾", "干燥的饼干"), ("乾隆乾坤", "乾隆乾坤"),
        ("藉口", "借口"), ("憑藉", "凭借"), ("狼藉", "狼藉"),
        ("接著寫著名的書", "接着写著名的书"),            # 著 zhe vs zhù
        ("瀋陽", "沈阳"), ("神祇", "神祇"), ("祇有", "只有"),
        ("答覆", "答复"), ("顛覆", "颠覆"),
    ]
    for trad, simp in cases:
        assert metrics._t2s_fallback(trad) == simp, trad
    # F1 on traditional prediction vs simplified GT is exact after t2s
    pred = metrics.t2s(metrics.get_clean_string("觀滄海，東臨碣石。"))
    gt = "观沧海东临碣石"
    p, r, f1 = metrics.calculate_metrics(list(pred), list(gt))
    assert f1 == 1.0
