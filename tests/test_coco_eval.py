"""Golden tests for the COCO-protocol evaluator (data/coco_eval.py).

pycocotools is not available in this image, so the protocol is pinned by
hand-computed cases: threshold sweep membership, 101-point precision
envelope with interleaved FPs, area-range ignore semantics, ignored-gt
match discounting, and the nan handling for classes without ground truth.
"""
import math

import numpy
import pytest

from denet_tpu.data import coco_eval


def det_result(gt, dets):
    bboxes = [b for _, b in gt]
    classes = [c for c, _ in gt]
    return {"meta": {"bbox": bboxes, "class": classes}, "detections": dets}


def test_perfect_detections_map_one():
    gt = [(0, (0.1, 0.1, 0.4, 0.5)), (1, (0.5, 0.5, 0.9, 0.8))]
    dets = [(0.9, 0, (0.1, 0.1, 0.4, 0.5)), (0.8, 1, (0.5, 0.5, 0.9, 0.8))]
    s = coco_eval.summarize([det_result(gt, dets)], class_num=2)
    assert s["map"] == pytest.approx(1.0)
    assert s["map50"] == pytest.approx(1.0)
    assert s["map75"] == pytest.approx(1.0)
    assert s["classes_with_gt"] == 2


def test_iou_threshold_sweep_membership():
    # det IoU vs gt is exactly 0.6: scores at t in {0.5, 0.55, 0.6}, misses
    # the 7 higher thresholds -> map = 3/10
    gt = [(0, (0.0, 0.0, 0.5, 0.5))]
    dets = [(0.9, 0, (0.0, 0.0, 0.5, 0.3))]     # inter 0.15, union 0.25
    s = coco_eval.summarize([det_result(gt, dets)], class_num=1)
    assert s["map50"] == pytest.approx(1.0)
    assert s["map75"] == pytest.approx(0.0)
    assert s["map"] == pytest.approx(0.3)


def test_higher_scoring_fp_halves_precision():
    # FP outscores the TP: pr envelope = [0.5, 0.5] -> AP50 = 0.5
    gt = [(0, (0.1, 0.1, 0.5, 0.5))]
    dets = [(0.95, 0, (0.6, 0.6, 0.9, 0.9)),    # FP (no overlap)
            (0.90, 0, (0.1, 0.1, 0.5, 0.5))]    # TP
    s = coco_eval.summarize([det_result(gt, dets)], class_num=1)
    assert s["map50"] == pytest.approx(0.5)


def test_lower_scoring_fp_keeps_ap_one():
    # FP ranked below the TP: precision at recall 1.0 is 1.0 before the FP
    # enters -> envelope keeps AP = 1.0
    gt = [(0, (0.1, 0.1, 0.5, 0.5))]
    dets = [(0.95, 0, (0.1, 0.1, 0.5, 0.5)),
            (0.10, 0, (0.6, 0.6, 0.9, 0.9))]
    s = coco_eval.summarize([det_result(gt, dets)], class_num=1)
    assert s["map50"] == pytest.approx(1.0)


def test_duplicate_detection_is_fp():
    # second det on the same gt cannot re-match -> FP; AP = mean of
    # envelope: rc=[1,1], pr=[1,0.5] -> envelope [1,0.5], q(r)=1 for all
    # recall points (searchsorted left finds the first rc >= r, index 0)
    gt = [(0, (0.1, 0.1, 0.5, 0.5))]
    dets = [(0.95, 0, (0.1, 0.1, 0.5, 0.5)),
            (0.90, 0, (0.1, 0.1, 0.5, 0.5))]
    s = coco_eval.summarize([det_result(gt, dets)], class_num=1)
    assert s["map50"] == pytest.approx(1.0)


def test_missed_gt_caps_recall():
    # 2 gts, 1 found: rc=[0.5], pr=[1] -> q=1 for r<=0.5, 0 above
    # 101-point: r grid 0,0.01,...,1.0 -> 51 points <= 0.5 -> AP=51/101
    gt = [(0, (0.1, 0.1, 0.5, 0.5)), (0, (0.6, 0.6, 0.9, 0.9))]
    dets = [(0.9, 0, (0.1, 0.1, 0.5, 0.5))]
    s = coco_eval.summarize([det_result(gt, dets)], class_num=1)
    assert s["map50"] == pytest.approx(51.0 / 101.0)


def test_class_without_gt_is_nan_excluded():
    gt = [(0, (0.1, 0.1, 0.5, 0.5))]
    dets = [(0.9, 0, (0.1, 0.1, 0.5, 0.5)),
            (0.8, 1, (0.6, 0.6, 0.9, 0.9))]    # det for absent class 1
    s = coco_eval.summarize([det_result(gt, dets)], class_num=3)
    assert s["classes_with_gt"] == 1
    assert s["map"] == pytest.approx(1.0)       # class-1 FPs don't average in


def test_area_strata_ignore_semantics():
    # small gt (16px @512) + large gt (256px); one perfect det each.
    # map_small must ignore the large gt AND the large det (unmatched-out-of-
    # range discount is exercised by the miss case below).
    small = (0.0, 0.0, 16.0 / 512, 16.0 / 512)
    large = (0.2, 0.2, 0.7, 0.7)
    gt = [(0, small), (0, large)]
    dets = [(0.9, 0, small), (0.8, 0, large)]
    s = coco_eval.summarize([det_result(gt, dets)], class_num=1)
    assert s["map_small"] == pytest.approx(1.0)
    assert s["map_large"] == pytest.approx(1.0)
    assert math.isnan(s["map_medium"])          # no medium gt anywhere

    # large det present but large gt missed -> map_small unaffected because
    # the unmatched large det is outside the small range (discounted)
    dets2 = [(0.9, 0, small), (0.8, 0, (0.21, 0.2, 0.71, 0.7))]
    ap_small = coco_eval.evaluate([det_result(gt, dets2)], 1,
                                  area_range=coco_eval.AREA_RANGES["small"])
    assert numpy.nanmean(ap_small) == pytest.approx(1.0)


def test_custom_stratum_gt_filter():
    # occlusion-style stratum: ignore gts with visible_frac < 0.5; the det
    # matching the ignored gt is discounted, not an FP
    gt_boxes = [(0.1, 0.1, 0.4, 0.4), (0.6, 0.6, 0.9, 0.9)]
    r = {"meta": {"bbox": gt_boxes, "class": [0, 0],
                  "visible_frac": [1.0, 0.2]},
         "detections": [(0.9, 0, gt_boxes[0]), (0.8, 0, gt_boxes[1])]}

    def visible(meta, i):
        return meta["visible_frac"][i] >= 0.5

    ap = coco_eval.evaluate([r], 1, gt_in_stratum=visible)
    assert numpy.nanmean(ap) == pytest.approx(1.0)

    def occluded(meta, i):
        return meta["visible_frac"][i] < 0.5

    ap = coco_eval.evaluate([r], 1, gt_in_stratum=occluded)
    assert numpy.nanmean(ap) == pytest.approx(1.0)


def test_ignored_gt_does_not_steal_match():
    # a det overlapping BOTH an ignored and a non-ignored gt must match the
    # non-ignored one even if the ignored IoU is higher (cocoeval preference)
    box_ig = (0.10, 0.10, 0.50, 0.50)
    box_ok = (0.12, 0.10, 0.52, 0.50)
    r = {"meta": {"bbox": [box_ig, box_ok], "class": [0, 0],
                  "keep": [False, True]},
         "detections": [(0.9, 0, box_ig)]}     # exact IoU 1.0 with ignored
    ap = coco_eval.evaluate([r], 1,
                            gt_in_stratum=lambda m, i: m["keep"][i])
    # det IoU vs the non-ignored gt = 0.38/0.42 approx 0.905 -> matches at
    # t<=0.9: 9 of 10 thresholds score 1.0
    assert numpy.nanmean(ap) == pytest.approx(0.9)


def test_max_dets_cap():
    gt = [(0, (0.1, 0.1, 0.5, 0.5))]
    dets = [(0.99 - 0.001 * i, 0, (0.6, 0.6, 0.9, 0.9)) for i in range(100)]
    dets.append((0.5, 0, (0.1, 0.1, 0.5, 0.5)))   # TP ranked 101st
    s = coco_eval.summarize([det_result(gt, dets)], class_num=1, max_dets=100)
    assert s["map50"] == pytest.approx(0.0)       # TP fell off the cap
    s = coco_eval.summarize([det_result(gt, dets)], class_num=1, max_dets=101)
    assert s["map50"] > 0.0
