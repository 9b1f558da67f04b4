"""COCO-protocol detection mAP: AP averaged over IoU 0.50:0.05:0.95.

The reference's headline metric (reference README.md:118-138 reports
mAP@[0.5:0.95] / @0.5 / @0.75 on MSCOCO test-dev; BASELINE.json targets the
same definition) — the VOC 11-point metric in ``data/pascal_voc.py`` only
measures @0.5 and cannot separate the v2 localization features (fitness NMS,
bounded-IoU: reference README.md:122-128 shows wide v1->v2 moving
mAP@[0.5:0.95] 30.0->33.4 while @0.5 moves only 48.9->49.8).

This is a self-contained reimplementation of the pycocotools COCOeval bbox
protocol (greedy per-threshold matching, 101-point interpolated AP,
area-range strata with ignore semantics, maxDets cap), operating directly on
the repo's detection result structure::

    [{"meta": {"bbox": [(x0,y0,x1,y1)...], "class": [...]},
      "detections": [(pr, cls, (x0,y0,x1,y1)), ...]}, ...]

with crop-normalized [0,1] coordinates.  Areas are evaluated in pixels of
``image_size`` so the standard COCO small/medium/large boundaries (32^2,
96^2 px) apply.
"""
import numpy

IOU_THRESHOLDS = numpy.arange(0.5, 1.0, 0.05).round(2)        # 10 values
RECALL_THRESHOLDS = numpy.linspace(0.0, 1.0, 101)

# COCO area-range definitions (px^2): cocoeval.py params
AREA_RANGES = {"all": (0.0, float("inf")),
               "small": (0.0, 32.0 ** 2),
               "medium": (32.0 ** 2, 96.0 ** 2),
               "large": (96.0 ** 2, float("inf"))}


def _iou_matrix(dts, gts):
    """dts (D,4), gts (G,4) -> IoU (D,G) (same box convention as
    utils.overlap_iou)."""
    if len(dts) == 0 or len(gts) == 0:
        return numpy.zeros((len(dts), len(gts)), dtype=numpy.float64)
    dts = numpy.asarray(dts, dtype=numpy.float64)
    gts = numpy.asarray(gts, dtype=numpy.float64)
    ix = (numpy.minimum(dts[:, None, 2], gts[None, :, 2]) -
          numpy.maximum(dts[:, None, 0], gts[None, :, 0])).clip(min=0.0)
    iy = (numpy.minimum(dts[:, None, 3], gts[None, :, 3]) -
          numpy.maximum(dts[:, None, 1], gts[None, :, 1])).clip(min=0.0)
    inter = ix * iy
    area_d = (dts[:, 2] - dts[:, 0]) * (dts[:, 3] - dts[:, 1])
    area_g = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    union = area_d[:, None] + area_g[None, :] - inter
    return inter / numpy.maximum(union, 1e-12)


def _match_image(dt_boxes, dt_scores, gt_boxes, gt_ignore, thresholds):
    """Greedy COCO matching for one (image, category) at every threshold.

    Returns (dt_matched (T,D) bool, dt_match_ignored (T,D) bool): whether
    each detection matched a gt, and whether its matched gt was ignored.
    Matching follows cocoeval.evaluateImg: detections in score order each
    take the not-yet-matched gt with the highest IoU >= threshold,
    preferring non-ignored gts (once a non-ignored match is held, ignored
    gts cannot displace it)."""
    t_num, d_num, g_num = len(thresholds), len(dt_boxes), len(gt_boxes)
    dtm = numpy.zeros((t_num, d_num), dtype=bool)
    dt_ig = numpy.zeros((t_num, d_num), dtype=bool)
    if d_num == 0 or g_num == 0:
        return dtm, dt_ig

    # gts sorted ignore-last (stable) like cocoeval
    g_order = numpy.argsort(gt_ignore, kind="stable")
    gt_ignore = numpy.asarray(gt_ignore)[g_order]
    ious = _iou_matrix(dt_boxes, numpy.asarray(gt_boxes)[g_order])

    for ti, t in enumerate(thresholds):
        gtm = numpy.zeros(g_num, dtype=bool)
        for d in range(d_num):
            best = min(t, 1.0 - 1e-10)
            m = -1
            for g in range(g_num):
                if gtm[g]:
                    continue
                # best non-ignored match already held; the rest are ignored
                if m > -1 and not gt_ignore[m] and gt_ignore[g]:
                    break
                if ious[d, g] < best:
                    continue
                best = ious[d, g]
                m = g
            if m > -1:
                gtm[m] = True
                dtm[ti, d] = True
                dt_ig[ti, d] = gt_ignore[m]
    return dtm, dt_ig


def _box_area_px(box, image_size):
    return ((box[2] - box[0]) * image_size) * ((box[3] - box[1]) * image_size)


def _average_precision(scores, dtm, dt_ig, npig):
    """Accumulate one (category, stratum): scores (N,), dtm/dt_ig (T,N) over
    all images -> AP (T,) via 101-point interpolation (cocoeval.accumulate)."""
    t_num = dtm.shape[0]
    ap = numpy.full(t_num, numpy.nan)
    if npig == 0:
        return ap
    order = numpy.argsort(-scores, kind="mergesort")
    dtm = dtm[:, order]
    dt_ig = dt_ig[:, order]
    tps = numpy.cumsum(dtm & ~dt_ig, axis=1, dtype=numpy.float64)
    fps = numpy.cumsum(~dtm & ~dt_ig, axis=1, dtype=numpy.float64)
    for ti in range(t_num):
        tp, fp = tps[ti], fps[ti]
        rc = tp / npig
        pr = tp / numpy.maximum(tp + fp, 1e-12)
        # precision envelope (monotone non-increasing from the right)
        for i in range(len(pr) - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        inds = numpy.searchsorted(rc, RECALL_THRESHOLDS, side="left")
        q = numpy.zeros(len(RECALL_THRESHOLDS))
        ok = inds < len(pr)
        q[ok] = pr[inds[ok]]
        ap[ti] = q.mean()
    return ap


def evaluate(detections, class_num, image_size=512, max_dets=100,
             area_range=None, gt_in_stratum=None):
    """COCO mAP over one stratum -> AP array (T, K) (nan = no gt in class).

    ``area_range`` (lo, hi) px^2 applies COCO ignore semantics: gts outside
    the range are ignored (matching them neither scores nor penalizes) and
    unmatched detections outside the range are discounted.  The optional
    ``gt_in_stratum(meta, gt_index) -> bool`` generalizes the stratum to
    arbitrary gt attributes (e.g. occlusion bins via meta["visible_frac"]);
    out-of-stratum gts are ignored the same way, while false positives on
    background still count against every stratum (they cannot be
    attributed)."""
    t_num = len(IOU_THRESHOLDS)
    per_class = {k: {"scores": [], "dtm": [], "dt_ig": [], "npig": 0}
                 for k in range(class_num)}

    for r in detections:
        meta = r["meta"]
        gt_boxes = [tuple(b) for b in meta["bbox"]]
        gt_cls = list(meta["class"])
        dts = sorted(r["detections"], key=lambda d: -d[0])[:max_dets]

        for k in set(gt_cls) | set(int(d[1]) for d in dts):
            g_idx = [i for i, c in enumerate(gt_cls) if c == k]
            d_k = [d for d in dts if int(d[1]) == k]
            g_boxes = [gt_boxes[i] for i in g_idx]
            g_ig = numpy.zeros(len(g_idx), dtype=bool)
            for j, i in enumerate(g_idx):
                if area_range is not None:
                    a = _box_area_px(gt_boxes[i], image_size)
                    if not (area_range[0] <= a < area_range[1]):
                        g_ig[j] = True
                if gt_in_stratum is not None and not gt_in_stratum(meta, i):
                    g_ig[j] = True

            d_scores = numpy.array([d[0] for d in d_k], dtype=numpy.float64)
            d_boxes = [d[2] for d in d_k]
            dtm, dt_ig = _match_image(d_boxes, d_scores, g_boxes, g_ig,
                                      IOU_THRESHOLDS)
            if area_range is not None:
                # unmatched dets outside the area range are discounted
                out = numpy.array([not (area_range[0] <=
                                        _box_area_px(b, image_size) <
                                        area_range[1]) for b in d_boxes],
                                  dtype=bool) if d_boxes else \
                    numpy.zeros(0, dtype=bool)
                dt_ig |= ~dtm & out[None, :]

            acc = per_class[k]
            acc["scores"].append(d_scores)
            acc["dtm"].append(dtm)
            acc["dt_ig"].append(dt_ig)
            acc["npig"] += int((~g_ig).sum())

    ap = numpy.full((t_num, class_num), numpy.nan)
    for k, acc in per_class.items():
        if acc["npig"] == 0:
            continue
        if acc["scores"]:
            scores = numpy.concatenate(acc["scores"])
            dtm = numpy.concatenate(acc["dtm"], axis=1)
            dt_ig = numpy.concatenate(acc["dt_ig"], axis=1)
        else:
            scores = numpy.zeros(0)
            dtm = dt_ig = numpy.zeros((t_num, 0), dtype=bool)
        ap[:, k] = _average_precision(scores, dtm, dt_ig, acc["npig"])
    return ap


def summarize(detections, class_num, image_size=512, max_dets=100,
              strata=None):
    """Full COCO-style summary dict.

    Keys: ``map`` (@[0.5:0.95]), ``map50``, ``map75``, ``map_small/medium/
    large`` (COCO area strata), plus ``map_<name>`` for each extra stratum in
    ``strata`` ({name: gt_in_stratum_fn}).  Values are nan when the stratum
    holds no ground truth."""
    out = {}
    ap = evaluate(detections, class_num, image_size, max_dets)
    valid = ~numpy.isnan(ap)

    def mean_ap(a):
        v = ~numpy.isnan(a)
        return float(a[v].mean()) if v.any() else float("nan")

    out["map"] = mean_ap(ap)
    out["map50"] = mean_ap(ap[numpy.isclose(IOU_THRESHOLDS, 0.5)][0])
    out["map75"] = mean_ap(ap[numpy.isclose(IOU_THRESHOLDS, 0.75)][0])
    out["ap_per_iou"] = {float(t): mean_ap(ap[i])
                         for i, t in enumerate(IOU_THRESHOLDS)}
    out["classes_with_gt"] = int(valid[0].sum())

    for name in ("small", "medium", "large"):
        ap_s = evaluate(detections, class_num, image_size, max_dets,
                        area_range=AREA_RANGES[name])
        out["map_" + name] = mean_ap(ap_s)

    for name, fn in (strata or {}).items():
        ap_s = evaluate(detections, class_num, image_size, max_dets,
                        gt_in_stratum=fn)
        out["map_" + name] = mean_ap(ap_s)
    return out
