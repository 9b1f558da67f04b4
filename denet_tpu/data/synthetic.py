"""Synthetic colored-rectangle detection data.

Used by the end-to-end convergence tests, scripts/train_flagship_synth.py,
and bench.py's trained-weights mode (no real datasets ship in this
environment; the rectangles exercise the full detection pipeline with
realistic corner/detection densities).
"""
import numpy


def class_color(cls):
    """Deterministic well-separated palette: a base-5 RGB grid (125 cells).

    Min per-channel gap is 0.175, far above the per-box color jitter
    (+-0.05) and uint8 quantization, so every class pair stays separable.
    (The previous hash palette spaced adjacent classes ~0.008/channel --
    below the jitter -- making the 80-way task near-unlearnable: held-out
    class-correct coverage plateaued at ~58% at any training length.)
    The 47 multiplier is coprime to 125, so cells are distinct for
    class_num <= 125; values start at 0.25, above the 0-0.2 background
    noise band even after jitter.
    """
    cell = (cls * 47) % 125
    return [0.25 + 0.175 * ((cell // 5 ** c) % 5) for c in range(3)]


def make_sample(rng, size, class_num, max_boxes=5):
    """One image: colored rectangles on dim noise -> (x_chw, meta)."""
    x = rng.uniform(0, 0.2, (3, size, size)).astype(numpy.float32)
    bboxes, classes = [], []
    for _ in range(rng.randint(1, max_boxes + 1)):
        w = rng.randint(size // 16, size // 2)
        h = rng.randint(size // 16, size // 2)
        x0 = rng.randint(0, size - w)
        y0 = rng.randint(0, size - h)
        cls = rng.randint(0, class_num)
        color = class_color(cls)
        for c in range(3):
            x[c, y0:y0 + h, x0:x0 + w] = color[c] + rng.uniform(-0.05, 0.05)
        bboxes.append((x0 / size, y0 / size, (x0 + w) / size, (y0 + h) / size))
        classes.append(cls)
    return x, {"bbox": bboxes, "class": classes}


def make_batch(rng, batch, size, class_num, max_boxes=5):
    xs, metas = zip(*[make_sample(rng, size, class_num, max_boxes)
                      for _ in range(batch)])
    return numpy.stack(xs), list(metas)


def make_uint8_batch(rng, batch, size, class_num, max_boxes=5):
    """uint8-encoded variant (deployment input format for bench.py)."""
    x, metas = make_batch(rng, batch, size, class_num, max_boxes)
    return (x * 255.0).clip(0, 255).astype(numpy.uint8), metas


# -- "hard" graded distribution (round-3 benchmark) ---------------------------
#
# The original distribution saturated (flagship mAP@0.5 0.933 = its occlusion
# ceiling; PERF.md "mAP saturation point") and lacks exactly the cases the
# corner-pairing/clustering features exist for.  The hard distribution adds:
#   * scale extremes: box sides log-uniform from 8 px to ~frame size
#     (COCO small/medium/large strata all populated),
#   * aspect ratios log-uniform in [1:4, 4:1],
#   * crowding: a 60% mode with 8..max_boxes boxes and heavy mutual overlap,
#   * truncation: centers may sit at the frame border (>=50% of each axis
#     onscreen, the reference denet_crop acceptance rule, augment.py:220-259);
#     the gt is the on-screen clip,
#   * exact per-gt visibility (painter's-algorithm owner map), recorded as
#     meta["visible_frac"] for occlusion-stratified evaluation
#     (coco_eval.summarize strata); fully-hidden boxes (0 visible px) are
#     dropped from the gt.

def hard_geometry(rng, size, class_num, max_boxes=24):
    """Draw one image's box geometry -> (boxes_px (n,4) i32, classes (n,),
    visible_frac (n,) f32), clipped to the frame, paint order = index order."""
    if rng.uniform() < 0.4:
        n = rng.randint(1, 7)
    else:
        n = rng.randint(8, max_boxes + 1)
    boxes, classes = [], []
    log_lo, log_hi = numpy.log(8.0), numpy.log(0.95 * size)
    for _ in range(n):
        for _try in range(10):
            s = float(numpy.exp(rng.uniform(log_lo, log_hi)))
            a = float(numpy.exp(rng.uniform(numpy.log(0.25), numpy.log(4.0))))
            w = min(max(s * numpy.sqrt(a), 6.0), 1.4 * size)
            h = min(max(s / numpy.sqrt(a), 6.0), 1.4 * size)
            x0 = rng.uniform(-0.5 * w, size - 0.5 * w)
            y0 = rng.uniform(-0.5 * h, size - 0.5 * h)
            bx = (int(round(max(0.0, x0))), int(round(max(0.0, y0))),
                  int(round(min(float(size), x0 + w))),
                  int(round(min(float(size), y0 + h))))
            if bx[2] - bx[0] >= 5 and bx[3] - bx[1] >= 5:
                break
        else:
            continue
        boxes.append(bx)
        classes.append(rng.randint(0, class_num))

    boxes = numpy.array(boxes, dtype=numpy.int32).reshape(-1, 4)
    classes = numpy.array(classes, dtype=numpy.int32)
    # exact visibility: owner map under painter's algorithm
    owner = numpy.full((size, size), -1, dtype=numpy.int16)
    for k, (x0, y0, x1, y1) in enumerate(boxes):
        owner[y0:y1, x0:x1] = k
    vis = numpy.zeros(len(boxes), dtype=numpy.float32)
    counts = numpy.bincount(owner[owner >= 0].ravel(), minlength=len(boxes))
    for k, (x0, y0, x1, y1) in enumerate(boxes):
        vis[k] = counts[k] / float(max(1, (x1 - x0) * (y1 - y0)))
    return boxes, classes, vis


def make_sample_hard(rng, size, class_num, max_boxes=24):
    """One hard-distribution image -> (x_chw f32, meta incl. visible_frac)."""
    boxes, classes, vis = hard_geometry(rng, size, class_num, max_boxes)
    x = rng.uniform(0, 0.2, (3, size, size)).astype(numpy.float32)
    for (x0, y0, x1, y1), cls in zip(boxes.tolist(), classes.tolist()):
        color = class_color(cls)
        for c in range(3):
            x[c, y0:y1, x0:x1] = color[c] + rng.uniform(-0.05, 0.05)
    keep = vis > 0.0
    meta = {"bbox": [(x0 / size, y0 / size, x1 / size, y1 / size)
                     for x0, y0, x1, y1 in boxes[keep].tolist()],
            "class": classes[keep].tolist(),
            "visible_frac": vis[keep].tolist()}
    return x, meta


def make_batch_hard(rng, batch, size, class_num, max_boxes=24):
    xs, metas = zip(*[make_sample_hard(rng, size, class_num, max_boxes)
                      for _ in range(batch)])
    return numpy.stack(xs), list(metas)


def make_uint8_batch_hard(rng, batch, size, class_num, max_boxes=24):
    x, metas = make_batch_hard(rng, batch, size, class_num, max_boxes)
    return (x * 255.0).clip(0, 255).astype(numpy.uint8), metas
