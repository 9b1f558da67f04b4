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
