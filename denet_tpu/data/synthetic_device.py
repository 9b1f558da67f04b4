"""On-device synthetic-data rendering (infinite training data, zero uploads).

The host-side pool protocol (scripts/train_flagship_synth.py round 2) staged
a fixed set of uint8 batches in HBM; a 32M-param flagship memorizes a
~1k-image pool (train cost 0.02, held-out class accuracy stuck ~70%) instead
of learning the palette.  Here the host draws only the box GEOMETRY
(microseconds of numpy, a few hundred bytes shipped per step) and the device
rasterizes the image inside jit: background noise + painter's-algorithm
rectangle fills from the class palette, matching
``denet_tpu.data.synthetic.make_uint8_batch`` semantics (same palette, same
U(-0.05,0.05) per-box-channel color jitter, same U(0,0.2) background band,
same truncating uint8 encode).  Every step sees fresh data; the upload and
HBM pool-capacity ceilings disappear.

No reference counterpart (the reference trains from disk datasets); this is
TPU-native harness infrastructure for the synthetic training evidence.
"""
import jax
import jax.numpy as jnp
import numpy

from denet_tpu.core.model import _keepalive
from denet_tpu.data.synthetic import class_color


def make_gt_batch(rng, batch, size, class_num, max_boxes=5):
    """Draw box geometry only -> (metas, boxes_px, classes, counts).

    Same geometry distribution as ``synthetic.make_sample`` (box edges
    U[size/16, size/2), uniform placement, uniform class).  ``metas`` is the
    standard normalized list-of-dicts consumed by target builders / eval;
    the three arrays are the compact device inputs for ``build_renderer``.
    """
    boxes = numpy.zeros((batch, max_boxes, 4), numpy.int32)
    classes = numpy.zeros((batch, max_boxes), numpy.int32)
    counts = numpy.zeros((batch,), numpy.int32)
    metas = []
    for b in range(batch):
        n = rng.randint(1, max_boxes + 1)
        counts[b] = n
        bbs, cls = [], []
        for k in range(n):
            w = rng.randint(size // 16, size // 2)
            h = rng.randint(size // 16, size // 2)
            x0 = rng.randint(0, size - w)
            y0 = rng.randint(0, size - h)
            c = rng.randint(0, class_num)
            boxes[b, k] = (x0, y0, x0 + w, y0 + h)
            classes[b, k] = c
            bbs.append((x0 / size, y0 / size, (x0 + w) / size,
                        (y0 + h) / size))
            cls.append(c)
        metas.append({"bbox": bbs, "class": cls})
    return metas, boxes, classes, counts


def make_gt_batch_hard(rng, batch, size, class_num, max_boxes=24):
    """Hard-distribution geometry (synthetic.hard_geometry: scale extremes,
    1:4 aspects, crowding, truncation, exact occlusion) for device rendering.

    Returns (metas, boxes_px, classes, counts): the arrays carry EVERY box
    (painter's order matters for the rasterizer), the metas carry only the
    visible gt (visible_frac > 0) plus per-gt ``visible_frac`` for
    occlusion-stratified eval."""
    from denet_tpu.data.synthetic import hard_geometry

    boxes = numpy.zeros((batch, max_boxes, 4), numpy.int32)
    classes = numpy.zeros((batch, max_boxes), numpy.int32)
    counts = numpy.zeros((batch,), numpy.int32)
    metas = []
    for b in range(batch):
        bx, cl, vis = hard_geometry(rng, size, class_num, max_boxes)
        n = len(bx)
        counts[b] = n
        boxes[b, :n] = bx
        classes[b, :n] = cl
        keep = vis > 0.0
        metas.append({"bbox": [(x0 / size, y0 / size, x1 / size, y1 / size)
                               for x0, y0, x1, y1 in bx[keep].tolist()],
                      "class": cl[keep].tolist(),
                      "visible_frac": vis[keep].tolist()})
    return metas, boxes, classes, counts


def make_render_fn(batch, size, class_num, max_boxes=5):
    """Traceable uint8 batch rasterizer (un-jitted; see build_renderer).

    render(key, boxes_px (B,K,4) i32 [x0,y0,x1,y1], classes (B,K) i32,
    counts (B,) i32) -> (B,3,size,size) uint8.  Boxes are painted in index
    order (later boxes overwrite earlier, like the host generator); slots
    k >= counts[b] are ignored.  K selects over the full image are VPU
    noise next to a training step (~40M elementwise ops at K=5, b8, 512^2).

    Returned un-jitted so it can be traced INTO a larger jit — the
    Trainer's ``input_fn`` fuses it into the train step, removing the
    separate render dispatch + host key-split of the round-2 protocol.
    """
    palette = jnp.asarray(numpy.array([class_color(c)
                                       for c in range(class_num)],
                                      numpy.float32))

    def render(key, boxes_px, classes, counts):
        kb, kj = jax.random.split(key)
        img = jax.random.uniform(kb, (batch, 3, size, size),
                                 jnp.float32, 0.0, 0.2)
        jit_c = jax.random.uniform(kj, (batch, max_boxes, 3),
                                   jnp.float32, -0.05, 0.05)
        colors = palette[classes] + jit_c              # (B, K, 3)
        yy = jnp.arange(size)[:, None]                 # (S, 1)
        xx = jnp.arange(size)[None, :]                 # (1, S)
        for k in range(max_boxes):
            x0 = boxes_px[:, k, 0][:, None, None]
            y0 = boxes_px[:, k, 1][:, None, None]
            x1 = boxes_px[:, k, 2][:, None, None]
            y1 = boxes_px[:, k, 3][:, None, None]
            live = (k < counts)[:, None, None]
            mask = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1) &
                    live)                              # (B, S, S)
            img = jnp.where(mask[:, None], colors[:, k, :, None, None], img)
        return (img * 255.0).clip(0.0, 255.0).astype(jnp.uint8)

    return render


def build_renderer(batch, size, class_num, max_boxes=5):
    """Jitted standalone rasterizer (see make_render_fn for semantics)."""
    return _keepalive(jax.jit(make_render_fn(batch, size, class_num,
                                             max_boxes)))
