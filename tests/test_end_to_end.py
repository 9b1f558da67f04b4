"""Full-stack convergence test: train a mini DeNet detector on synthetic
colored-rectangle data and verify the VOC mAP — exercises target generation,
corner/detect costs, gradients through the sparse gather, the device corner
search + NMS inference path, and the mAP metric in one coherent loop.
(The reference's analogue is the end-to-end reproduction scripts,
SURVEY.md §4.)"""
import random

import numpy
import denet_tpu.utils.logging as logging
from denet_tpu.core.model import Model
from denet_tpu.data import pascal_voc
from denet_tpu.train.trainer import Trainer

SIZE = 64


def make_sample(rng):
    x = rng.uniform(0, 0.2, (3, SIZE, SIZE)).astype(numpy.float32)
    bboxes, classes = [], []
    for _ in range(rng.randint(1, 3)):
        w = rng.randint(16, 40)
        h = rng.randint(16, 40)
        x0 = rng.randint(0, SIZE - w)
        y0 = rng.randint(0, SIZE - h)
        cls = rng.randint(0, 2)
        color = [0.9, 0.1, 0.1] if cls == 0 else [0.1, 0.1, 0.9]
        for c in range(3):
            x[c, y0:y0 + h, x0:x0 + w] = color[c] + rng.uniform(-0.05, 0.05)
        bboxes.append((x0 / SIZE, y0 / SIZE, (x0 + w) / SIZE, (y0 + h) / SIZE))
        classes.append(cls)
    return x, {"bbox": bboxes, "class": classes}


def test_synthetic_detection_convergence():
    logging.init(level="warning")
    rng = numpy.random.RandomState(0)
    random.seed(0)
    numpy.random.seed(0)

    batch = 8
    model = Model()
    model.batch_size = batch
    model.class_num = 2
    model.class_labels = {"red": 0, "blue": 1}
    desc = ["C[16,3,2]", "BN", "A", "C[32,3,2]", "BN", "A",
            "DNC[24,1.0]", "DNS[3,8,0.01,0.1]",
            "C.B[96,1]", "BN", "A", "DND[0.5,1,1]"]
    model.build(desc, (3, SIZE, SIZE), border_mode="half",
                weight_init=["he-forward"])
    trainer = Trainer(model, solver_mode="nesterov", seed=1)

    for it in range(250):
        xs, metas = zip(*[make_sample(rng) for _ in range(batch)])
        cost, _ = trainer.train_step(numpy.stack(xs), list(metas), 0, it,
                                     0.02, [0.9, 0.999], 1e-4)
        assert numpy.isfinite(cost)

    detect_layer = model.layers[-1]
    detections = []
    for _ in range(6):
        xs, metas = zip(*[make_sample(rng) for _ in range(batch)])
        detections += detect_layer.get_detections(
            model, numpy.stack(xs), list(metas),
            {"prThreshold": 0.05, "nmsThreshold": 0.5})

    mean_ap = pascal_voc.get_precision(
        detections, 0.5, class_num=2, class_labels_inv={0: "red", 1: "blue"})
    # quick 250-step schedule reaches ~0.5 mAP; 0.3 guards regressions
    assert mean_ap > 0.3, "mAP %.3f below regression floor" % mean_ap
