"""Data subsystem tests: readers, augmentation bbox remapping, VOC mAP."""
import json
import os
import random

import numpy
import pytest
from PIL import Image

import denet_tpu.data as dataset
from denet_tpu.data import augment
from denet_tpu.data.image_loader import load_sample_proc
from denet_tpu.data import pascal_voc


def make_image(path, size=(32, 24), color=(255, 0, 0)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", size, color).save(path)


def test_dataset_from_dir(tmp_path):
    root = str(tmp_path / "ds")
    for cls, color in [("cat", (255, 0, 0)), ("dog", (0, 255, 0))]:
        for i in range(3):
            make_image(os.path.join(root, cls, "%i.png" % i), (8, 8), color)
    data = dataset.load(root, "png", is_training=True)
    assert len(data) == 6
    assert data.get_class_num() == 2
    x, metas, size = data.export(batch_size=4)
    assert x.shape == (8, 3, 8, 8)  # padded to batch multiple
    assert size == 6
    assert x.max() <= 1.0


def test_dataset_from_array(tmp_path):
    root = str(tmp_path)
    numpy.save(os.path.join(root, "_data.npy"),
               numpy.random.uniform(0, 1, (5, 3, 8, 8)).astype(numpy.float32))
    numpy.save(os.path.join(root, "_labels.npy"),
               numpy.array([0, 1, 0, 1, 1]))
    data = dataset.load(root, "npy")
    assert len(data) == 5
    assert data.get_class_num() == 2
    x, metas, size = data.export(2)
    assert x.shape == (6, 3, 8, 8)


def test_scale_modes():
    im = Image.new("RGB", (40, 20))
    s, sx, sy = augment.scale(im.copy(), 10, "small")
    assert s.size == (20, 10)
    s, sx, sy = augment.scale(im.copy(), 10, "large")
    assert s.size == (10, 5)
    s, sx, sy = augment.scale(im.copy(), 10, "warp")
    assert s.size == (10, 10)


def test_center_and_multi_crop():
    im = Image.new("RGB", (30, 30))
    c, dx, dy = augment.center_crop(im, 10)
    assert c.size == (10, 10) and dx == 10 and dy == 10
    crops, ox, oy, mirror = augment.multi_crop_mirror(im, 10)
    assert len(crops) == 10 and sum(mirror) == 5


def test_bbox_remap_identity(tmp_path):
    """With no scaling/cropping, bboxes pass through normalized by crop."""
    fname = str(tmp_path / "im.png")
    make_image(fname, (16, 16))
    image = {"fname": fname, "bboxs": [(1, (4, 4, 12, 12))], "class": 0}
    args = {"image": image, "isTraining": False, "scale": 16, "crop": 16,
            "checkOnscreen": 0.0, "seed": 1}
    data = load_sample_proc(args)
    assert len(data) == 1
    meta = data[0][2]
    assert meta["class"] == [1]
    assert numpy.allclose(meta["bbox"][0], (0.25, 0.25, 0.75, 0.75))


def test_bbox_remap_mirror(tmp_path):
    fname = str(tmp_path / "im.png")
    make_image(fname, (16, 16))
    image = {"fname": fname, "bboxs": [(0, (0, 0, 8, 16))], "class": 0}
    # training path, center mode, force mirror via seed search
    for seed in range(40):
        args = {"image": image, "isTraining": True, "scale": 16, "crop": 16,
                "cropMode": "center", "checkOnscreen": 0.0,
                "augmentMirror": True, "seed": seed}
        data = load_sample_proc(args)
        meta = data[0][2]
        if meta["mirror"]:
            assert numpy.allclose(meta["bbox"][0], (0.5, 0.0, 1.0, 1.0))
            return
    pytest.fail("never mirrored in 40 seeds")


def test_check_onscreen_filter(tmp_path):
    fname = str(tmp_path / "im.png")
    make_image(fname, (32, 32))
    # bbox mostly offscreen after crop to the right half
    image = {"fname": fname, "bboxs": [(0, (0, 0, 4, 32))], "class": 0}
    args = {"image": image, "isTraining": False, "scale": 32, "crop": 16,
            "checkOnscreen": 0.5, "seed": 1}
    data = load_sample_proc(args)
    # center crop offset (8,8): bbox maps to x [-0.5, -0.25] -> filtered
    assert data[0][2]["bbox"] == []


def test_multicrop_produces_10(tmp_path):
    fname = str(tmp_path / "im.png")
    make_image(fname, (24, 24))
    image = {"fname": fname, "bboxs": [], "class": 2}
    args = {"image": image, "isTraining": False, "scale": 20, "crop": 16,
            "multicrop": True, "checkOnscreen": 0.0, "seed": 1}
    data = load_sample_proc(args)
    assert len(data) == 10
    assert all(d[1].shape == (3, 16, 16) for d in data)


def test_photometric_and_colorspace():
    random.seed(0)
    numpy.random.seed(0)
    x = numpy.random.uniform(0, 1, (3, 8, 8)).astype(numpy.float32)
    y = augment.photometric(x.copy())
    assert y.shape == x.shape and not numpy.allclose(x, y)
    z = augment.colorspace(x.copy(), numpy.ones(3, numpy.float32),
                           numpy.eye(3, dtype=numpy.float32))
    assert z.shape == x.shape


def test_crop_modes_run(tmp_path):
    random.seed(3)
    im = Image.new("RGB", (60, 40))
    bboxs = [(10, 10, 30, 30)]
    for fn, args in [(augment.lenet_crop, (im, 16)),
                     (augment.resnet_crop, (im, 16)),
                     (augment.denet_crop, (im, 16, bboxs)),
                     (augment.ssd_crop, (im, 16, bboxs))]:
        out = fn(*args)
        assert out[0].size == (16, 16)


def test_voc_map_golden():
    """Canned detections: one perfect, one false positive."""
    detections = []
    # image 0: gt aeroplane at (0.1,0.1,0.5,0.5), detected perfectly
    detections.append({
        "detections": [(0.9, 0, (0.1, 0.1, 0.5, 0.5))],
        "meta": {"class": [0], "bbox": [(0.1, 0.1, 0.5, 0.5)],
                 "image": {"difficult": [False]}}})
    # image 1: gt bicycle, detection misses entirely
    detections.append({
        "detections": [(0.8, 1, (0.6, 0.6, 0.9, 0.9))],
        "meta": {"class": [1], "bbox": [(0.0, 0.0, 0.3, 0.3)],
                 "image": {"difficult": [False]}}})
    mean_ap = pascal_voc.get_precision(detections)
    # class 0 AP = 1.0, class 1 AP = 0, other 18 classes AP = 0
    assert abs(mean_ap - 1.0 / 20) < 1e-6


def test_voc_xml_parse(tmp_path):
    xml_text = """<annotation><object><name>cat</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>30</xmax><ymax>40</ymax></bndbox>
    </object></annotation>"""
    fname = str(tmp_path / "a.xml")
    with open(fname, "w") as f:
        f.write(xml_text)
    bboxs, difficult = pascal_voc.parse_voc_xml(fname, {"cat": 7})
    assert bboxs == [(7, (9, 19, 29, 39))]
    assert difficult == [False]


def test_mscoco_reader(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "annotations"))
    os.makedirs(os.path.join(root, "train2014"))
    make_image(os.path.join(root, "train2014", "im0.jpg"), (32, 32))
    ann = {"categories": [{"id": 5, "name": "cat"}, {"id": 9, "name": "dog"}],
           "images": [{"file_name": "im0.jpg", "id": 100}],
           "annotations": [{"image_id": 100, "category_id": 5,
                            "bbox": [4, 4, 8, 8]}]}
    with open(os.path.join(root, "annotations", "instances_train2014.json"),
              "w") as f:
        json.dump(ann, f)

    data = dataset.load(root, "mscoco,2014-train,crop=16,scale=16",
                        is_training=True, thread_num=1)
    assert data.get_class_num() == 2
    data.load_from_subset(0)
    assert len(data) == 1
    meta = data.data[0][2]
    assert meta["class"] == [0]
    assert meta["image"]["id"] == 100


def test_resize_and_distort_affine(tmp_path):
    root = str(tmp_path / "ds2")
    for i in range(2):
        make_image(os.path.join(root, "cls", "%i.png" % i), (16, 16))
    data = dataset.load(root, "png")
    data.resize((8, 8))
    assert data.get_data_shape() == (3, 8, 8)
    numpy.random.seed(0)
    data.distort_affine(dtheta=10, dscale=0.1, doffset=2, mirror=0.5)
    assert len(data) == 2
    x, metas, size = data.export(2)
    assert x.shape == (2, 3, 8, 8)


def test_semi_supervised_update():
    """DatasetAbstract.update(pr): partially-labelled samples take the
    predicted class ('max' mode) or a momentum-blended soft label
    (reference dataset/__init__.py:102-139)."""
    from denet_tpu.data import DatasetAbstract

    def make(partial_mode):
        d = DatasetAbstract()
        d.partial_mode = partial_mode
        d.class_labels = {"a": 0, "b": 1}
        x = numpy.zeros((3, 4, 4), dtype=numpy.float32)
        d.data = [("s0", x, {"class": 0, "partial": False}),
                  ("s1", x, {"class": 0, "partial": True,
                             "pr": [1.0, 0.0]})]
        return d

    pr = numpy.array([[0.9, 0.1], [0.2, 0.8]], dtype=numpy.float32)

    d = make("max")
    d.update(pr)
    assert d.data[0][2]["class"] == 0          # labelled sample untouched
    assert d.data[1][2]["class"] == 1          # partial takes argmax

    d = make("momentum,0.5")
    d.update(pr)
    m = d.data[1][2]
    assert numpy.allclose(m["pr"], [0.6, 0.4])  # 0.5*[1,0] + 0.5*[.2,.8]
    assert m["class"] == 0

    d = make("momentum-hard,0.5")
    d.update(pr)
    m = d.data[1][2]
    assert numpy.allclose(m["pr"], [0.5, 0.5])  # hard one-hot blended


def test_imagenet_localization_error():
    """Top-5 localization error metric (reference imagenet.py:159-180):
    correct if any of the 5 highest-scored detections matches a gt class
    with IoU > 0.5."""
    from denet_tpu.data.imagenet import get_localization_error

    gt = {"class": [3], "bbox": [(0.1, 0.1, 0.5, 0.5)]}
    hit = {"meta": gt, "detections": [
        (0.9, 3, (0.12, 0.1, 0.5, 0.52))]}          # right class, IoU>0.5
    wrong_cls = {"meta": gt, "detections": [
        (0.9, 2, (0.1, 0.1, 0.5, 0.5))]}            # perfect box, wrong class
    low_iou = {"meta": gt, "detections": [
        (0.9, 3, (0.6, 0.6, 0.9, 0.9))]}            # right class, no overlap
    beyond5 = {"meta": gt, "detections": [
        (0.9 - 0.1 * i, 9, (0, 0, 1, 1)) for i in range(5)] + [
        (0.1, 3, (0.1, 0.1, 0.5, 0.5))]}            # match ranked 6th

    assert get_localization_error([hit]) == 0.0
    assert get_localization_error([wrong_cls]) == 100.0
    assert get_localization_error([low_iou]) == 100.0
    assert get_localization_error([beyond5]) == 100.0
    assert get_localization_error([hit, wrong_cls]) == 50.0


def test_device_renderer_matches_host_semantics():
    """On-device synthetic rasterizer (synthetic_device.build_renderer):
    painted boxes are flat palette+jitter fills (later box wins), padded
    slots are ignored, background stays in the U(0,0.2) band — the same
    semantics as synthetic.make_uint8_batch's host painter."""
    import jax

    from denet_tpu.data.synthetic import class_color
    from denet_tpu.data.synthetic_device import build_renderer, make_gt_batch

    rng = numpy.random.RandomState(0)
    metas, boxes, classes, counts = make_gt_batch(rng, 4, 64, 80)
    assert len(metas) == 4 and boxes.shape == (4, 5, 4)
    for b in range(4):
        n = int(counts[b])
        assert metas[b]["bbox"][n - 1][2] == boxes[b, n - 1, 2] / 64.0

    render = build_renderer(4, 64, 80)
    img = numpy.asarray(render(jax.random.PRNGKey(1), boxes, classes,
                               counts))
    assert img.shape == (4, 3, 64, 64) and img.dtype == numpy.uint8
    checked = 0
    for b in range(4):
        n = int(counts[b])
        for k in range(n):
            x0, y0, x1, y1 = boxes[b, k]
            vis = numpy.ones((y1 - y0, x1 - x0), bool)
            for j in range(k + 1, n):     # later boxes paint over box k
                a0, b0, a1, b1 = boxes[b, j]
                ix0, iy0 = max(x0, a0), max(y0, b0)
                ix1, iy1 = min(x1, a1), min(y1, b1)
                if ix1 > ix0 and iy1 > iy0:
                    vis[iy0 - y0:iy1 - y0, ix0 - x0:ix1 - x0] = False
            if not vis.any():
                continue
            col = class_color(int(classes[b, k]))
            for c in range(3):
                vals = img[b, c, y0:y1, x0:x1][vis]
                # one scalar color per (box, channel): exact flat fill
                assert vals.max() == vals.min()
                assert abs(vals[0] / 255.0 - col[c]) <= 0.0502
            checked += 1
    assert checked >= 4

    # counts=0 disables every slot: pure background, trunc(255*U(0,0.2))<=51
    img0 = numpy.asarray(render(jax.random.PRNGKey(2), boxes, classes,
                                numpy.zeros((4,), numpy.int32)))
    assert img0.max() <= 51


def test_hard_distribution_properties():
    """Hard synthetic distribution (round-3 graded benchmark): scale
    extremes down to 8px sides, aspect ratios to 1:4, a crowded mode,
    border truncation, and exact painter's-algorithm visibility."""
    from denet_tpu.data.synthetic import hard_geometry, make_sample_hard

    rng = numpy.random.RandomState(0)
    size = 256
    sides, aspects, counts, touching = [], [], [], 0
    for _ in range(60):
        boxes, classes, vis = hard_geometry(rng, size, 80)
        counts.append(len(boxes))
        assert len(classes) == len(boxes) == len(vis)
        for x0, y0, x1, y1 in boxes.tolist():
            w, h = x1 - x0, y1 - y0
            assert w >= 5 and h >= 5
            assert 0 <= x0 and x1 <= size and 0 <= y0 and y1 <= size
            sides += [w, h]
            aspects.append(w / h)
            if x0 == 0 or y0 == 0 or x1 == size or y1 == size:
                touching += 1
        assert vis.min() >= 0.0 and vis.max() <= 1.0

    sides = numpy.array(sides)
    assert sides.min() <= 12          # small extreme present
    assert sides.max() >= 0.8 * size  # near-full-frame present
    assert max(aspects) >= 3.0 and min(aspects) <= 1.0 / 3.0
    assert max(counts) >= 16 and min(counts) <= 6   # both modes hit
    assert touching >= 20             # truncation common

    # exact visibility vs brute-force owner rasterization
    rng = numpy.random.RandomState(7)
    boxes, classes, vis = hard_geometry(rng, 128, 10, max_boxes=12)
    owner = numpy.full((128, 128), -1, numpy.int32)
    for k, (x0, y0, x1, y1) in enumerate(boxes.tolist()):
        owner[y0:y1, x0:x1] = k
    for k, (x0, y0, x1, y1) in enumerate(boxes.tolist()):
        frac = (owner == k).sum() / ((x1 - x0) * (y1 - y0))
        assert abs(vis[k] - frac) < 1e-6

    # host sample: fully-hidden boxes dropped, visible_frac carried
    x, meta = make_sample_hard(numpy.random.RandomState(3), 128, 10)
    assert x.shape == (3, 128, 128)
    assert len(meta["bbox"]) == len(meta["class"]) == len(meta["visible_frac"])
    assert all(v > 0 for v in meta["visible_frac"])


def test_hard_gt_batch_device_consistency():
    """make_gt_batch_hard: geometry arrays carry every painted box; metas
    carry the visible gt in normalized coords; renderer accepts K=24."""
    import jax

    from denet_tpu.data.synthetic_device import (build_renderer,
                                                 make_gt_batch_hard)

    rng = numpy.random.RandomState(5)
    metas, boxes, classes, counts = make_gt_batch_hard(rng, 2, 64, 10)
    assert boxes.shape == (2, 24, 4)
    for b in range(2):
        assert len(metas[b]["bbox"]) <= int(counts[b])
        for (nx0, ny0, nx1, ny1) in metas[b]["bbox"]:
            assert 0.0 <= nx0 < nx1 <= 1.0 and 0.0 <= ny0 < ny1 <= 1.0

    render = build_renderer(2, 64, 10, max_boxes=24)
    img = numpy.asarray(render(jax.random.PRNGKey(0), boxes, classes, counts))
    assert img.shape == (2, 3, 64, 64) and img.dtype == numpy.uint8
