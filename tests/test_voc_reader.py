"""Pascal VOC reader end-to-end on a synthetic VOCdevkit tree."""
import os

from PIL import Image

import denet_tpu.data as dataset
from denet_tpu.data import pascal_voc


def make_vocdevkit(root, year="VOC2007", n_images=3):
    jpeg = os.path.join(root, year, "JPEGImages")
    anno = os.path.join(root, year, "Annotations")
    sets = os.path.join(root, year, "ImageSets", "Main")
    for d in (jpeg, anno, sets):
        os.makedirs(d)

    names = []
    for i in range(n_images):
        name = "%06d" % i
        names.append(name)
        Image.new("RGB", (48, 32), (120, 60, 30)).save(
            os.path.join(jpeg, name + ".jpg"))
        with open(os.path.join(anno, name + ".xml"), "w") as f:
            f.write("""<annotation><object><name>dog</name>
<difficult>%d</difficult><bndbox><xmin>9</xmin><ymin>9</ymin>
<xmax>25</xmax><ymax>25</ymax></bndbox></object></annotation>""" % (i == 2))

    with open(os.path.join(sets, "train.txt"), "w") as f:
        f.write("\n".join(names[:2]) + "\n")
    with open(os.path.join(sets, "test.txt"), "w") as f:
        f.write(names[2] + "\n")


def test_voc_reader_train_and_test(tmp_path):
    root = str(tmp_path)
    make_vocdevkit(root)

    data = dataset.load(root, "voc,2007-train,crop=16,scale=16",
                        is_training=True, thread_num=1)
    assert data.get_class_num() == 20
    assert data.subset_total_size == 2
    data.load_from_subset(0)
    assert len(data) == 2
    meta = data.data[0][2]
    assert meta["class"] == [pascal_voc.VOC_CLASS_LABELS["dog"]]
    # -1 MATLAB offset then remapped into crop-normalized coords
    assert all(0.0 <= v <= 1.0 for v in meta["bbox"][0])

    test = dataset.load(root, "voc,2007-test,crop=16,scale=16",
                        is_training=False, thread_num=1)
    assert test.subset_total_size == 1
    test.load_from_subset(0)
    assert test.data[0][2]["image"]["difficult"] == [True]

    x, metas, size = data.export(2)
    assert x.shape == (2, 3, 16, 16)


def test_voc_comp4_export(tmp_path):
    root = str(tmp_path)
    detections = [{
        "detections": [(0.7, 11, (0.1, 0.2, 0.5, 0.6))],
        "meta": {"scale": (1.0, 1.0), "offset": (0, 0),
                 "image_size": (48, 32),
                 "image": {"fname": "000001.jpg"}}}]
    inv = {v: k for k, v in pascal_voc.VOC_CLASS_LABELS.items()}
    pascal_voc.export_detections(root, detections, 16, 16, inv)
    fname = os.path.join(root, "comp4_det_test_dog.txt")
    assert os.path.isfile(fname)
    line = open(fname).read().split()
    assert line[0] == "000001"
    assert abs(float(line[1]) - 0.7) < 1e-6
