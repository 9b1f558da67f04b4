"""Heavier CLI integration tests: mesh training CLI and the VOC detection
evaluation path end-to-end."""
import os

import numpy
from PIL import Image

import denet_tpu.core.model as model_mod
from denet_tpu.apps import predict as predict_app
from denet_tpu.apps import train_multi as train_multi_app
from tests.test_apps import make_dataset


def test_train_multi_cli_on_mesh(tmp_path, monkeypatch):
    """model-train-multi over the virtual 8-device CPU mesh: subset loop,
    double-buffered export, checkpointing, train.args persistence."""
    monkeypatch.chdir(str(tmp_path))
    train_dir = str(tmp_path / "train")
    make_dataset(train_dir, n_per_class=8)
    prefix = str(tmp_path / "out" / "model")
    os.makedirs(str(tmp_path / "out"))

    train_multi_app.main([
        "--train", train_dir, "--extension", "png",
        "--output-prefix", prefix, "--epochs", "2", "--batch-size", "8",
        "--devices", "4", "--solver", "sgd", "--learn-rate", "0.05",
        "--learn-momentum", "0.9", "--border-mode", "half", "--seed", "1",
        "--model-save-dt", "0",
        "--model-desc", "C[8,3]", "BN", "A", "P[2]", "R"])

    final = prefix + "_epoch001_final.mdl.gz"
    assert os.path.isfile(final)
    assert os.path.isfile("train.args")
    model = model_mod.load_from_file(final)
    assert model.class_num == 2


def train_toy_detector(tmp_path, class_labels, target_class, size=64):
    """Train a tiny detector on the synthetic red-rectangle pattern and save
    it as .mdl.gz."""
    import random
    from denet_tpu.core.model import Model
    from denet_tpu.train.trainer import Trainer

    rng = numpy.random.RandomState(7)
    random.seed(7)
    model = Model()
    model.batch_size = 2
    model.class_num = len(class_labels)
    model.class_labels = dict(class_labels)
    desc = ["C[16,3,2]", "BN", "A", "C[16,3,2]", "BN", "A",
            "DNC[16,100]", "DNS[2,4,0.01,0.1]", "C.B[32,1]", "BN", "A",
            "DND[0.5,1,1]"]
    model.build(desc, (3, size, size), border_mode="half",
                weight_init=["he-forward"])
    trainer = Trainer(model, solver_mode="nesterov", seed=1)
    gt = (12 / size, 16 / size, (12 + 28) / size, (16 + 24) / size)
    for it in range(120):
        xs = rng.randint(0, 40, (2, 3, size, size)).astype(numpy.float32) / 255
        for b in range(2):
            xs[b, 0, 16:40, 12:40] = 0.78
            xs[b, 1:, 16:40, 12:40] = 0.16
        metas = [{"bbox": [gt], "class": [class_labels[target_class]]}
                 for _ in range(2)]
        trainer.train_step(xs, metas, 0, it, 0.02, [0.9, 0.999], 0.0)

    mdl = str(tmp_path / ("detector_%d.mdl.gz" % len(class_labels)))
    model_mod.save_to_file(model, mdl)
    return mdl


def make_voc_detect_setup(tmp_path):
    """Synthetic VOCdevkit with colored-rectangle objects + a tiny trained
    detection model saved as .mdl.gz."""
    from denet_tpu.data import pascal_voc

    rng = numpy.random.RandomState(0)

    root = str(tmp_path / "VOCdevkit")
    jpeg = os.path.join(root, "VOC2007", "JPEGImages")
    anno = os.path.join(root, "VOC2007", "Annotations")
    sets = os.path.join(root, "VOC2007", "ImageSets", "Main")
    for d in (jpeg, anno, sets):
        os.makedirs(d)

    size = 64
    names = []
    for i in range(4):
        name = "%06d" % i
        names.append(name)
        px = rng.randint(0, 40, (size, size, 3)).astype(numpy.uint8)
        x0, y0, w, h = 12, 16, 28, 24
        px[y0:y0 + h, x0:x0 + w] = (200, 40, 40)
        Image.fromarray(px).save(os.path.join(jpeg, name + ".jpg"))
        with open(os.path.join(anno, name + ".xml"), "w") as f:
            f.write("""<annotation><object><name>car</name>
<difficult>0</difficult><bndbox><xmin>%d</xmin><ymin>%d</ymin>
<xmax>%d</xmax><ymax>%d</ymax></bndbox></object></annotation>""" % (
                x0 + 1, y0 + 1, x0 + w + 1, y0 + h + 1))
    with open(os.path.join(sets, "test.txt"), "w") as f:
        f.write("\n".join(names) + "\n")

    mdl = train_toy_detector(tmp_path, pascal_voc.VOC_CLASS_LABELS, "car")
    return root, mdl


def test_predict_detect_voc_cli(tmp_path, monkeypatch):
    monkeypatch.chdir(str(tmp_path))
    root, mdl = make_voc_detect_setup(tmp_path)

    predict_app.main([
        "--model", mdl, "--input", root,
        "--extension", "voc,2007-test,crop=64,scale=64",
        "--batch-size", "2", "--predict-mode", "detect,voc,image",
        "--results", str(tmp_path / "results" / "out"),
        "--params", "prThreshold=0.0001,nmsThreshold=0.5"])

    # raw detections + comp4 export files written
    assert os.path.isfile(str(tmp_path / "results" / "detections.json"))
    comp4 = [f for f in os.listdir(str(tmp_path / "results"))
             if f.startswith("comp4_det_test_")]
    assert len(comp4) >= 1
    # "image" submode renders bbox-annotated PNGs per input
    pngs = [f for f in os.listdir(str(tmp_path)) if f.endswith("_dets.png")]
    assert len(pngs) == 4


def test_predict_detect_mscoco_cli(tmp_path, monkeypatch):
    """detect,mscoco mode: COCO reader + results-JSON export with coordinate
    un-mapping."""
    import json
    monkeypatch.chdir(str(tmp_path))
    root = str(tmp_path / "coco")
    os.makedirs(os.path.join(root, "annotations"))
    os.makedirs(os.path.join(root, "val2014"))

    size = 64
    rng = numpy.random.RandomState(0)
    images, anns = [], []
    for i in range(2):
        px = rng.randint(0, 40, (size, size, 3)).astype(numpy.uint8)
        px[16:40, 12:40] = (200, 40, 40)
        Image.fromarray(px).save(os.path.join(root, "val2014", "im%d.jpg" % i))
        images.append({"file_name": "im%d.jpg" % i, "id": 100 + i})
        anns.append({"image_id": 100 + i, "category_id": 3,
                     "bbox": [12, 16, 28, 24]})
    with open(os.path.join(root, "annotations", "instances_val2014.json"),
              "w") as f:
        json.dump({"categories": [{"id": 3, "name": "car"}],
                   "images": images, "annotations": anns}, f)

    mdl = train_toy_detector(tmp_path, {"car": 0}, "car")
    predict_app.main([
        "--model", mdl, "--input", root,
        "--extension", "mscoco,2014-val,crop=64,scale=64",
        "--batch-size", "2", "--predict-mode", "detect,mscoco",
        "--results", str(tmp_path / "coco_results" / "out"),
        "--params", "prThreshold=0.0001,nmsThreshold=0.5"])

    out_json = str(tmp_path / "coco_results" / "out.json")
    assert os.path.isfile(out_json)
    results = json.load(open(out_json))
    assert isinstance(results, list)
    if results:
        r = results[0]
        assert set(r) == {"image_id", "category_id", "bbox", "score"}
        assert r["image_id"] in (100, 101)


def test_predict_multicrop_cli(tmp_path, monkeypatch):
    """10-crop multicrop evaluation through the ImageNet reader."""
    monkeypatch.chdir(str(tmp_path))
    root = str(tmp_path / "imnet" / "val")
    rng = numpy.random.RandomState(0)
    for cls, color in [("n01", (200, 30, 30)), ("n02", (30, 30, 200))]:
        d = os.path.join(root, cls)
        os.makedirs(d)
        for i in range(2):
            px = rng.randint(0, 40, (24, 24, 3)) + numpy.array(color)
            Image.fromarray(numpy.clip(px, 0, 255).astype(numpy.uint8)).save(
                os.path.join(d, "%d.JPEG" % i))
    with open(str(tmp_path / "imnet" / "class_labels.txt"), "w") as f:
        f.write("0 n01\n1 n02\n")

    # tiny classifier
    from denet_tpu.core.model import Model
    numpy.random.seed(2)
    model = Model()
    model.batch_size = 10
    model.class_num = 2
    model.class_labels = {"n01": 0, "n02": 1}
    model.build(["C[8,3]", "BN", "A", "R"], (3, 16, 16), border_mode="half",
                weight_init=["he-forward"])
    mdl = str(tmp_path / "cls.mdl.gz")
    model_mod.save_to_file(model, mdl)

    predict_app.main([
        "--model", mdl, "--input", root,
        "--extension", "imagenet,crop=16,scale=20,multicrop",
        "--batch-size", "10", "--predict-mode", "multicrop",
        "--results", str(tmp_path / "mc")])


def test_train_multi_restart_resumes_trajectory(tmp_path, monkeypatch):
    """End-to-end restart (reference train_multi.py:242-268,324-331): run 2
    epochs; separately, kill the run right after epoch 0's checkpoint, then
    relaunch with --restart and assert it resumes at epoch 1 and reproduces
    the uninterrupted run's final parameters exactly (sgd, momentum 0, so
    the lost solver slots are restart-invariant)."""
    train_dir = str(tmp_path / "train")
    make_dataset(train_dir, n_per_class=8)

    def run_args(prefix):
        return ["--train", train_dir, "--extension", "png",
                "--output-prefix", prefix, "--epochs", "2",
                "--batch-size", "8", "--devices", "4", "--solver", "sgd",
                "--learn-rate", "0.05", "--learn-momentum", "0",
                "--border-mode", "half", "--seed", "1", "--model-save-dt", "0",
                "--model-desc", "C[8,3]", "BN", "A", "P[2]", "R"]

    # uninterrupted 2-epoch run
    dir_a = tmp_path / "a"
    os.makedirs(str(dir_a / "out"))
    monkeypatch.chdir(str(dir_a))
    train_multi_app.main(run_args(str(dir_a / "out" / "model")))
    ref = model_mod.load_from_file(str(dir_a / "out" /
                                       "model_epoch001_final.mdl.gz"))

    # interrupted run: die immediately after epoch 0's final checkpoint
    dir_b = tmp_path / "b"
    os.makedirs(str(dir_b / "out"))
    monkeypatch.chdir(str(dir_b))
    real_save = model_mod.save_to_file

    def killing_save(model, fname):
        real_save(model, fname)
        if fname.endswith("_epoch000_final.mdl.gz"):
            raise KeyboardInterrupt("simulated kill")

    monkeypatch.setattr(train_multi_app.model_mod, "save_to_file",
                        killing_save)
    try:
        train_multi_app.main(run_args(str(dir_b / "out" / "model")))
        raise AssertionError("run should have been killed")
    except KeyboardInterrupt:
        pass
    monkeypatch.setattr(train_multi_app.model_mod, "save_to_file", real_save)
    assert os.path.isfile(str(dir_b / "out" / "model_epoch000_final.mdl.gz"))
    assert not os.path.isfile(str(dir_b / "out" /
                                  "model_epoch001_final.mdl.gz"))

    # restart: resumes at epoch 1 (train.args + newest checkpoint)
    train_multi_app.main(["--restart"])
    resumed = model_mod.load_from_file(str(dir_b / "out" /
                                           "model_epoch001_final.mdl.gz"))

    assert resumed.iteration == ref.iteration
    for p_ref, p_res in zip(ref.params, resumed.params):
        for key in p_ref:
            if key == "layers":
                continue
            numpy.testing.assert_allclose(numpy.asarray(p_res[key]),
                                          numpy.asarray(p_ref[key]),
                                          atol=1e-6)


def make_voc_train_test_tree(tmp_path, n_train=8, n_test=4, size=64):
    """VOCdevkit with 2007 train + test splits of red-rectangle scenes."""
    rng = numpy.random.RandomState(3)
    root = str(tmp_path / "VOCdevkit")
    jpeg = os.path.join(root, "VOC2007", "JPEGImages")
    anno = os.path.join(root, "VOC2007", "Annotations")
    sets = os.path.join(root, "VOC2007", "ImageSets", "Main")
    for d in (jpeg, anno, sets):
        os.makedirs(d, exist_ok=True)

    def write_image(name):
        px = rng.randint(0, 40, (size, size, 3)).astype(numpy.uint8)
        x0, y0 = int(rng.randint(4, 20)), int(rng.randint(4, 20))
        w, h = int(rng.randint(20, 32)), int(rng.randint(20, 32))
        px[y0:y0 + h, x0:x0 + w] = (200, 40, 40)
        Image.fromarray(px).save(os.path.join(jpeg, name + ".jpg"))
        with open(os.path.join(anno, name + ".xml"), "w") as f:
            f.write("""<annotation><object><name>car</name>
<difficult>0</difficult><bndbox><xmin>%d</xmin><ymin>%d</ymin>
<xmax>%d</xmax><ymax>%d</ymax></bndbox></object></annotation>""" % (
                x0 + 1, y0 + 1, x0 + w + 1, y0 + h + 1))

    names = ["%06d" % i for i in range(n_train + n_test)]
    for name in names:
        write_image(name)
    with open(os.path.join(sets, "train.txt"), "w") as f:
        f.write("\n".join(names[:n_train]) + "\n")
    with open(os.path.join(sets, "test.txt"), "w") as f:
        f.write("\n".join(names[n_train:]) + "\n")
    return root


def test_train_then_predict_detect_voc_cli(tmp_path, monkeypatch):
    """The full reference detection workflow through the real CLI flag
    surface (VERDICT round-2 item 7): bin/model-train on a VOC tree (tiny
    detect model, 40 epochs) -> bin/model-predict --predict-mode detect,voc
    -> comp4 export + VOC mAP — guarding the CLI/flag/format path for the
    day real datasets are available (reference call stack SURVEY §3.3,
    denet/model/predict.py:166-236)."""
    from denet_tpu.apps import train as train_app

    monkeypatch.chdir(str(tmp_path))
    root = make_voc_train_test_tree(tmp_path)
    prefix = str(tmp_path / "out" / "model")
    os.makedirs(str(tmp_path / "out"))

    train_app.main([
        "--train", root,
        "--extension", "voc,2007-train,crop=64,scale=64,checkOnscreen=0.3",
        "--output-prefix", prefix, "--epochs", "40", "--batch-size", "4",
        "--solver", "nesterov", "--learn-rate", "0.02",
        "--border-mode", "half", "--seed", "3",
        "--model-desc", "C[16,3,2]", "BN", "A", "C[16,3,2]", "BN", "A",
        "DNC[16,100]", "DNS[2,4,0.01,0.1]", "C.B[32,1]", "BN", "A",
        "DND[0.5,1,1]"])

    mdl = prefix + "_epoch039.mdl.gz"
    assert os.path.isfile(mdl)
    model = model_mod.load_from_file(mdl)
    assert model.layers[-1].type_name == "denet-detect"

    predict_app.main([
        "--model", mdl, "--input", root,
        "--extension", "voc,2007-test,crop=64,scale=64",
        "--batch-size", "4", "--predict-mode", "detect,voc",
        "--results", str(tmp_path / "results" / "out"),
        "--params", "prThreshold=0.0001,nmsThreshold=0.5"])

    # raw detections + comp4 files + the mAP path all executed
    assert os.path.isfile(str(tmp_path / "results" / "detections.json"))
    comp4 = [f for f in os.listdir(str(tmp_path / "results"))
             if f.startswith("comp4_det_test_")]
    assert len(comp4) >= 1
