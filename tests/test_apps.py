"""End-to-end CLI app tests on synthetic data (the CIFAR10 minimum slice)."""
import os

import numpy
from PIL import Image

import denet_tpu.core.model as model_mod
from denet_tpu.apps import modify as modify_app
from denet_tpu.apps import predict as predict_app
from denet_tpu.apps import train as train_app
from denet_tpu.apps import update_bn as update_bn_app


def make_dataset(root, n_per_class=6, size=12):
    rng = numpy.random.RandomState(0)
    for cls, base in [("red", (200, 30, 30)), ("blue", (30, 30, 200))]:
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            px = rng.randint(0, 40, (size, size, 3)) + numpy.array(base)
            im = Image.fromarray(numpy.clip(px, 0, 255).astype(numpy.uint8))
            im.save(os.path.join(d, "%02i.png" % i))


def test_train_predict_modify_updatebn_cycle(tmp_path):
    train_dir = str(tmp_path / "train")
    test_dir = str(tmp_path / "test")
    make_dataset(train_dir)
    make_dataset(test_dir, n_per_class=2)
    prefix = str(tmp_path / "out" / "model")
    os.makedirs(str(tmp_path / "out"))

    train_app.main([
        "--train", train_dir, "--test", test_dir, "--extension", "png",
        "--output-prefix", prefix, "--epochs", "2", "--batch-size", "4",
        "--solver", "sgd", "--learn-rate", "0.05", "--learn-momentum", "0.9",
        "--border-mode", "half", "--seed", "1",
        "--compute-dtype", "bfloat16",
        "--model-desc", "C[8,3]", "BN", "A", "P[2]", "R"])

    final = prefix + "_epoch001_final.mdl.gz"
    assert os.path.isfile(final)
    assert os.path.isfile(prefix + "_epoch000.test")

    # predict single mode runs and reports errors
    predict_app.main([
        "--model", final, "--input", test_dir, "--extension", "png",
        "--batch-size", "4", "--predict-mode", "single",
        "--results", str(tmp_path / "results")])

    # model surgery: append a dropout layer, remove it again
    modified = str(tmp_path / "mod.mdl.gz")
    modify_app.main(["--input", final, "--output", modified,
                     "--layer-append", "D[0.3]"])
    m = model_mod.load_from_file(modified)
    assert m.layers[-1].type_name == "dropout"

    modify_app.main(["--input", modified, "--output", modified,
                     "--layer-remove", "1"])
    m = model_mod.load_from_file(modified)
    assert m.layers[-1].type_name == "regression"

    # update BN statistics over the training set
    bn_updated = str(tmp_path / "bn.mdl.gz")
    update_bn_app.main(["--model", final, "--output", bn_updated,
                        "--input", train_dir, "--extension", "png",
                        "--batch-size", "4"])
    m2 = model_mod.load_from_file(bn_updated)
    # BN stats should differ from the trained EMAs
    orig = model_mod.load_from_file(final)
    bn_index = [i for i, l in enumerate(m2.layers)
                if l.type_name == "batchnorm"][0]
    assert not numpy.allclose(m2.state[bn_index]["mean"],
                              orig.state[bn_index]["mean"])


def test_modify_bn_and_fuse(tmp_path):
    import random
    random.seed(0)
    numpy.random.seed(0)
    model = model_mod.Model()
    model.batch_size = 2
    model.class_num = 3
    model.class_labels = {"a": 0, "b": 1, "c": 2}
    model.build(["C[4,3]", "BN", "A", "R"], (3, 8, 8), border_mode="half",
                weight_init=["he-forward"])
    fname = str(tmp_path / "m.mdl.gz")
    model_mod.save_to_file(model, fname)

    out = str(tmp_path / "fused.mdl.gz")
    modify_app.main(["--input", fname, "--output", out, "--convert-bn-relu"])
    m = model_mod.load_from_file(out)
    types = [l.type_name for l in m.layers]
    assert "batchnorm-relu" in types
    assert "activation" not in types

    # modify-bn changes momentum/eps
    out2 = str(tmp_path / "bnmod.mdl.gz")
    modify_app.main(["--input", out, "--output", out2,
                     "--modify-bn", "1", "0.95", "1e-4"])
    m2 = model_mod.load_from_file(out2)
    bna = [l for l in m2.layers if l.type_name == "batchnorm-relu"][0]
    assert abs(bna.momentum - 0.95) < 1e-9
    assert abs(bna.eps - 1e-4) < 1e-12


def test_modify_merge_split(tmp_path):
    numpy.random.seed(0)
    model = model_mod.Model()
    model.batch_size = 2
    model.class_num = 2
    model.class_labels = {"a": 0, "b": 1}
    model.build(["C[4,3]", "SPLIT", "C[4,3]", "R"], (3, 8, 8),
                border_mode="half", weight_init=["he-forward"])
    assert model.use_split_mode
    fname = str(tmp_path / "m.mdl.gz")
    model_mod.save_to_file(model, fname)

    out = str(tmp_path / "merged.mdl.gz")
    modify_app.main(["--input", fname, "--output", out, "--merge"])
    m = model_mod.load_from_file(out)
    assert not m.use_split_mode


def test_train_multi_restart_args(tmp_path, monkeypatch):
    """Restart scans train.args + the newest *_epoch*.mdl.gz for the resume
    point (reference train_multi.py:242-268)."""
    import pickle
    from denet_tpu.apps import train_multi

    monkeypatch.chdir(str(tmp_path))
    parser = train_multi.build_parser()
    args = parser.parse_args(["--output-prefix", "./out/model"])
    os.makedirs("out")
    with open("train.args", "wb") as f:
        pickle.dump(args, f)

    for name in ("model_epoch000_subset002.mdl.gz",
                 "model_epoch001_subset003.mdl.gz"):
        with open(os.path.join("out", name), "w") as f:
            f.write("x")

    restored = train_multi.load_restart_args("train.args", args)
    assert restored.epoch_start == 1
    assert restored.subset_start == 3
    assert restored.model.endswith("model_epoch001_subset003.mdl.gz")

    # a final checkpoint resumes at the next epoch
    with open(os.path.join("out", "model_epoch002_final.mdl.gz"), "w") as f:
        f.write("x")
    restored = train_multi.load_restart_args("train.args", args)
    assert restored.epoch_start == 3
    assert restored.subset_start == 0


def test_modify_image_size_and_class_num(tmp_path):
    numpy.random.seed(1)
    model = model_mod.Model()
    model.batch_size = 2
    model.class_num = 3
    model.class_labels = {"a": 0, "b": 1, "c": 2}
    model.build(["C[4,3]", "BN", "A"], (3, 8, 8), border_mode="half",
                weight_init=["he-forward"])
    fname = str(tmp_path / "m.mdl.gz")
    model_mod.save_to_file(model, fname)

    out = str(tmp_path / "resized.mdl.gz")
    modify_app.main(["--input", fname, "--output", out,
                     "--image-size", "16", "16", "--class-num", "5"])
    m = model_mod.load_from_file(out, batch_size=2)
    assert tuple(m.data_shape) == (3, 16, 16)
    assert m.class_num == 5
    # shapes re-derive: forward at the new resolution works
    x = numpy.random.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
    from denet_tpu.layers.base import Ctx
    outputs, _ = m.forward(m.params, m.state, x, Ctx(train=False))
    assert outputs[len(m.layers) - 1].shape == (2, 4, 16, 16)


def test_convert_bn_relu_preserves_outputs(tmp_path):
    """BNA fusion is a pure graph rewrite: outputs must be identical."""
    from denet_tpu.layers.base import Ctx
    numpy.random.seed(4)
    model = model_mod.Model()
    model.batch_size = 2
    model.class_num = 2
    model.class_labels = {"a": 0, "b": 1}
    model.build(["C[4,3]", "BN", "A", "nRSN.O[1,8,3,2]", "R"], (3, 8, 8),
                border_mode="half", weight_init=["he-forward"])
    # non-trivial BN stats
    model.state[2]["mean"] = numpy.random.uniform(-1, 1, 4).astype(numpy.float32)
    model.state[2]["stdinv"] = numpy.random.uniform(0.5, 2, 4).astype(numpy.float32)
    fname = str(tmp_path / "m.mdl.gz")
    model_mod.save_to_file(model, fname)

    out = str(tmp_path / "fused.mdl.gz")
    modify_app.main(["--input", fname, "--output", out, "--convert-bn-relu"])
    fused = model_mod.load_from_file(out, batch_size=2)
    assert "bnrelu" in [l for l in fused.layers
                        if l.type_name == "resnet"][0].version

    x = numpy.random.uniform(0, 1, (2, 3, 8, 8)).astype(numpy.float32)
    y0, _ = model.forward(model.params, model.state, x, Ctx(train=False))
    y1, _ = fused.forward(fused.params, fused.state, x, Ctx(train=False))
    assert numpy.allclose(numpy.asarray(y0[len(model.layers) - 1]),
                          numpy.asarray(y1[len(fused.layers) - 1]), atol=1e-5)


def test_predict_segment_mode(tmp_path, capsys):
    """segment predict mode: per-pixel confusion stats, per-class TPR/FPR
    report, and predicted/true label-map PNG exports (reference
    predict.py:238-289)."""
    import os
    from denet_tpu.apps.predict import test_segment
    from denet_tpu.data import DatasetAbstract

    numpy.random.seed(4)
    model = model_mod.Model()
    model.batch_size = 2
    model.class_num = 2
    model.class_labels = {"bg": 0, "fg": 1}
    model.build(["C[2,1]"], (3, 8, 8), border_mode="half",
                weight_init=["he-forward"])

    data = DatasetAbstract()
    rng = numpy.random.RandomState(0)
    samples = []
    for i in range(2):
        x = rng.uniform(0, 1, (3, 8, 8)).astype(numpy.float32)
        label = (x[0] > 0.5).astype(numpy.int64)
        samples.append((str(tmp_path / ("seg%d" % i)), x,
                        {"label": label, "partial": False}))
    data.set_data(samples)

    test_segment("segment", model, data)
    out = capsys.readouterr().out
    assert "Overall Accuracy:" in out
    assert "TPR:" in out and "FPR:" in out
    for i in range(2):
        assert os.path.isfile(str(tmp_path / ("seg%d_predict.png" % i)))
        assert os.path.isfile(str(tmp_path / ("seg%d_true.png" % i)))
def test_detect_resize_and_roi_surgery(tmp_path):
    """The x768 recipe (reference README.md:140-148) on a tiny model:
    model-modify --image-size + --modify-layer denet-sparse sample_num=N,
    then detection inference runs at the new resolution/RoI count."""
    import numpy
    from tests.test_detection import build_detect_model

    numpy.random.seed(2)
    model = build_detect_model(use_bbox_reg=True)
    fname = str(tmp_path / "d.mdl.gz")
    model_mod.save_to_file(model, fname)

    out = str(tmp_path / "d768.mdl.gz")
    modify_app.main(["--input", fname, "--output", out,
                     "--image-size", "32", "32",
                     "--modify-layer", "denet-sparse", "sample_num=3"])
    m = model_mod.load_from_file(out, batch_size=2)
    assert tuple(m.data_shape) == (3, 32, 32)
    sparse = [l for l in m.layers if l.type_name == "denet-sparse"][0]
    assert sparse.sample_num == 3

    x = numpy.random.uniform(0, 1, (2, 3, 32, 32)).astype(numpy.float32)
    metas = [{"bbox": [(0.1, 0.1, 0.5, 0.6)], "class": [0]}] * 2
    dets = m.layers[-1].get_detections(m, x, metas, {"prThreshold": 1e-4,
                                                     "nmsThreshold": 0.5})
    assert len(dets) == 2
    for r in dets:
        for pr, cls, bbox in r["detections"]:
            assert 0 <= cls < m.class_num
            assert all(numpy.isfinite(v) for v in bbox)
