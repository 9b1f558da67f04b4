"""Model zoo construction tests: descs parse and shapes line up."""
import numpy
import pytest

from denet_tpu.core.model import Model
from denet_tpu.models import zoo


def build(desc, data_shape, class_num=10, batch_size=2):
    numpy.random.seed(1)
    model = Model()
    model.batch_size = batch_size
    model.class_num = class_num
    model.class_labels = {str(i): i for i in range(class_num)}
    model.build(desc, data_shape, activation="relu", border_mode="half",
                weight_init=["he-forward"])
    return model


def test_simple_cifar10_desc():
    model = build(zoo.SIMPLE_CIFAR10, (3, 32, 32))
    assert model.get_output_shape() == (2, 10)


def test_resnet34_imagenet_desc():
    model = build(zoo.RESNET34_IMAGENET, (3, 224, 224), class_num=1000)
    assert model.get_output_shape() == (2, 1000)
    # ResNet-34 has ~21.8M params for 1000 classes
    n = model.get_parameter_num()
    assert 21e6 < n < 23e6


def test_resnet101_imagenet_desc():
    model = build(zoo.RESNET101_IMAGENET, (3, 224, 224), class_num=1000)
    assert model.get_output_shape() == (2, 1000)
    n = model.get_parameter_num()
    assert 42e6 < n < 46e6


@pytest.mark.parametrize("variant", ["std", "skip", "wide"])
def test_denet34_descs_build(variant):
    model = build(zoo.denet34(variant), (3, 128, 128), class_num=20)
    types = [l.type_name for l in model.layers]
    assert "denet-corner" in types
    assert "denet-sparse" in types
    assert types[-1] == "denet-detect"
    if variant == "wide":
        assert "split" in types
        assert model.use_split_mode


def test_denet34_v2_desc_build():
    model = build(zoo.denet34("skip", v2=True), (3, 128, 128), class_num=20)
    detect = model.layers[-1]
    assert detect.use_jointfit
    assert detect.use_bounded_iou
    sparse = [l for l in model.layers if l.type_name == "denet-sparse"][0]
    assert sparse.nms_threshold == 0.7   # corner clustering on
    assert sparse.local_max == 2


def test_wide_v2_sample_count():
    """v2 ("c1") wide models sample 24x24=576 RoIs vs v1's 48x48=2304:
    reference README.md:118-148 (wide v2 80 Hz ~= skip v1 82 Hz with 576
    RoIs; x768 recipe sets sample_num=36 = 24*768/512)."""
    for fam in (zoo.denet34, zoo.denet101):
        m1 = build(fam("wide"), (3, 128, 128), class_num=20)
        m2 = build(fam("wide", v2=True), (3, 128, 128), class_num=20)
        s1 = [l for l in m1.layers if l.type_name == "denet-sparse"][0]
        s2 = [l for l in m2.layers if l.type_name == "denet-sparse"][0]
        assert s1.sample_num == 48 and s2.sample_num == 24
        assert s2.nms_threshold == 0.7 and s2.local_max == 2


def test_denet101_desc_build():
    model = build(zoo.denet101("skip"), (3, 128, 128), class_num=80)
    assert model.layers[-1].type_name == "denet-detect"


def test_denet34_skip_full_train_and_infer():
    """The flagship zoo desc (SKIPSRC.X trunk taps + skip head + DNC/DNS/DND)
    must train one step and run the fused inference path end-to-end."""
    import random
    from denet_tpu.train.trainer import Trainer
    random.seed(17)
    model = build(zoo.denet34("skip"), (3, 64, 64), class_num=3)
    trainer = Trainer(model, solver_mode="nesterov", seed=2)

    x = numpy.random.RandomState(0).uniform(
        0, 1, (2, 3, 64, 64)).astype(numpy.float32)
    metas = [{"bbox": [(0.2, 0.2, 0.7, 0.7)], "class": [b % 3]}
             for b in range(2)]
    cost, costs = trainer.train_step(x, metas, 0, 0, 0.01, [0.9, 0.999], 1e-4)
    assert numpy.isfinite(cost)
    assert len(costs) == 2

    results = model.layers[-1].get_detections(
        model, x, metas, {"prThreshold": 0.0001, "nmsThreshold": 0.5})
    assert len(results) == 2


def test_denet101_wide_x768_construction():
    """The 768x768 / 1296-RoI configuration from the baseline table
    (BASELINE.md: DeNet101 wide x768 v2) must build with consistent shapes."""
    desc = zoo.denet101("wide", v2=True)
    # x768 evaluation uses 1296 RoIs = 36^2 (README.md:133-135): bump DNS
    # (v2 zoo descs sample 24x24 at 512 — see zoo._denet_head)
    desc = [t.replace("DNS[10,24,", "DNS[10,36,") for t in desc]
    model = build(desc, (3, 768, 768), class_num=80, batch_size=1)
    sparse = [l for l in model.layers if l.type_name == "denet-sparse"][0]
    assert sparse.sample_num == 36
    assert sparse.sample_count == 1296
    detect = model.layers[-1]
    assert detect.use_jointfit and detect.use_bounded_iou
    # ~45M+ params (ResNet-101 trunk + wide head)
    assert model.get_parameter_num() > 40e6
