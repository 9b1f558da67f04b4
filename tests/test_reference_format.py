"""Import fixtures written in the reference's exact JSON v3 schema.

Builds a .mdl.gz by hand with the reference's key names and layer nesting
(conv weight OIHW under "weight", BN stdinv under "std", resnet sublayer
lists including the "initial" entry) and verifies the model loads and runs.
"""
import gzip
import json
import os

import numpy

import denet_tpu.core.model as model_mod
from denet_tpu.utils.json_util import numpy_to_json


def write_mdl(fname, json_obj):
    with gzip.open(fname, "wt") as f:
        json.dump(json_obj, f, default=numpy_to_json)


def conv_json(out_ch, in_ch, k, use_bias=False, border="half", stride=(1, 1)):
    rng = numpy.random.RandomState(out_ch + in_ch + k)
    return {"type": "conv",
            "layers": [],
            "shape": [out_ch, in_ch, k, k],
            "stride": list(stride),
            "border": border,
            "enabled": True,
            "useBias": use_bias,
            "bias": rng.normal(0, 0.1, (out_ch,)).astype(numpy.float32)
            if use_bias else None,
            "weight": rng.normal(0, 0.1, (out_ch, in_ch, k, k)).astype(
                numpy.float32)}


def bn_json(ch):
    rng = numpy.random.RandomState(ch)
    return {"type": "batchnorm", "layers": [], "momentum": 0.9, "eps": 1e-5,
            "mean": rng.normal(0, 0.1, (ch,)).astype(numpy.float32),
            "std": (1.0 + rng.uniform(0, 0.1, (ch,))).astype(numpy.float32),
            "gamma": numpy.ones((ch,), numpy.float32),
            "bias": numpy.zeros((ch,), numpy.float32),
            "renormMaxR": 1.0, "renormMaxD": 0.0, "renormMaxIt": 10,
            "enabled": True}


def test_reference_schema_classifier(tmp_path):
    json_obj = {
        "classifierType": "CNN",
        "classLabels": {"a": 0, "b": 1, "c": 2},
        "classNum": 3,
        "dataShape": [3, 16, 16],
        "date": "2017-01-01 00:00:00",
        "user": "reference",
        "version": 3,
        "layers": [
            conv_json(8, 3, 3),
            bn_json(8),
            {"type": "activation", "layers": [], "activation": "relu"},
            {"type": "pool", "layers": [], "mode": "max", "size": [2, 2],
             "stride": [2, 2], "pad": [0, 0], "ignoreBorder": True},
            conv_json(3, 8, 8, use_bias=False, border="valid"),
            {"type": "regression", "layers": [], "valid": []},
        ],
    }
    fname = os.path.join(str(tmp_path), "ref.mdl.gz")
    write_mdl(fname, json_obj)

    model = model_mod.load_from_file(fname, batch_size=2)
    assert [l.type_name for l in model.layers[1:]] == [
        "conv", "batchnorm", "activation", "pool", "conv", "regression"]
    # weights round-tripped bit-exact
    assert numpy.allclose(model.params[1]["weight"],
                          json_obj["layers"][0]["weight"])
    assert numpy.allclose(model.state[2]["stdinv"],
                          json_obj["layers"][1]["std"])

    x = numpy.random.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
    pr = model.predict_output_step(x)
    assert pr.shape == (2, 3)
    assert numpy.allclose(pr.sum(axis=1), 1.0, atol=1e-4)


def test_reference_schema_resnet_with_initial_entry(tmp_path):
    """Resnet sublayer lists in the reference include the leading "initial"
    layer (resnet export walks self.layers, denet/layer/resnet.py:157-167)."""
    ch = 4
    resnet = {
        "type": "resnet", "shape": [ch, ch, 3, 3], "stride": [1, 1],
        "bottleneck": 0, "bnParam": {"enabled": True},
        "activation": "relu", "version": "pre-activation",
        "layers": [
            {"type": "initial", "layers": []},
            bn_json(ch),
            {"type": "activation", "layers": [], "activation": "relu"},
            conv_json(ch, ch, 3),
            bn_json(ch),
            {"type": "activation", "layers": [], "activation": "relu"},
            conv_json(ch, ch, 3),
        ],
    }
    json_obj = {
        "classifierType": "CNN", "classLabels": {"x": 0, "y": 1},
        "classNum": 2, "dataShape": [3, 8, 8], "version": 3,
        "layers": [conv_json(ch, 3, 3), resnet,
                   conv_json(2, ch, 8, border="valid"),
                   {"type": "regression", "layers": [], "valid": []}],
    }
    fname = os.path.join(str(tmp_path), "refres.mdl.gz")
    write_mdl(fname, json_obj)
    model = model_mod.load_from_file(fname, batch_size=2)
    rsn = model.layers[2]
    assert rsn.type_name == "resnet"
    # sublayer conv weight loaded from the json entry after initial/bn/act
    assert numpy.allclose(model.params[2]["layers"][3]["weight"],
                          resnet["layers"][3]["weight"])
    x = numpy.random.uniform(0, 1, (2, 3, 8, 8)).astype(numpy.float32)
    pr = model.predict_output_step(x)
    assert pr.shape == (2, 2)


def test_reference_schema_detection_layers(tmp_path):
    """denet-corner/sparse/detect entries with the reference's field names."""
    f = 8
    dnc = {"type": "denet-corner",
           "layers": [{"type": "initial", "layers": []},
                      conv_json(4 + 16, f, 1, use_bias=True, border="valid")],
           "sampleFeat": 16, "useCenter": False, "costFactor": 1.0,
           "dropout": 0.0}
    dns = {"type": "denet-sparse", "layers": [], "gridSize": 2,
           "sampleNum": 4, "sampleGT": True, "localMax": 0,
           "cornerThreshold": 0.01, "randomSample": 0.1,
           "nmsThreshold": 1.0, "version": "v2"}
    dnd = {"type": "denet-detect",
           "layers": [conv_json(3, 2 * 2 * 16 + 2, 1, use_bias=True,
                                border="valid")],
           "costFactor": 1.0, "bboxFactor": 0.0, "fitnessFactor": 0.0,
           "useJointFitness": False, "useBoundedIoU": False,
           "classNum": 2, "overlapThreshold": 0.5}
    json_obj = {
        "classifierType": "CNN", "classLabels": {"x": 0, "y": 1},
        "classNum": 2, "dataShape": [3, 16, 16], "version": 3,
        "layers": [conv_json(f, 3, 3), dnc, dns, dnd],
    }
    fname = os.path.join(str(tmp_path), "refdet.mdl.gz")
    write_mdl(fname, json_obj)
    model = model_mod.load_from_file(fname, batch_size=2)
    types = [l.type_name for l in model.layers[1:]]
    assert types == ["conv", "denet-corner", "denet-sparse", "denet-detect"]
    detect = model.layers[-1]
    assert detect.class_num == 2
    # scalar overlapThreshold normalizes to a pair
    assert detect.overlap_threshold == (0.5, 0.5)
