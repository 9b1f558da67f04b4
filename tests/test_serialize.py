"""Model JSON v3 (.mdl.gz) round-trip tests."""
import os

import numpy

import denet_tpu.core.model as model_mod
from denet_tpu.core.model import Model
from denet_tpu.layers.base import Ctx


def make_model(desc, data_shape=(3, 16, 16), batch_size=2, class_num=5):
    numpy.random.seed(7)
    model = Model()
    model.batch_size = batch_size
    model.class_num = class_num
    model.class_labels = {str(i): i for i in range(class_num)}
    model.build(desc, data_shape, activation="relu", border_mode="half",
                weight_init=["he-forward"])
    return model


def forward_out(model, x):
    import jax.numpy as jnp
    ctx = Ctx(train=False)
    outputs, _ = model.forward(model.params, model.state, jnp.asarray(x), ctx)
    return numpy.asarray(outputs[len(model.layers) - 1])


def test_round_trip_identical_outputs(tmp_path):
    desc = ["C[8,3]", "BN", "A", "P[2]", "C.B[12,3]", "BNA", "D[0.3]",
            "nRSN[2,16,3,2]", "R"]
    model = make_model(desc)
    x = numpy.random.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
    y0 = forward_out(model, x)

    fname = os.path.join(str(tmp_path), "model.mdl.gz")
    model_mod.save_to_file(model, fname)
    model2 = model_mod.load_from_file(fname, batch_size=2)
    y1 = forward_out(model2, x)

    assert numpy.allclose(y0, y1, atol=1e-6)
    assert model2.class_num == model.class_num
    assert tuple(model2.data_shape) == tuple(model.data_shape)
    # layer types preserved
    assert [l.type_name for l in model2.layers] == \
        [l.type_name for l in model.layers]


def test_layer_json_keys_match_reference_schema():
    """Spot-check the serialized key names against the reference schema so
    reference .mdl.gz files load (conv: convolution.py:126-136, BN:
    batch_norm.py:109-121 incl. the "std"==stdinv quirk)."""
    model = make_model(["C.B[4,3]", "BN", "P[2]", "R"])
    j = model.export_json()
    assert j["version"] == 3
    conv_j = j["layers"][0]
    assert conv_j["type"] == "conv"
    for key in ("shape", "stride", "border", "enabled", "useBias", "bias", "weight"):
        assert key in conv_j
    bn_j = j["layers"][1]
    assert bn_j["type"] == "batchnorm"
    for key in ("momentum", "eps", "mean", "std", "gamma", "bias"):
        assert key in bn_j
    # stdinv stored under "std"
    assert numpy.allclose(bn_j["std"], 1.0)


def test_split_mode_round_trip(tmp_path):
    desc = ["C[8,3]", "BN", "A", "SPLIT", "C[8,3]", "BN", "A", "R"]
    model = make_model(desc)
    assert model.use_split_mode
    x = numpy.random.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
    y0 = forward_out(model, x)
    fname = os.path.join(str(tmp_path), "split.mdl.gz")
    model_mod.save_to_file(model, fname)
    model2 = model_mod.load_from_file(fname, batch_size=2)
    assert model2.use_split_mode
    assert numpy.allclose(y0, forward_out(model2, x), atol=1e-6)


def test_skip_layers_round_trip(tmp_path):
    desc = ["C[8,3]", "SKIPSRC[0]", "C[16,3]", "SKIP[0]", "R"]
    model = make_model(desc)
    x = numpy.random.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
    y0 = forward_out(model, x)
    fname = os.path.join(str(tmp_path), "skip.mdl.gz")
    model_mod.save_to_file(model, fname)
    model2 = model_mod.load_from_file(fname, batch_size=2)
    assert numpy.allclose(y0, forward_out(model2, x), atol=1e-6)
