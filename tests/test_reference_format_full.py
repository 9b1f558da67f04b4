"""Reference-schema coverage for EVERY serializable layer type.

Strategy: build each model with the desc DSL, export to JSON, then
*sanitize* every layer entry down to exactly the reference's key set
(transcribed from each reference ``export_json`` — citations inline).  The
sanitized file is what a genuine reference-trained ``.mdl.gz`` looks like:
same key spellings, no extra keys.  Reloading it and getting bitwise-equal
outputs proves ``import_json`` never depends on a non-reference key.

Separate fixtures cover the reference's backward-compat quirks: legacy
"identity" entries inside resnet sublayer lists (resnet.py:144-155), the
"conv" key on denet-detect (denet_detect.py:130-134), and the
imageSize/imageMode model header (model_cnn.py import).
"""
import gzip
import json
import os

import numpy
import pytest

import denet_tpu.core.model as model_mod
from denet_tpu.core.model import Model
from denet_tpu.layers.base import Ctx
from denet_tpu.utils.json_util import numpy_to_json

# key sets transcribed from the reference export_json implementations
REFERENCE_KEYS = {
    "initial": {"type", "layers"},                       # layer/__init__.py:137
    "conv": {"type", "layers", "shape", "stride", "border", "enabled",
             "useBias", "bias", "weight"},               # convolution.py:126-136
    "deconv": {"type", "layers", "shape", "stride", "border", "useBias",
               "bias", "weight"},                        # deconvolution.py:105-114
    "batchnorm": {"type", "layers", "momentum", "eps", "mean", "std", "gamma",
                  "bias", "renormMaxR", "renormMaxD", "renormMaxIt",
                  "enabled"},                            # batch_norm.py:109-121
    "batchnorm-relu": {"type", "layers", "momentum", "eps", "mean", "std",
                       "gamma", "bias"},                 # batch_norm_relu.py:153-161
    "activation": {"type", "layers", "activation"},      # activation.py:53-56
    "pool": {"type", "layers", "mode", "size", "stride", "pad",
             "ignoreBorder"},                            # pool.py:60-67
    "pool-inv": {"type", "layers", "size"},              # pool_inv.py:38-41
    "border": {"type", "layers", "border"},              # border.py:43-46
    "crop-mirror": {"type", "layers", "crop", "mirror", "flip"},  # crop_mirror.py:72-75
    "dropout": {"type", "layers", "dropoutRate"},        # dropout.py:36-39
    "skip-src": {"type", "layers", "index", "split"},    # skip.py:27-30
    "skip": {"type", "layers", "index", "combineMode"},  # skip.py:105-108
    "split": {"type", "layers", "enabled"},              # split.py:37-40
    "resnet": {"type", "layers", "shape", "stride", "bottleneck", "bnParam",
               "activation", "version"},                 # resnet.py:157-167
    "regression": {"type", "layers", "valid"},           # regression.py:70-73
    "denet-corner": {"type", "layers", "sampleFeat", "useCenter",
                     "costFactor", "dropout"},           # denet_corner.py:73-79
    "denet-sparse": {"type", "layers", "gridSize", "sampleNum", "sampleGT",
                     "localMax", "cornerThreshold", "randomSample",
                     "nmsThreshold", "version"},         # denet_sparse.py:208-218
    "denet-detect": {"type", "layers", "costFactor", "bboxFactor",
                     "fitnessFactor", "useJointFitness", "useBoundedIoU",
                     "classNum", "overlapThreshold"},    # denet_detect.py:136-147
}


def make_model(desc, data_shape=(3, 32, 32), batch_size=2, class_num=5):
    numpy.random.seed(11)
    model = Model()
    model.batch_size = batch_size
    model.class_num = class_num
    model.class_labels = {str(i): i for i in range(class_num)}
    model.build(desc, data_shape, activation="relu", border_mode="half",
                weight_init=["he-forward"])
    return model


def forward_out(model, x, aux=None):
    import jax.numpy as jnp
    ctx = Ctx(train=False, aux=aux)
    outputs, _ = model.forward(model.params, model.state, jnp.asarray(x), ctx)
    return numpy.asarray(outputs[len(model.layers) - 1])


def detect_aux(model, batch=2):
    """Fixed sample bboxes so a detect-model forward is deterministic."""
    sn = model.layers[-2].sample_num if hasattr(model.layers[-2], "sample_num") \
        else 4
    for layer in model.layers:
        if layer.type_name == "denet-sparse":
            sn = layer.sample_num
    rng = numpy.random.RandomState(17)
    x0 = rng.uniform(0, 0.6, (batch, sn, sn, 1))
    y0 = rng.uniform(0, 0.6, (batch, sn, sn, 1))
    wh = rng.uniform(0.1, 0.4, (batch, sn, sn, 2))
    sb = numpy.concatenate([x0, y0, x0 + wh[..., :1], y0 + wh[..., 1:]],
                           axis=-1).astype(numpy.float32)
    return {"sample_bbox": sb}


def sanitize(layer_json):
    """Strip a layer entry (recursively) to exactly the reference key set."""
    ltype = layer_json["type"]
    keys = REFERENCE_KEYS[ltype]
    # the repo must never *miss* a reference key (reference-side import
    # reads them); batchnorm-relu legitimately exports the BN superset
    missing = keys - set(layer_json)
    assert not missing, (ltype, missing)
    out = {k: v for k, v in layer_json.items() if k in keys}
    if "layers" in out:
        out["layers"] = [sanitize(sub) for sub in out["layers"]]
    return out


def write_mdl(fname, json_obj):
    with gzip.open(fname, "wt") as f:
        json.dump(json_obj, f, default=numpy_to_json)


def roundtrip_via_reference_schema(model, tmp_path, name, x):
    """Export -> sanitize to reference-only keys -> reload -> compare."""
    y0 = forward_out(model, x)
    j = model.export_json()
    j["layers"] = [sanitize(l) for l in j["layers"]]
    fname = os.path.join(str(tmp_path), name)
    write_mdl(fname, j)
    model2 = model_mod.load_from_file(fname, batch_size=model.batch_size)
    y1 = forward_out(model2, x)
    assert numpy.array_equal(y0, y1), numpy.abs(y0 - y1).max()
    return model2, j


X32 = None


def input32(batch=2):
    global X32
    if X32 is None:
        X32 = numpy.random.RandomState(5).uniform(
            0, 1, (2, 3, 32, 32)).astype(numpy.float32)
    return X32[:batch]


def test_simple_layers_reference_schema(tmp_path):
    """CM / C / BN / A / D / B / pool (avg+pad, keep-border) / R."""
    model = make_model(["CM[28,0.5,0.1]", "C[8,3]", "BN", "A", "D[0.3]",
                        "B[1]", "P.A[2,2,1]", "P.B[3,2]", "R"])
    model2, j = roundtrip_via_reference_schema(
        model, tmp_path, "simple.mdl.gz", input32())
    types = [l["type"] for l in j["layers"]]
    # the R token expands to its final conv + the regression layer
    # (reference regression.py parse_desc)
    assert types == ["crop-mirror", "conv", "batchnorm", "activation",
                     "dropout", "border", "pool", "pool", "conv",
                     "regression"]
    # pool variants round-trip their mode/border flags
    p1, p2 = model2.layers[7], model2.layers[8]
    assert p1.mode == "average_inc_pad" and p1.pad == (1, 1)
    assert p2.ignore_border is False


def test_skip_split_reference_schema(tmp_path):
    model = make_model(["C[8,3]", "SPLIT", "SKIPSRC.X[0]", "C[16,3]",
                        "SKIP[0]", "R"])
    model2, j = roundtrip_via_reference_schema(
        model, tmp_path, "skip.mdl.gz", input32())
    sk = j["layers"][4]
    assert sk["type"] == "skip" and sk["combineMode"] == "proj-add"
    # channel mismatch -> projection conv serialized in the skip's sublayers
    assert any(s["type"] == "conv" for s in sk["layers"])
    assert j["layers"][2]["split"] is True
    assert model2.use_split_mode


def test_deconv_poolinv_bna_reference_schema(tmp_path):
    model = make_model(["C[4,3,2]", "DC[6,3,2]", "PI[2]", "BNA", "R"])
    model2, j = roundtrip_via_reference_schema(
        model, tmp_path, "deconv.mdl.gz", input32())
    dc = j["layers"][1]
    assert dc["type"] == "deconv"
    assert set(dc.keys()) == REFERENCE_KEYS["deconv"]
    assert j["layers"][3]["type"] == "batchnorm-relu"
    assert set(j["layers"][3].keys()) == REFERENCE_KEYS["batchnorm-relu"]


def test_resnet_variants_reference_schema(tmp_path):
    """Pre-activation plain, original w/ shortcut+BN, bottleneck."""
    model = make_model(["C[4,3]", "RSN[4,3]", "RSN.O[8,3,2]",
                        "nRSN[1,8,3,1,4]", "R"])
    model2, j = roundtrip_via_reference_schema(
        model, tmp_path, "resnet.mdl.gz", input32())
    rsn_orig = j["layers"][2]
    subs = [s["type"] for s in rsn_orig["layers"]]
    # original + shape change: trailing projection conv + shortcut BN
    # (reference resnet.py:100-105)
    assert subs[-2:] == ["conv", "batchnorm"]
    assert rsn_orig["version"] == "original"
    bneck = j["layers"][3]
    assert bneck["bottleneck"] == 4
    # bottleneck: three convs in the main path
    assert [s["type"] for s in bneck["layers"]].count("conv") >= 3


def test_resnet_legacy_identity_entries(tmp_path):
    """Old reference files interleave {"type": "identity"} entries in resnet
    sublayer lists; import must skip them (resnet.py:144-155)."""
    model = make_model(["C[4,3]", "RSN[4,3]", "R"])
    x = input32()
    y0 = forward_out(model, x)
    j = model.export_json()
    j["layers"] = [sanitize(l) for l in j["layers"]]
    rsn = j["layers"][1]
    ident = {"type": "identity", "layers": []}
    rsn["layers"] = [rsn["layers"][0], ident] + rsn["layers"][1:] + [ident]
    fname = os.path.join(str(tmp_path), "legacy_identity.mdl.gz")
    write_mdl(fname, j)
    model2 = model_mod.load_from_file(fname, batch_size=2)
    assert numpy.array_equal(y0, forward_out(model2, x))


def test_resnet_bnrelu_version(tmp_path):
    """version "pre-activation,bnrelu" builds batchnorm-relu sublayers; a
    reference file of that shape must reconstruct and load (resnet.py:54-58)."""
    model = make_model(["C[4,3]", "RSN[4,3]", "R"])
    j = model.export_json()
    j["layers"] = [sanitize(l) for l in j["layers"]]
    rsn = j["layers"][1]
    rsn["version"] = "pre-activation,bnrelu"
    # rebuild sublayer list with fused bn-relu entries: the pre-activation
    # plain layout is [initial, bn, act, conv, bn, act, conv]; the bnrelu
    # layout is [initial, bnrelu, conv, bnrelu, conv]
    def fuse(bn):
        return {"type": "batchnorm-relu",
                "layers": [], "momentum": bn["momentum"], "eps": bn["eps"],
                "mean": bn["mean"], "std": bn["std"], "gamma": bn["gamma"],
                "bias": bn["bias"]}
    subs = rsn["layers"]
    assert [s["type"] for s in subs] == [
        "initial", "batchnorm", "activation", "conv", "batchnorm",
        "activation", "conv"]
    rsn["layers"] = [subs[0], fuse(subs[1]), subs[3], fuse(subs[4]), subs[6]]
    fname = os.path.join(str(tmp_path), "bnrelu.mdl.gz")
    write_mdl(fname, j)
    model2 = model_mod.load_from_file(fname, batch_size=2)
    rsn2 = model2.layers[2]
    assert rsn2.version == "pre-activation,bnrelu"
    assert [l.type_name for l in rsn2.sublayers] == [
        "initial", "batchnorm-relu", "conv", "batchnorm-relu", "conv"]
    # weights landed: first conv weight bit-exact
    assert numpy.array_equal(
        numpy.asarray(model2.params[2]["layers"][2]["weight"]),
        numpy.asarray(subs[3]["weight"]))
    out = forward_out(model2, input32())
    assert numpy.isfinite(out).all()


def detect_model(dnd_token):
    return make_model(["C[8,3]", "BN", "A", "DNC[16]", "DNS[2,4,0.01,0.1]",
                       "C[16,1]", "BN", "A", dnd_token],
                      data_shape=(3, 32, 32), class_num=3)


@pytest.mark.parametrize("dnd", ["DND[0.5,1.0]", "DND[0.5,1.0,0.1,0.1]",
                                 "DND.JB[0.5,1.0,1.0]"])
def test_detect_head_variants_reference_schema(tmp_path, dnd):
    """Plain, bbox-reg+indfit, and jointfit+boundedIoU head options all
    serialize to the reference key set and reload bit-exactly."""
    model = detect_model(dnd)
    x = input32()
    aux = detect_aux(model)
    y0 = forward_out(model, x, aux)
    j = model.export_json()
    j["layers"] = [sanitize(l) for l in j["layers"]]
    fname = os.path.join(str(tmp_path), "det.mdl.gz")
    write_mdl(fname, j)
    model2 = model_mod.load_from_file(fname, batch_size=2)
    assert numpy.array_equal(y0, forward_out(model2, x, aux))
    d1, d2 = model.layers[-1], model2.layers[-1]
    for attr in ("cost_factor", "bbox_factor", "indfit_factor", "use_jointfit",
                 "use_bounded_iou", "class_num", "overlap_threshold"):
        assert getattr(d1, attr) == getattr(d2, attr), attr


def test_detect_legacy_conv_key(tmp_path):
    """Backward-compat: old files store the head conv under "conv" instead of
    "layers" (reference denet_detect.py:130-134)."""
    model = detect_model("DND[0.5,1.0]")
    x = input32()
    aux = detect_aux(model)
    y0 = forward_out(model, x, aux)
    j = model.export_json()
    j["layers"] = [sanitize(l) for l in j["layers"]]
    det = j["layers"][-1]
    det["conv"] = det["layers"][0]
    det["layers"] = []
    fname = os.path.join(str(tmp_path), "legacy_conv.mdl.gz")
    write_mdl(fname, j)
    model2 = model_mod.load_from_file(fname, batch_size=2)
    assert numpy.array_equal(y0, forward_out(model2, x, aux))


def test_dnc_center_variant_reference_schema(tmp_path):
    model = make_model(["C[8,3]", "BN", "A", "DNC.C[16]", "DNS[2,4,0.01,0.1]",
                        "C[16,1]", "BN", "A", "DND[0.5,1.0]"],
                       class_num=3)
    x = input32()
    aux = detect_aux(model)
    y0 = forward_out(model, x, aux)
    j = model.export_json()
    j["layers"] = [sanitize(l) for l in j["layers"]]
    fname = os.path.join(str(tmp_path), "center.mdl.gz")
    write_mdl(fname, j)
    model2 = model_mod.load_from_file(fname, batch_size=2)
    assert numpy.array_equal(y0, forward_out(model2, x, aux))
    dnc = j["layers"][3]
    assert dnc["useCenter"] is True
    assert model2.layers[4].use_center


def test_legacy_image_size_header(tmp_path):
    """Pre-dataShape files carry imageSize/imageMode (model import path)."""
    model = make_model(["C[8,3]", "R"], data_shape=(3, 16, 16))
    x = numpy.random.RandomState(6).uniform(
        0, 1, (2, 3, 16, 16)).astype(numpy.float32)
    y0 = forward_out(model, x)
    j = model.export_json()
    j["layers"] = [sanitize(l) for l in j["layers"]]
    del j["dataShape"]
    j["imageSize"] = [16, 16]
    j["imageMode"] = "RGB"
    fname = os.path.join(str(tmp_path), "legacy_hdr.mdl.gz")
    write_mdl(fname, j)
    model2 = model_mod.load_from_file(fname, batch_size=2)
    assert tuple(model2.data_shape) == (3, 16, 16)
    assert numpy.array_equal(y0, forward_out(model2, x))


def test_disabled_bn_reference_schema(tmp_path):
    """enabled=False batchnorm serializes null stats and reloads as a
    pass-through (reference batch_norm.py enabled flag)."""
    model = make_model(["C[8,3]", "BN", "R"])
    j = model.export_json()
    j["layers"] = [sanitize(l) for l in j["layers"]]
    bn = j["layers"][1]
    bn.update({"enabled": False, "mean": None, "std": None, "gamma": None,
               "bias": None})
    fname = os.path.join(str(tmp_path), "bn_off.mdl.gz")
    write_mdl(fname, j)
    model2 = model_mod.load_from_file(fname, batch_size=2)
    assert model2.layers[2].enabled is False
    out = forward_out(model2, input32())
    assert numpy.isfinite(out).all()


def test_zoo_flagship_reference_schema(tmp_path):
    """The flagship DeNet34-skip zoo model survives the reference-only-keys
    round trip end to end (every layer type the published checkpoints
    contain: conv/BN/act/pool/resnet/skip/split/DNC/DNS/DND)."""
    from denet_tpu.models import zoo
    model = make_model(zoo.denet34("skip"), data_shape=(3, 64, 64),
                       batch_size=1, class_num=4)
    x = numpy.random.RandomState(9).uniform(
        0, 1, (1, 3, 64, 64)).astype(numpy.float32)
    aux = detect_aux(model, batch=1)
    y0 = forward_out(model, x, aux)
    j = model.export_json()
    j["layers"] = [sanitize(l) for l in j["layers"]]
    fname = os.path.join(str(tmp_path), "flagship.mdl.gz")
    write_mdl(fname, j)
    model2 = model_mod.load_from_file(fname, batch_size=1)
    assert numpy.array_equal(y0, forward_out(model2, x, aux))
