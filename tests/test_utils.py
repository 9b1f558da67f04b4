"""Utility tests: bbox math, param strings, image export, profiler."""
import os

import numpy

import denet_tpu.utils as common
from denet_tpu.utils import image_util


def test_overlap_iou():
    assert abs(common.overlap_iou((0, 0, 1, 1), (0, 0, 1, 1)) - 1.0) < 1e-9
    assert common.overlap_iou((0, 0, 1, 1), (2, 2, 3, 3)) == 0.0
    v = common.overlap_iou((0, 0, 1, 1), (0.5, 0, 1.5, 1))
    assert abs(v - 0.5 / 1.5) < 1e-9


def test_iou_matrix_matches_scalar():
    a = [(0, 0, 1, 1), (0.2, 0.2, 0.8, 0.9)]
    b = [(0.5, 0, 1.5, 1), (0, 0, 1, 1), (0.9, 0.9, 1.0, 1.0)]
    m = common.iou_matrix(a, b)
    for i in range(2):
        for j in range(3):
            assert abs(m[i, j] - common.overlap_iou(a[i], b[j])) < 1e-6
    assert common.iou_matrix([], b) is None


def test_get_params_dict():
    d = common.get_params_dict("crop=512,scale=512,augment_photo,ratio=0.5")
    assert d == {"crop": 512, "scale": 512, "augment_photo": True,
                 "ratio": 0.5}


def test_ndarray_unpack():
    v = numpy.arange(10)
    a, b = common.ndarray_unpack(v, [(2, 3), (4,)])
    assert a.shape == (2, 3) and b.shape == (4,)
    assert a[1, 2] == 5 and b[0] == 6


def test_convert_num():
    assert common.convert_num("3") == 3
    assert common.convert_num("0.5") == 0.5
    assert common.convert_num("abc") == "abc"


def test_image_exports(tmp_path):
    d = str(tmp_path)
    image_util.export_luminance(os.path.join(d, "lum.png"),
                                numpy.random.uniform(0, 1, (8, 8)))
    image_util.export_activation_rgb(
        os.path.join(d, "rgb.png"),
        numpy.random.uniform(0, 1, (3, 16, 16)).astype(numpy.float32),
        bboxs=[(0.2, 0.2, 0.8, 0.8)])
    image_util.export_activation(os.path.join(d, "act.png"),
                                 numpy.random.uniform(0, 1, (5, 6, 6)))
    image_util.export_label(os.path.join(d, "lab.png"),
                            numpy.random.randint(0, 3, (8, 8)),
                            [(255, 255, 255, 0), (255, 0, 0, 120),
                             (0, 0, 255, 120)])
    for f in ("lum.png", "rgb.png", "act.png", "lab.png"):
        assert os.path.isfile(os.path.join(d, f))


def test_profiler_helpers(tmp_path):
    import jax.numpy as jnp
    from denet_tpu.utils import profiler

    def f(x):
        return jnp.sum(x * 2.0)

    dt = profiler.profile(f, 3, jnp.ones((4, 4)))
    assert dt >= 0
    fname = str(tmp_path / "graph.txt")
    profiler.export_graph(fname, f, jnp.ones((4, 4)))
    assert os.path.getsize(fname) > 0


def test_timer():
    t = common.Timer()
    t.mark()
    t.mark()
    assert len(t.deltas()) == 2
    assert t.current() >= 0


def test_wavelength_to_rgb_golden():
    from denet_tpu.utils import image_util as iu
    # pure red band (645-781, full intensity)
    numpy.testing.assert_allclose(iu.wavelength_to_rgb(700), [1, 0, 0])
    # green @550: r = ((550-510)/70)^0.8, g = 1, b = 0
    numpy.testing.assert_allclose(
        iu.wavelength_to_rgb(550), [(40 / 70) ** 0.8, 1.0, 0.0], atol=1e-6)
    # violet edge @400: falloff factor 0.3 + 0.7*20/40 = 0.65
    r = ((40 / 60) * 0.65) ** 0.8
    numpy.testing.assert_allclose(iu.wavelength_to_rgb(400),
                                  [r, 0.0, 0.65 ** 0.8], atol=1e-6)
    # outside the visible range -> black
    numpy.testing.assert_allclose(iu.wavelength_to_rgb(900), [0, 0, 0])


def test_hyperspec_rgb_conversion_and_export(tmp_path):
    from denet_tpu.utils import image_util as iu
    data = numpy.zeros((2, 4, 5), dtype=numpy.float32)
    data[0, 1, 2] = 1.0     # 700nm -> red
    data[1, 3, 4] = 2.0     # 550nm -> green-ish
    img = iu.convert_hyperspec_rgb(data, [700, 550])
    assert img.shape == (3, 4, 5)
    # composite = sum_c rgb(w_c)/C * data[c]
    numpy.testing.assert_allclose(img[:, 1, 2],
                                  iu.wavelength_to_rgb(700) / 2, atol=1e-6)
    numpy.testing.assert_allclose(img[:, 3, 4],
                                  iu.wavelength_to_rgb(550), atol=1e-6)
    norm = iu.convert_hyperspec_rgb(data, [700, 550], normalize=True)
    assert norm.min() == 0.0 and norm.max() == 1.0

    fname = str(tmp_path / "hs.png")
    iu.export_hyperspec_rgb(fname, data, [700, 550])
    from PIL import Image
    im = numpy.asarray(Image.open(fname))
    assert im.shape == (4, 5, 3)
    assert im[1, 2, 0] == int(255 * iu.wavelength_to_rgb(700)[0] / 2)
    assert im[3, 4, 1] == min(255, int(255 * iu.wavelength_to_rgb(550)[1]))
