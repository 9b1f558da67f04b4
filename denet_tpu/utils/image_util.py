"""Debug image export helpers (activation / label / bbox-overlay PNGs).

Covers the surface of the reference denet/common/image_util.py used by the
apps and debug paths: luminance/RGB activation export with optional bbox
overlay, per-channel activation grids, label maps with alpha colors.
"""
import colorsys
import os

import numpy
from PIL import Image


def get_unique_colors(n, sat=1, val=1):
    return [colorsys.hsv_to_rgb(x / n, sat, val) for x in range(n)]


def _ensure_dir(fname):
    dname = os.path.dirname(fname)
    if dname and not os.path.isdir(dname):
        os.makedirs(dname)


def export_luminance(fname, data):
    """(H, W) array in [0,1] -> greyscale PNG."""
    assert data.ndim == 2
    im_d = numpy.clip(255 * data, 0, 255).astype(numpy.uint8)
    _ensure_dir(fname)
    Image.fromarray(im_d, "L").save(fname)


def export_activation_rgb(fname, data, bboxs=()):
    """(3, H, W) array in [0,1] -> RGB PNG with red bbox outlines.

    bboxes are image-normalized (xmin, ymin, xmax, ymax)."""
    if len(bboxs) > 0:
        data = numpy.copy(data)
        for x0, y0, x1, y1 in bboxs:
            x0 = max(0, min(int(x0 * data.shape[2]), data.shape[2] - 1))
            x1 = max(0, min(int(x1 * data.shape[2]), data.shape[2] - 1))
            y0 = max(0, min(int(y0 * data.shape[1]), data.shape[1] - 1))
            y1 = max(0, min(int(y1 * data.shape[1]), data.shape[1] - 1))
            for edge in [(slice(None), y0, slice(x0, x1)),
                         (slice(None), y1, slice(x0, x1)),
                         (slice(None), slice(y0, y1), x0),
                         (slice(None), slice(y0, y1), x1)]:
                data[edge] = 0
                data[(0,) + edge[1:]] = 1

    im_d = numpy.clip(255 * data, 0, 255).astype(numpy.uint8).transpose(1, 2, 0)
    _ensure_dir(fname)
    Image.fromarray(im_d, "RGB").save(fname)


def export_activation(fname, data, cols=None):
    """(C, H, W) activation stack -> tiled greyscale grid PNG."""
    assert data.ndim == 3
    c, h, w = data.shape
    if cols is None:
        cols = int(numpy.ceil(numpy.sqrt(c)))
    rows = int(numpy.ceil(c / cols))
    grid = numpy.zeros((rows * h, cols * w), dtype=numpy.float32)
    lo, hi = float(data.min()), float(data.max())
    scale = 1.0 / (hi - lo) if hi > lo else 1.0
    for i in range(c):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = (data[i] - lo) * scale
    export_luminance(fname, grid)


def export_label(fname, label, colors, background=None):
    """Integer label map -> RGBA-colored PNG, optionally alpha-blended over a
    greyscale background.  ``colors`` is a list of (r, g, b, a) 0-255 tuples
    indexed by label value."""
    h, w = label.shape
    out = numpy.zeros((h, w, 3), dtype=numpy.float32)
    if background is not None:
        bg = numpy.asarray(background, dtype=numpy.float32)
        if bg.max() > 1.0:
            bg = bg / 255.0
        out[...] = bg[..., None]

    for cls, rgba in enumerate(colors):
        mask = label == cls
        alpha = rgba[3] / 255.0
        color = numpy.asarray(rgba[:3], dtype=numpy.float32) / 255.0
        out[mask] = (1 - alpha) * out[mask] + alpha * color

    im_d = numpy.clip(255 * out, 0, 255).astype(numpy.uint8)
    _ensure_dir(fname)
    Image.fromarray(im_d, "RGB").save(fname)


# -- hyperspectral -> visible RGB (reference common/image_util.py:61-115) ----

def wavelength_to_rgb(w, gamma=0.8):
    """Approximate visible-spectrum RGB for wavelength ``w`` (nm) with the
    classic piecewise linear-ramp model + intensity falloff at the spectrum
    edges; gamma-compressed.  Returns a (3,) float32 array."""
    r = g = b = 0.0
    if 380 <= w < 440:
        r, b = -(w - 440) / (440 - 380), 1.0
    elif 440 <= w < 490:
        g, b = (w - 440) / (490 - 440), 1.0
    elif 490 <= w < 510:
        g, b = 1.0, -(w - 510) / (510 - 490)
    elif 510 <= w < 580:
        r, g = (w - 510) / (580 - 510), 1.0
    elif 580 <= w < 645:
        r, g = 1.0, -(w - 645) / (645 - 580)
    elif 645 <= w < 781:
        r = 1.0

    if 380 <= w < 420:
        factor = 0.3 + 0.7 * (w - 380) / (420 - 380)
    elif 420 <= w < 701:
        factor = 1.0
    elif 701 <= w < 781:
        factor = 0.3 + 0.7 * (780 - w) / (780 - 700)
    else:
        factor = 0.0

    return numpy.array([(r * factor) ** gamma, (g * factor) ** gamma,
                        (b * factor) ** gamma], dtype=numpy.float32)


def convert_hyperspec_rgb(data, wavelens, normalize=False):
    """(C, H, W) hyperspectral cube + per-channel wavelengths (nm) ->
    (3, H, W) float32 RGB composite (mean of per-band tinted images)."""
    assert len(wavelens) == data.shape[0]
    weights = numpy.stack([wavelength_to_rgb(w) for w in wavelens])  # (C, 3)
    image = numpy.tensordot(weights.T / len(wavelens), data,
                            axes=1).astype(numpy.float32)
    if normalize:
        return (image - image.min()) / (image.max() - image.min())
    return image


def export_hyperspec_rgb(fname, data, wavelens, normalize=False):
    """Save a hyperspectral cube as an RGB PNG (values scaled x255)."""
    image = convert_hyperspec_rgb(data, wavelens, normalize)
    image = numpy.clip(255 * image.transpose(1, 2, 0), 0, 255)
    _ensure_dir(fname)
    Image.fromarray(image.astype(numpy.uint8), "RGB").save(fname)
