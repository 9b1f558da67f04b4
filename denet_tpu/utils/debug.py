"""Debug visualization of training targets (the equivalent of the
reference's debug_denet_export_targets, model_cnn.py:541-571)."""
import numpy

import denet_tpu.utils as common
import denet_tpu.utils.logging as logging
from denet_tpu.utils import image_util


def export_targets(model, data_x, data_m, targets, prefix=""):
    """Render ground truth and per-cost-layer targets as PNGs."""
    class_labels_inv = {v: k for k, v in (model.class_labels or {}).items()}
    for b in range(min(len(data_m), model.batch_size)):
        meta = data_m[b]
        for cls in set(meta.get("class", [])):
            objs = [bbox for obj_cls, bbox in zip(meta["class"], meta["bbox"])
                    if obj_cls == cls]
            image_util.export_activation_rgb(
                "%s%06i_gt_%s.png" % (prefix, b, class_labels_inv.get(cls, cls)),
                data_x[b], objs)

    index = 0
    for layer in model.cost_layers():
        yt_value = targets[index * 2 + 1]
        if layer.type_name == "denet-corner":
            corner_pr, = common.ndarray_unpack(numpy.asarray(yt_value),
                                               [layer.corner_shape])
            for b in range(corner_pr.shape[0]):
                image_util.export_activation(
                    "%s%06i_l%i_corner.png" % (prefix, b, index),
                    corner_pr[b, 1])
        elif layer.type_name == "denet-detect":
            det_pr = numpy.asarray(yt_value)[
                :int(numpy.prod(layer.det_shape))].reshape(layer.det_shape)
            for b in range(det_pr.shape[0]):
                image_util.export_activation(
                    "%s%06i_l%i_det.png" % (prefix, b, index), det_pr[b])
        index += 1
    logging.verbose("Exported target visualizations")
