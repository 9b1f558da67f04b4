"""Parallel image decode + augment pipeline.

Behavioral parity with the reference (denet/dataset/image_loader.py): a
multiprocessing pool decodes and augments per-sample with a per-sample RNG
seed; bbox coordinates are remapped into crop-normalized [0,1] with the
``check_onscreen`` relative-overlap filter (or ``check_center``).  Training
path supports crop modes resnet/lenet/denet/ssd/default/center followed by
photometric/colorspace/mirror; test path scales + center-crops or produces
the 10-crop ``multicrop`` set.
"""
import multiprocessing as mp
import os
import random

import numpy

import denet_tpu.utils as common
from denet_tpu.data import augment


def load_sample_proc(args):
    image = args["image"]
    image_bboxs = image.get("bboxs", [])
    bboxs = [bbox for _, bbox in image_bboxs]
    image_cls = image.get("class", None)

    is_training = args["isTraining"]
    scale = args["scale"]
    scale_mode = args.get("scaleMode", "small")
    crop = args["crop"]
    crop_mode = args.get("cropMode", "default")
    max_trials = args.get("maxTrials", 10)
    multicrop = args.get("multicrop", False)
    area_min = args.get("areaMin", 0.08)
    aspect_factor = args.get("aspectFactor", 3 / 4)
    check_onscreen = args.get("checkOnscreen", 0.0)
    check_center = args.get("checkCenter", False)

    random.seed(args.get("seed", None))
    numpy.random.seed(args.get("seed", None))

    from PIL import Image
    im = Image.open(image["fname"])
    im_size = im.size
    mirror = False

    if is_training:
        if crop_mode == "resnet":
            im, sx, sy, ox, oy = augment.resnet_crop(im, crop)
        elif crop_mode == "lenet":
            im, sx, sy, ox, oy = augment.lenet_crop(im, crop, area_min,
                                                    aspect_factor, max_trials,
                                                    scale_mode)
        elif crop_mode == "denet":
            im, sx, sy, ox, oy = augment.denet_crop(im, crop, bboxs, area_min,
                                                    aspect_factor, max_trials)
        elif crop_mode == "ssd":
            im, sx, sy, ox, oy = augment.ssd_crop(im, crop, bboxs)
        elif crop_mode == "default":
            im, sx, sy = augment.scale(im, scale, scale_mode)
            im, ox, oy = augment.random_crop(im, crop)
        elif crop_mode == "center":
            im, sx, sy = augment.scale(im, scale, scale_mode)
            im, ox, oy = augment.center_crop(im, crop)
        else:
            raise Exception("Unknown crop mode: %s" % crop_mode)

        im_x = augment.image_to_array(im)
        if args.get("augmentPhoto", False):
            im_x = augment.photometric(im_x)
        if args.get("augmentColor", False):
            im_x = augment.colorspace(
                im_x, numpy.asarray(args["rgbEigenVal"], dtype=numpy.float32),
                numpy.asarray(args["rgbEigenVec"], dtype=numpy.float32))

        if args.get("augmentMirror", False) and random.random() >= 0.5:
            im_x = im_x[:, :, ::-1]
            mirror = True
        im_list_x = [im_x]
        offset_x, offset_y, scale_x, scale_y = ox, oy, sx, sy
    else:
        im, scale_x, scale_y = augment.scale(im, scale, scale_mode)
        if multicrop:
            im_list, offset_x, offset_y, mirror = augment.multi_crop_mirror(im, crop)
            im_list_x = [augment.image_to_array(c) for c in im_list]
            scale_x = [scale_x] * 10
            scale_y = [scale_y] * 10
        else:
            im, offset_x, offset_y = augment.center_crop(im, crop)
            im_list_x = [augment.image_to_array(im)]

    subtract_mean = args.get("subtractMean", False)
    if subtract_mean:
        rgb_mean = numpy.asarray(args["rgbMean"], dtype=numpy.float32)
        rgb_std = numpy.asarray(args["rgbStd"], dtype=numpy.float32)

    def pick(v, i):
        return v[i] if isinstance(v, list) else v

    data = []
    for i, im_x in enumerate(im_list_x):
        if subtract_mean:
            im_x = (im_x - rgb_mean[:, None, None]) / rgb_std[:, None, None]

        x, y = pick(offset_x, i), pick(offset_y, i)
        sx, sy = pick(scale_x, i), pick(scale_y, i)
        m = pick(mirror, i)

        out_bboxs = []
        out_classes = []
        for cls, bbox in image_bboxs:
            min_x = (bbox[0] * sx - x) / crop
            min_y = (bbox[1] * sy - y) / crop
            max_x = (bbox[2] * sx - x) / crop
            max_y = (bbox[3] * sy - y) / crop
            if m:
                min_x, max_x = 1.0 - max_x, 1.0 - min_x
            cx = (min_x + max_x) * 0.5
            cy = (min_y + max_y) * 0.5
            clipped = (common.clip(min_x, 0, 1), common.clip(min_y, 0, 1),
                       common.clip(max_x, 0, 1), common.clip(max_y, 0, 1))
            if common.overlap_rel((min_x, min_y, max_x, max_y)) >= check_onscreen:
                out_bboxs.append(clipped)
                out_classes.append(cls)
            elif check_center and 0.0 <= cx <= 1.0 and 0.0 <= cy <= 1.0:
                out_bboxs.append(clipped)
                out_classes.append(cls)

        meta = {"class": out_classes, "bbox": out_bboxs, "scale": (sx, sy),
                "offset": (x, y), "mirror": m, "image_size": im_size,
                "image": image}
        if image_cls is not None:
            meta["image_class"] = image_cls
        data.append((os.path.basename(image["fname"]), im_x, meta))

    return data


class ImageLoader:
    def __init__(self, thread_num, is_training, format_params=None):
        format_params = format_params or {}
        self.crop = format_params.get("crop", 224)
        self.multicrop = format_params.get("multicrop", False)
        self.crop_mode = format_params.get("crop_mode", "default")
        self.max_trials = format_params.get("max_trials", 10)
        self.scale = format_params.get("scale", self.crop)
        self.scale_mode = format_params.get("scale_mode", "small")
        self.area_min = format_params.get("area_min", 0.08)
        self.aspect_factor = format_params.get("aspect_factor", 0.75)

        self.subtract_mean = format_params.get("subtract_mean", False)
        self.augment_color = format_params.get("augment_color", False)
        self.augment_photo = format_params.get("augment_photo", False)
        self.check_onscreen = format_params.get("check_onscreen", 0.5)
        self.check_center = format_params.get("check_center", False)
        self.augment_mirror = True
        self.rgb_mean = numpy.zeros(3, dtype=numpy.float32)
        self.rgb_std = numpy.ones(3, dtype=numpy.float32)
        self.rgb_eigen_val = numpy.zeros(3, dtype=numpy.float32)
        self.rgb_eigen_vec = numpy.zeros((3, 3), dtype=numpy.float32)

        self.is_training = is_training
        self.thread_num = thread_num
        self._pool = None

    def __str__(self):
        return ("thread_num: %i, is_training: %i, subtract_mean: %i, scale: %i, "
                "scale mode: %s, crop: %i, crop_mode: %s, multicrop: %i, "
                "onscreen: %.1f, center: %i" % (
                    self.thread_num, self.is_training, self.subtract_mean,
                    self.scale, self.scale_mode, self.crop, self.crop_mode,
                    self.multicrop, self.check_onscreen, self.check_center))

    def _make_args(self, image):
        return {"image": image,
                "isTraining": self.is_training,
                "multicrop": self.multicrop,
                "checkOnscreen": self.check_onscreen,
                "checkCenter": self.check_center,
                "scale": self.scale,
                "scaleMode": self.scale_mode,
                "crop": self.crop,
                "cropMode": self.crop_mode,
                "subtractMean": self.subtract_mean,
                "maxTrials": self.max_trials,
                "areaMin": self.area_min,
                "aspectFactor": self.aspect_factor,
                "rgbMean": self.rgb_mean.tolist(),
                "rgbStd": self.rgb_std.tolist(),
                "rgbEigenVec": self.rgb_eigen_vec.tolist(),
                "rgbEigenVal": self.rgb_eigen_val.tolist(),
                "augmentMirror": self.augment_mirror,
                "augmentColor": self.augment_color,
                "augmentPhoto": self.augment_photo,
                "seed": random.randint(0, 1000000)}

    def load(self, images):
        args_list = [self._make_args(image) for image in images]
        if self.thread_num <= 1:
            data_list = [load_sample_proc(a) for a in args_list]
        else:
            if self._pool is None:
                self._pool = mp.Pool(self.thread_num)
            data_list = self._pool.imap(load_sample_proc, args_list)
        return [sample for chunk in data_list for sample in chunk]
