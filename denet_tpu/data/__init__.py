"""Dataset abstraction + background subset export.

Keeps the reference's contract (denet/dataset/__init__.py): ``data`` is a
list of (fname, PIL-or-ndarray, meta); datasets stream in subsets;
``export(batch_size)`` pads to a batch multiple and returns NCHW float32 in
[0, 1] plus metas; ``DatasetExportThread`` double-buffers subset loading
behind device compute.
"""
import math
import random
import threading

import numpy
from PIL import Image

import denet_tpu.utils as common
import denet_tpu.utils.logging as logging


class DatasetExportThread(threading.Thread):
    """Load + export a subset in the background while the device trains."""

    def __init__(self, model, data, subset, batch_size, training):
        threading.Thread.__init__(self)
        self.model = model
        self.data = data
        self.subset = subset
        self.training = training
        self.batch_size = batch_size
        self.data_export = None
        self.start()

    def run(self):
        logging.info("Exporting subset (%i/%i)" % (self.subset + 1,
                                                   self.data.subset_num))
        timer = common.Timer()
        self.data.load_from_subset(self.subset)
        timer.mark()
        self.data_export = self.data.export(self.batch_size)
        timer.mark()
        logging.info("Finished exporting subset (%i/%i) - load took %i sec, "
                     "export took %i sec" % (self.subset + 1,
                                             self.data.subset_num,
                                             timer.delta(0), timer.delta(1)))

    def wait(self):
        self.join()

    def get_export(self):
        return self.data_export

    def get_labels(self):
        return self.data.get_labels()


class DatasetAbstract:
    def __init__(self):
        self.data = []
        self.src_prefix = ""
        self.class_labels = {}
        self.subset_num = 1
        self.subset_index = -1
        self.subset_total_size = 0
        self.subset_size = 0
        self.thread_num = 1
        self.partial_mode = "ignore"
        self.sample_mode = "default"

    def copy(self, copy_data=True):
        r = type(self)()
        r.src_prefix = self.src_prefix
        r.class_labels = self.class_labels
        r.subset_num = self.subset_num
        r.subset_index = self.subset_index
        r.subset_total_size = self.subset_total_size
        r.subset_size = self.subset_size
        r.thread_num = self.thread_num
        r.partial_mode = self.partial_mode
        if copy_data:
            if self.get_data_type() == "image":
                r.data = [(f, d.copy(), m.copy()) for f, d, m in self.data]
            else:
                r.data = [(f, numpy.copy(d), m.copy()) for f, d, m in self.data]
        return r

    def load(self, src_prefix, data_format, is_training, thread_num,
             class_labels=None):
        raise NotImplementedError()

    def load_from_subset(self, index):
        pass

    def get_subset_size(self, subset=0):
        if subset == (self.subset_num - 1):
            return self.subset_total_size % self.subset_size
        return self.subset_size

    def update(self, pr):
        """Semi-supervised label update for partially-labelled samples
        (reference dataset/__init__.py:102-139)."""
        if self.sample_mode == "confusion":
            n = self.get_class_num()
            confusion = numpy.zeros((n, n), dtype=numpy.float64)
            predict_cls = numpy.argmax(pr, axis=1)
            for i, (_, _, meta) in enumerate(self.data):
                confusion[meta["class"], predict_cls[i]] += 1
            confusion /= numpy.sum(confusion, axis=1)[:, None]
            numpy.fill_diagonal(confusion, 0.0)
            self.confusion = confusion
            logging.info("Confusion Matrix:\n", confusion)

        if self.partial_mode in ("previous", "max"):
            cls = numpy.argmax(pr, axis=1)
            for i, (fname, d, meta) in enumerate(self.data):
                if meta.get("partial"):
                    meta["class"] = cls[i]
                    self.data[i] = (fname, d, meta)
        elif "momentum" in self.partial_mode:
            if "hard" in self.partial_mode:
                cls = numpy.argmax(pr, axis=1)
                pr = numpy.zeros_like(pr)
                pr[numpy.arange(pr.shape[0]), cls] = 1.0
            p = float(self.partial_mode.split(",")[1])
            for i, (fname, d, meta) in enumerate(self.data):
                if meta.get("partial"):
                    meta["pr"] = [p * meta["pr"][c] + (1.0 - p) * pr[i, c]
                                  for c in range(pr.shape[1])]
                    meta["class"] = meta["pr"].index(max(meta["pr"]))
                    self.data[i] = (fname, d, meta)

    def __len__(self):
        return len(self.data)

    def get_total_size(self):
        return self.subset_total_size

    def get_class_num(self):
        return len(self.class_labels)

    def get_labels(self):
        return [meta["image_class"] for _, _, meta in self.data]

    def get_metas(self):
        return [meta for _, _, meta in self.data]

    def get_data_type(self):
        if len(self.data) > 0:
            if isinstance(self.data[0][1], Image.Image):
                return "image"
            if isinstance(self.data[0][1], numpy.ndarray):
                return "array"
        raise Exception("Cannot get data type!")

    def get_data_shape(self):
        if len(self.data) > 0:
            if self.get_data_type() == "image":
                channels = 3 if self.data[0][1].mode == "RGB" else 1
                return (channels, self.data[0][1].size[0], self.data[0][1].size[1])
            return self.data[0][1].shape
        raise Exception("Cannot get data shape! Override get_data_shape().")

    def split_folds(self, nfolds):
        folds = [self.copy(False) for _ in range(nfolds)]
        for i, d in enumerate(self.data):
            folds[i % nfolds].data.append(d)
        return folds

    def concatenate(self, data):
        r = self.copy(True)
        r.data += data.data
        return r

    def shuffle(self, mode="random"):
        if mode != "random":
            raise Exception("Unknown shuffle mode: %s" % mode)
        random.shuffle(self.data)

    def set_image_mode(self, mode):
        assert self.get_data_type() == "image"
        self.data = [(f, im.convert(mode, dither=None), m)
                     for f, im, m in self.data]

    def add_border(self, n):
        new_data = []
        for fname, im, meta in self.data:
            if self.get_data_type() == "image":
                r = Image.new(im.mode, (im.size[0] + 2 * n, im.size[1] + 2 * n))
                r.paste(im, (n, n))
            else:
                r = numpy.zeros((im.shape[0], im.shape[1] + 2 * n,
                                 im.shape[2] + 2 * n), dtype=im.dtype)
                r[:, n:-n or None, n:-n or None] = im
            new_data.append((fname, r, meta))
        self.data = new_data

    def resize(self, size, filter=Image.BILINEAR):
        """Resize every sample (PIL images or (C,H,W) arrays)."""
        import scipy.ndimage
        new_data = []
        for fname, im, meta in self.data:
            if self.get_data_type() == "image":
                new_data.append((fname, im.resize(size, filter), meta))
            else:
                zx = size[0] / im.shape[1]
                zy = size[1] / im.shape[2]
                chans = [scipy.ndimage.zoom(im[c], [zx, zy])
                         for c in range(im.shape[0])]
                new_data.append((fname, numpy.stack(chans, axis=0), meta))
        self.data = new_data

    def transform_sample(self, sample, rotate=0, scale=(1, 1), shear=(0, 0),
                         offset=(0, 0), mirror=False, bilinear=False):
        """Affine-distort one (fname, image, meta) sample
        (reference dataset/__init__.py:244-277)."""
        import math as _math
        from PIL import ImageOps
        import scipy.ndimage

        fname, im, meta = sample
        rot = numpy.array([[_math.cos(rotate), _math.sin(rotate)],
                           [-_math.sin(rotate), _math.cos(rotate)]])
        sc = numpy.array([[1.0 / scale[0], 0], [0, 1.0 / scale[1]]])
        shear_x = numpy.array([[1, shear[0]], [0, 1]])
        shear_y = numpy.array([[1, 0], [shear[1], 1]])
        tr = rot @ sc @ shear_x @ shear_y

        if self.get_data_type() == "image":
            resample = Image.BILINEAR if bilinear else Image.NEAREST
            center = (im.size[0] / 2, im.size[1] / 2)
            ox = center[0] - center[0] * tr[0, 0] - center[1] * tr[0, 1] - offset[0]
            oy = center[1] - center[0] * tr[1, 0] - center[1] * tr[1, 1] - offset[1]
            im = im.transform(im.size, Image.AFFINE,
                              (tr[0, 0], tr[0, 1], ox, tr[1, 0], tr[1, 1], oy),
                              resample=resample)
            if mirror:
                im = ImageOps.mirror(im)
        else:
            order = 1 if bilinear else 0
            center = (im.shape[1] / 2, im.shape[2] / 2)
            ox = center[0] - center[0] * tr[0, 0] - center[1] * tr[0, 1] - offset[0]
            oy = center[1] - center[0] * tr[1, 0] - center[1] * tr[1, 1] - offset[1]
            chans = [scipy.ndimage.affine_transform(im[c], tr[0:2, 0:2],
                                                    [ox, oy], order=order)
                     for c in range(im.shape[0])]
            im = numpy.stack(chans, axis=0)
            if mirror:
                im = im[:, :, ::-1]
        return (fname, im, meta)

    def distort_affine(self, dtheta=0, dscale=0, dshear=0, doffset=0,
                       mirror=0, use_integer_offset=False, bilinear=False):
        """Random affine distortion of every sample in place (threaded in
        the reference; sequential here — the mp image loader is the hot
        augmentation path on this design)."""
        import math as _math
        for index in range(len(self.data)):
            theta = numpy.random.uniform(-dtheta, dtheta) * _math.pi / 180.0
            s = numpy.random.uniform(1.0 - dscale, 1.0 + dscale)
            if use_integer_offset:
                tx = numpy.random.randint(-doffset, doffset + 1)
                ty = numpy.random.randint(-doffset, doffset + 1)
            else:
                tx = numpy.random.uniform(-doffset, doffset)
                ty = numpy.random.uniform(-doffset, doffset)
            kx = numpy.random.uniform(-dshear, dshear)
            ky = numpy.random.uniform(-dshear, dshear)
            m = numpy.random.random() < mirror
            self.data[index] = self.transform_sample(
                self.data[index], theta, (s, s), (kx, ky), (tx, ty), m,
                bilinear)

    def augment_mirror(self):
        if self.get_data_type() == "image":
            self.data += [(f, im.transpose(Image.FLIP_LEFT_RIGHT), m)
                          for f, im, m in self.data]
        else:
            self.data += [(f, d[:, :, ::-1], m) for f, d, m in self.data]

    def set_data(self, data):
        self.data = [(f, d, m) for f, d, m in data
                     if not (self.partial_mode == "ignore" and
                             m.get("partial", True))]

    def export(self, batch_size=1, dtype=numpy.float32):
        """Pad to a batch multiple; returns (data_x NCHW, metas, true_size)."""
        size = batch_size * math.ceil(len(self) / batch_size)
        shape = self.get_data_shape()
        data_x = numpy.zeros((size, shape[0], shape[1], shape[2]), dtype=dtype)
        data_meta = []
        for i in range(size):
            index = i if i < len(self.data) else random.randint(0, len(self.data) - 1)
            fname, im_x, meta = self.data[index]
            if self.get_data_type() == "image":
                im_x = numpy.asarray(im_x, dtype=dtype) / 255.0
                im_x = im_x.transpose(2, 0, 1) if im_x.ndim == 3 else im_x[None]
            data_x[i] = im_x
            data_meta.append(meta)
        return data_x, data_meta, len(self.data)


def load(src_prefix, data_format, is_training=False, thread_num=1,
         class_labels=None):
    """Factory dispatching on the --extension format string
    (reference dataset/__init__.py:369-387)."""
    from denet_tpu.data.basic import DatasetFromArray, DatasetFromDir
    from denet_tpu.data.imagenet import DatasetImagenet
    from denet_tpu.data.mscoco import DatasetMSCOCO
    from denet_tpu.data.pascal_voc import DatasetPascalVOC

    if "imagenet" in data_format:
        data = DatasetImagenet()
    elif "mscoco" in data_format:
        data = DatasetMSCOCO()
    elif "voc" in data_format:
        data = DatasetPascalVOC()
    elif data_format in ("npy", "npz"):
        data = DatasetFromArray()
    else:
        data = DatasetFromDir()

    data.load(src_prefix, data_format, is_training, thread_num, class_labels)
    return data
