"""JSON (de)serialization with base64-encoded .npy blobs for ndarrays.

Wire/disk format is byte-compatible with the reference model format
(denet/common/json_util.py): numpy arrays are stored as
``{"__class__": "numpy.ndarray", "__value__": <base64 .npy>}`` inside
(optionally gzipped) JSON, so reference ``.mdl.gz`` files round-trip.
"""
import base64
import gzip
import io
import json
import os

import numpy


def numpy_to_json(obj):
    if isinstance(obj, numpy.ndarray):
        bio = io.BytesIO()
        numpy.save(bio, obj)
        return {"__class__": "numpy.ndarray",
                "__value__": base64.b64encode(bio.getvalue()).decode()}
    # jax arrays and numpy scalars
    if hasattr(obj, "__array__"):
        return numpy_to_json(numpy.asarray(obj))
    if isinstance(obj, (numpy.integer,)):
        return int(obj)
    if isinstance(obj, (numpy.floating,)):
        return float(obj)
    raise TypeError(type(obj))


def numpy_from_json(json_object):
    if "__class__" in json_object:
        if json_object["__class__"] == "numpy.ndarray":
            bio = io.BytesIO(base64.b64decode(json_object["__value__"]))
            return numpy.load(bio)
    return json_object


def json_from_gz(fname):
    with gzip.open(fname, "rt") as f:
        return json.load(f, object_hook=numpy_from_json)


def json_to_gz(fname, json_obj, compresslevel=9):
    with gzip.open(fname, "wt", compresslevel=compresslevel) as f:
        json.dump(json_obj, f, indent=2, default=numpy_to_json)


def json_from_file(fname):
    if os.path.splitext(fname)[1] == ".gz":
        return json_from_gz(fname)
    with open(fname, "rt") as f:
        return json.load(f, object_hook=numpy_from_json)


def json_to_file(fname, json_obj):
    if os.path.splitext(fname)[1] == ".gz":
        return json_to_gz(fname, json_obj)
    with open(fname, "wt") as f:
        json.dump(json_obj, f, indent=2, default=numpy_to_json)
