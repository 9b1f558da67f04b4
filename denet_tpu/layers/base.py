"""Layer contract for the TPU-native DeNet rebuild.

The reference (denet/layer/__init__.py:64-143) builds a Theano symbolic graph
eagerly inside each layer constructor and mutates global shared variables for
train/rng/epoch state.  Here construction only records *static* configuration
(shapes, hyper-parameters, initial parameter values); the compute is a pure
``apply(params, state, outputs, ctx)`` function evaluated inside one
jit-compiled step, with parameters and state as explicit pytrees.

Conventions
-----------
* Tensors are NCHW (matching the reference's logical layout; XLA:TPU performs
  its own physical layout assignment so this costs nothing on device).
* ``params`` holds trainable arrays, ``state`` holds non-trainable arrays
  (e.g. batch-norm EMAs).  Composite layers nest sublayer pytrees under the
  key ``"layers"``.
* ``ctx`` is a trace-time context: static train flag, PRNG key, iteration /
  epoch scalars, auxiliary device inputs (e.g. sample bboxes for the sparse
  layer) and a ``collect`` dict where cost layers stash tensors needed by
  their ``cost``/detection functions.
"""
import numpy

import jax
import jax.numpy as jnp


class Ctx:
    """Per-trace context threaded through layer ``apply`` calls."""

    def __init__(self, train=False, rng=None, epoch=0, iteration=0, aux=None,
                 compute_dtype=None, bn_stats=None):
        self.train = train          # static python bool
        self.rng = rng              # jax PRNG key (or None when unused)
        self.epoch = epoch          # traced or static scalar
        self.iteration = iteration  # traced or static scalar
        self.aux = aux or {}        # extra device inputs keyed by layer index
        self.collect = {}           # side outputs keyed by layer index
        self.compute_dtype = compute_dtype  # e.g. jnp.bfloat16 for the trunk
        self.bn_stats = bn_stats    # dict -> BN layers stash input stats here

    def layer_rng(self, layer_index):
        assert self.rng is not None, "Ctx.rng required for stochastic layers"
        return jax.random.fold_in(self.rng, layer_index)


class Layer:
    """Abstract layer: static config + functional init/apply."""

    type_name = "abstract"

    def __init__(self, layers):
        self.layer_index = len(layers)
        self.input_index = len(layers) - 1 if layers else -1
        self.input_shape = layers[-1].output_shape if layers else None
        self.output_shape = None
        self.has_split = False
        self.sublayers = []

    def __str__(self):
        return "%i:%s - input: %s output: %s" % (
            self.layer_index, self.type_name, self.input_shape, self.output_shape)

    # -- parameters / state --------------------------------------------------

    def init_params(self):
        """Trainable parameter pytree (numpy arrays)."""
        p = self._own_params()
        if self.sublayers:
            p["layers"] = [s.init_params() for s in self.sublayers]
        return p

    def init_state(self):
        """Non-trainable state pytree (numpy arrays)."""
        s = self._own_state()
        if self.sublayers:
            s["layers"] = [sub.init_state() for sub in self.sublayers]
        return s

    def _own_params(self):
        return {}

    def _own_state(self):
        return {}

    def param_roles(self, params):
        """Pytree of "weight"/"bias" strings matching ``params`` — used to
        build the L2-decay mask (reference applies decay to weights only,
        denet/model/model_cnn.py:320-324)."""
        roles = {k: self._role_of(k) for k in params if k != "layers"}
        if "layers" in params:
            roles["layers"] = [s.param_roles(p) for s, p in
                               zip(self.sublayers, params["layers"])]
        return roles

    def _role_of(self, name):
        return "weight" if name == "weight" else "bias"

    # -- compute -------------------------------------------------------------

    def apply(self, params, state, outputs, ctx):
        """Compute output given the list of prior layer outputs.

        Returns ``(y, new_state)`` where ``new_state`` is {} for stateless
        layers (the driver then reuses the old state pytree).
        """
        raise NotImplementedError

    def _apply_sublayers(self, params, state, x, ctx):
        """Run self.sublayers as a private sequential chain.

        By convention (mirroring the reference's composite layers, e.g.
        denet/layer/resnet.py:52) ``sublayers[0]`` is an InitialLayer standing
        for the composite's input ``x``; each later sublayer reads
        ``outs[sub.input_index]`` so non-sequential wiring (shortcut convs)
        works.  Returns (outs, new_sub_states) — outs[i] is sublayer i output.
        """
        outs = [x]
        new_states = [{}]
        sub_params = params.get("layers", [{}] * len(self.sublayers))
        sub_state = state.get("layers", [{}] * len(self.sublayers))
        for i, sub in enumerate(self.sublayers[1:], start=1):
            y, ns = sub.apply(sub_params[i], sub_state[i], outs, ctx)
            outs.append(y)
            new_states.append(ns if ns else sub_state[i])
        return outs, new_states

    # -- training hooks ------------------------------------------------------

    def has_cost(self):
        return False

    def cost(self, collect, yt_index, yt_value):
        """Per-layer training cost given stashed tensors from apply()."""
        return None

    def target_sizes(self):
        """Static (yt_index_len, yt_value_len) for this cost layer."""
        return (0, 0)

    def get_target(self, model, data_x, metas):
        """Host-side target generation -> (yt_index, yt_value) numpy arrays."""
        return None

    # -- serialization (reference JSON v3 compatible) ------------------------

    def export_json(self, params, state):
        j = {"type": self.type_name}
        if self.sublayers:
            j["layers"] = [s.export_json(p, st) for s, p, st in zip(
                self.sublayers, params.get("layers", [{}] * len(self.sublayers)),
                state.get("layers", [{}] * len(self.sublayers)))]
        else:
            j["layers"] = []
        return j

    def import_json(self, json_param):
        """Returns (params, state) pytrees loaded from a JSON layer dict."""
        p, s = self._own_import(json_param)
        if self.sublayers:
            sub = json_param.get("layers", [])
            ps, ss = [], []
            for i, layer in enumerate(self.sublayers):
                pi, si = layer.import_json(sub[i]) if i < len(sub) else (
                    layer.init_params(), layer.init_state())
                ps.append(pi)
                ss.append(si)
            p["layers"] = ps
            s["layers"] = ss
        return p, s

    def _own_import(self, json_param):
        return self._own_params(), self._own_state()

    # -- DSL -----------------------------------------------------------------

    @staticmethod
    def parse_desc(layers, name, tags, params):
        return False


class InitialLayer(Layer):
    """Holds the model input; output index 0 in the outputs list."""

    type_name = "initial"

    def __init__(self, input_shape):
        super().__init__([])
        self.layer_index = 0
        self.input_shape = self.output_shape = tuple(input_shape)

    def apply(self, params, state, outputs, ctx):
        return outputs[0], {}


class IdentityLayer(Layer):
    type_name = "identity"

    def __init__(self, layers, json_param=None):
        super().__init__(layers)
        self.output_shape = self.input_shape

    def apply(self, params, state, outputs, ctx):
        return outputs[self.input_index], {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        return False


def to_f32(x):
    return numpy.asarray(x, dtype=numpy.float32)


def conv_weight_init(filter_shape, wb):
    """He / Xavier initialization exactly as the reference
    (denet/layer/convolution.py:27-48).  filter_shape is OIHW."""
    import math
    if isinstance(wb, (float, int)):
        w_bound = float(wb)
    elif "he-forward" in wb:
        w_bound = math.sqrt(2.0 / (filter_shape[2] * filter_shape[3] * filter_shape[1]))
    elif "he-backward" in wb:
        w_bound = math.sqrt(2.0 / (filter_shape[2] * filter_shape[3] * filter_shape[0]))
    elif "xavier-forward" in wb:
        w_bound = math.sqrt(1.0 / (filter_shape[2] * filter_shape[3] * filter_shape[1]))
    elif "xavier-backward" in wb:
        w_bound = math.sqrt(1.0 / (filter_shape[2] * filter_shape[3] * filter_shape[0]))
    else:
        raise Exception("Unknown weight init: %s" % wb)

    if w_bound > 0:
        if isinstance(wb, str) and "uniform" in wb:
            w = numpy.random.uniform(-w_bound, w_bound, size=filter_shape)
        else:
            w = numpy.random.normal(0.0, w_bound, size=filter_shape)
    else:
        w = numpy.zeros(shape=filter_shape)
    return to_f32(w), w_bound


def log_softmax(x, axis):
    """Numerically stable log-softmax (reference theano_util.py:27-29)."""
    xdev = x - jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    return xdev - jnp.log(jnp.sum(jnp.exp(xdev), axis=axis, keepdims=True))


def smooth_l1(x):
    x_abs = jnp.abs(x)
    return jnp.where(x_abs < 1, 0.5 * x * x, x_abs - 0.5)
