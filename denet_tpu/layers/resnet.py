"""Residual block layer (`RSN` / `nRSN` desc tokens).

Reference: denet/layer/resnet.py — original or pre-activation designs,
optional bottleneck, composed of Conv/BN(+ReLU)/Activation sublayers, with a
1x1 projection shortcut (plus BN for the original design) when the input and
output shapes differ.  Pre-activation shortcuts branch from the *post-BN*
tensor (resnet.py:91-96).
"""
from denet_tpu.layers.activation import ActivationLayer, apply_activation
from denet_tpu.layers.base import InitialLayer, Layer
from denet_tpu.layers.batch_norm import BatchNormLayer, BatchNormReluLayer
from denet_tpu.layers.convolution import ConvLayer


class ResnetLayer(Layer):
    type_name = "resnet"

    def __init__(self, layers, filter_shape=None, stride=(1, 1), bottleneck=0,
                 activation="relu", version="original", json_param=None):
        super().__init__(layers)
        json_param = json_param or {}

        self.filter_shape = tuple(json_param.get("shape", filter_shape))
        self.stride = tuple(json_param.get("stride", stride))
        self.bottleneck = json_param.get("bottleneck", bottleneck)
        self.version = json_param.get("version", version)
        self.activation = json_param.get("activation", activation)
        self.bn_json_param = json_param.get("bnParam", {
            "enabled": json_param.get("enableBatchNorm", True)})

        if self.bottleneck > 0:
            self.size = (self.filter_shape[2], self.filter_shape[3])
            shape0 = (self.bottleneck, self.filter_shape[1], 1, 1)
            shape1 = (self.bottleneck, self.bottleneck,
                      self.filter_shape[2], self.filter_shape[3])
            shape2 = (self.filter_shape[0], self.bottleneck, 1, 1)
        else:
            self.size = (self.filter_shape[2] * 2 - 1, self.filter_shape[3] * 2 - 1)
            shape0 = self.filter_shape
            shape1 = (self.filter_shape[0], self.filter_shape[0],
                      self.filter_shape[2], self.filter_shape[3])
            shape2 = None

        def add_bn_act(subs):
            if "bnrelu" in self.version and self.activation == "relu":
                subs.append(BatchNormReluLayer(subs, json_param=self.bn_json_param))
            else:
                subs.append(BatchNormLayer(subs, json_param=self.bn_json_param))
                subs.append(ActivationLayer(subs, self.activation))

        subs = [InitialLayer(self.input_shape)]
        if "pre-activation" in self.version:
            add_bn_act(subs)
        subs.append(ConvLayer(subs, filter_shape=shape0, filter_stride=self.stride,
                              border_mode="half", use_bias=False))
        add_bn_act(subs)
        subs.append(ConvLayer(subs, filter_shape=shape1, border_mode="half",
                              use_bias=False))
        if self.bottleneck > 0:
            add_bn_act(subs)
            subs.append(ConvLayer(subs, filter_shape=shape2, border_mode="half",
                                  use_bias=False))
        if "pre-activation" not in self.version:
            subs.append(BatchNormLayer(subs, json_param=self.bn_json_param))

        self._main_index = len(subs) - 1
        y_shape = subs[-1].output_shape

        # projection shortcut when shapes differ
        self._shortcut_index = 0
        if self.input_shape != y_shape:
            if "pre-activation" in self.version:
                # shortcut branches from the post-BN tensor (sublayer 1)
                shortcut_input = subs[0:2]
            else:
                shortcut_input = [InitialLayer(self.input_shape)]
            proj = ConvLayer(shortcut_input,
                             filter_shape=(y_shape[1], shortcut_input[-1].output_shape[1], 1, 1),
                             filter_stride=self.stride, use_bias=False,
                             border_mode="half")
            # rebase onto the full sublayer chain
            proj.input_index = len(shortcut_input) - 1
            subs.append(proj)
            if "original" in self.version:
                subs.append(BatchNormLayer(subs, json_param=self.bn_json_param))
            self._shortcut_index = len(subs) - 1

        self.sublayers = subs
        self.output_shape = y_shape

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        outs, new_states = self._apply_sublayers(params, state, x, ctx)
        y = outs[self._main_index]
        shortcut = outs[self._shortcut_index]
        if "pre-activation" in self.version:
            out = shortcut + y
        else:
            out = apply_activation(shortcut + y, self.activation)
        return out, {"layers": new_states}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name == "RSN":
            version = "original" if "O" in tags else "pre-activation"
            filter_shape = (params.get(0), layers[-1].output_shape[1],
                            params.get(1), params.get(1))
            filter_stride = (params.get(2, 1), params.get(2, 1))
            bottleneck = params.get(3, 0)
            layers.append(ResnetLayer(layers, filter_shape, filter_stride,
                                      bottleneck, params["activation"], version))
            return True
        if name == "nRSN":
            version = "original" if "O" in tags else "pre-activation"
            bottleneck = params.get(4, 0)
            for i in range(params.get(0)):
                filter_shape = (params.get(1), layers[-1].output_shape[1],
                                params.get(2), params.get(2))
                filter_stride = (params.get(3, 1), params.get(3, 1)) if i == 0 else (1, 1)
                layers.append(ResnetLayer(layers, filter_shape, filter_stride,
                                          bottleneck, params["activation"], version))
            return True
        return False

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"shape": list(self.filter_shape), "stride": list(self.stride),
                  "bottleneck": self.bottleneck, "bnParam": self.bn_json_param,
                  "activation": self.activation, "version": self.version})
        return j

    def import_json(self, json_param):
        # reference skips legacy "identity" entries (resnet.py:144-155)
        sub_json = [sj for sj in json_param.get("layers", [])
                    if sj["type"] != "identity"]
        ps, ss = [], []
        for i, layer in enumerate(self.sublayers):
            if i < len(sub_json):
                assert sub_json[i]["type"] == layer.type_name, (
                    sub_json[i]["type"], layer.type_name)
                pi, si = layer.import_json(sub_json[i])
            else:
                pi, si = layer.init_params(), layer.init_state()
            ps.append(pi)
            ss.append(si)
        return {"layers": ps}, {"layers": ss}
