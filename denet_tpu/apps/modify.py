"""model-modify: offline model surgery CLI.

Reference-compatible surface (denet/model/modify.py): change class-num /
image-size, merge split layers (--merge makes SPLIT/SKIPSRC.X plain
pass-throughs for inference), fuse BN+ReLU into BNA, modify BN params, set
arbitrary layer attributes, insert/remove/append layers by desc.  Surgery
follows the reference's save->reload pattern so shapes re-derive from the
mutated config.
"""
import argparse
import random
import sys

import numpy

import denet_tpu.core.model as model_mod
import denet_tpu.utils.logging as logging


def convert_bn_relu_json(json_obj):
    """Fuse batchnorm + relu-activation JSON pairs into batchnorm-relu."""

    def fuse_list(layer_list):
        out = []
        i = 0
        while i < len(layer_list):
            cur = layer_list[i]
            nxt = layer_list[i + 1] if i + 1 < len(layer_list) else None
            if (cur["type"] == "batchnorm" and nxt is not None and
                    nxt["type"] == "activation" and
                    nxt.get("activation") == "relu"):
                logging.info("Merging batchnorm+relu layer")
                fused = dict(cur)
                fused["type"] = "batchnorm-relu"
                out.append(fused)
                i += 2
                continue
            if cur["type"] == "resnet" and "bnrelu" not in cur.get("version", ""):
                logging.info("Updating resnet layer")
                cur = dict(cur)
                cur["layers"] = fuse_list(cur["layers"])
                cur["version"] = cur.get("version", "original") + ",bnrelu"
            out.append(cur)
            i += 1
        return out

    json_obj = dict(json_obj)
    json_obj["layers"] = fuse_list(json_obj["layers"])
    return json_obj


def build_parser():
    parser = argparse.ArgumentParser(description="Modify CNN model")
    logging.add_arguments(parser)
    parser.add_argument("--seed", type=int, default=23455)
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--class-num", type=int, default=None)
    parser.add_argument("--image-size", nargs="+", type=int, default=None)
    parser.add_argument("--use-cudnn-pool", default=False, action="store_true")
    parser.add_argument("--optimize-bn", default=False, action="store_true")
    parser.add_argument("--convert-bn-relu", default=False, action="store_true")
    parser.add_argument("--merge", default=False, action="store_true",
                        help="merge split layers")
    parser.add_argument("--modify-bn", default=None, nargs="+", type=str)
    parser.add_argument("--modify-layer", default=None, nargs="+", type=str)
    parser.add_argument("--layer-insert", default=[], nargs="+")
    parser.add_argument("--layer-remove", default=0, type=int)
    parser.add_argument("--layer-append", default=[], nargs="+", type=str)
    parser.add_argument("--border-mode", default="half")
    parser.add_argument("--activation", default="relu")
    parser.add_argument("--weight-init", nargs="+", default=["he-backward"])
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.init(args)
    random.seed(args.seed)
    numpy.random.seed(args.seed)

    model = model_mod.load_from_file(args.input)

    model_reload = False
    if args.class_num is not None:
        model.class_num = args.class_num
        model_reload = True

    if args.image_size is not None:
        model.data_shape = (3, args.image_size[1], args.image_size[0])
        model_reload = True

    for layer in model.layers:
        if layer.type_name in ("activation", "resnet") and \
                layer.activation != args.activation:
            layer.activation = args.activation
            model_reload = True

    if args.merge:
        logging.info("Merging split layers")
        model_reload = True
        for layer in model.layers:
            if layer.type_name == "split":
                layer.enabled = False
                layer.has_split = False
            elif layer.type_name == "skip-src":
                layer.has_split = False

    if args.use_cudnn_pool:
        for layer in model.layers:
            if layer.type_name == "pool" and not layer.ignore_border:
                layer.pad = (1, 1)
                layer.ignore_border = True
                model_reload = True

    if args.modify_bn is not None:
        update = {"enabled": bool(int(args.modify_bn[0])),
                  "momentum": float(args.modify_bn[1]),
                  "eps": float(args.modify_bn[2])}
        logging.info("Updating batch norm layers:", update)

        def walk(layer):
            if layer.type_name in ("batchnorm", "batchnorm-relu"):
                layer.enabled = update["enabled"]
                layer.momentum = update["momentum"]
                layer.eps = update["eps"]
            if layer.type_name == "resnet":
                layer.bn_json_param.update(update)
            for sub in layer.sublayers:
                walk(sub)

        for layer in model.layers:
            walk(layer)
        model_reload = True

    if args.modify_layer is not None:
        layer_name = args.modify_layer[0]
        for layer in model.layers:
            if layer.type_name == layer_name:
                for param in args.modify_layer[1:]:
                    name, raw = param.split("=")
                    cur = getattr(layer, name)
                    if isinstance(cur, bool):
                        val = {"True": True, "False": False, "0": False,
                               "1": True}[raw]
                    else:
                        val = type(cur)(raw)
                    logging.info("%s - modifying %s from %s to %s" % (
                        layer_name, name, cur, val))
                    setattr(layer, name, val)
                break
        model_reload = True

    if args.layer_remove > 0:
        logging.info("Removing layers:",
                     [l.type_name for l in model.layers[-args.layer_remove:]])
        model.layers = model.layers[:-args.layer_remove]
        model.params = model.params[:-args.layer_remove]
        model.state = model.state[:-args.layer_remove]
        model_reload = True

    if model_reload:
        model_mod.save_to_file(model, args.output)
        model = model_mod.load_from_file(args.output)
        model_reload = False

    if args.convert_bn_relu:
        logging.info("Fusing batchnorm+relu layers")
        json_obj = convert_bn_relu_json(model.export_json())
        model = model_mod.load_from_json(json_obj, model.batch_size)
        model_mod.save_to_file(model, args.output)
        model = model_mod.load_from_file(args.output)

    if len(args.layer_insert) > 0:
        logging.info("Inserting new layers:", args.layer_insert)
        for s in args.layer_insert:
            index, desc = s.split(":")
            index = int(index)
            if index > len(model.layers):
                raise Exception("index %i too large (%i layers)" % (
                    index, len(model.layers)))
            layers_before = list(model.layers[:index])
            n_before = len(layers_before)
            model.build_layer(desc, layers_before, args.activation,
                              args.border_mode, args.weight_init[0])
            new_layers = layers_before[n_before:]
            model.layers = layers_before + list(model.layers[index:])
            model.params = (model.params[:index] +
                            [l.init_params() for l in new_layers] +
                            model.params[index:])
            model.state = (model.state[:index] +
                           [l.init_state() for l in new_layers] +
                           model.state[index:])
        model_mod.save_to_file(model, args.output)
        model = model_mod.load_from_file(args.output)

    if len(args.layer_append) > 0:
        logging.info("Adding new layers:", args.layer_append)
        for layer_desc in args.layer_append:
            n_before = len(model.layers)
            model.build_layer(layer_desc, model.layers, args.activation,
                              args.border_mode, args.weight_init[0])
            for layer in model.layers[n_before:]:
                model.params.append(layer.init_params())
                model.state.append(layer.init_state())
        model_mod.save_to_file(model, args.output)

    logging.info("--------FINAL MODEL---------")
    model = model_mod.load_from_file(args.output)
    for layer in model.layers:
        logging.info(layer.type_name)
    logging.info("Done")


if __name__ == "__main__":
    sys.exit(main())
