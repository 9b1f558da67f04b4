"""model-update-bn: recompute batch-norm mean/stdinv over a dataset.

Reference: denet/model/update_bn.py — which compiled one Theano function per
BN layer; here a single jitted eval-mode forward stashes every BN layer's
input statistics at once (see BatchNormLayer.apply bn_stats hook), then the
EMA state is overwritten with the dataset average.
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy

import denet_tpu.core.model as model_mod
import denet_tpu.data as dataset
import denet_tpu.utils.logging as logging
from denet_tpu.layers.base import Ctx


def find_bn_layers(model):
    """Yield (layer, state_ref) for every enabled BN layer incl. nested ones.
    state_ref is the mutable state dict in model.state."""
    found = []

    def walk(layer, state):
        if layer.type_name in ("batchnorm", "batchnorm-relu") and layer.enabled:
            found.append((layer, state))
        for i, sub in enumerate(layer.sublayers):
            walk(sub, state["layers"][i])

    for layer, state in zip(model.layers, model.state):
        walk(layer, state)
    return found


def compute_bn_stats(model, data_x, batch_size):
    """Average each BN layer's input mean/var over the dataset (eval mode)."""
    bn_layers = find_bn_layers(model)
    logging.info("Found %i batch norm layers" % len(bn_layers))
    ids = [id(layer) for layer, _ in bn_layers]

    def stats_fn(params, state, x):
        ctx = Ctx(train=False, bn_stats={})
        model.forward(params, state, x, ctx, use_remat=False)
        return [ctx.bn_stats[i] for i in ids]

    fn = jax.jit(stats_fn)

    n = data_x.shape[0] // batch_size
    sums = None
    for b in range(n):
        batch = jnp.asarray(data_x[b * batch_size:(b + 1) * batch_size])
        stats = fn(model.params, model.state, batch)
        if sums is None:
            sums = [(numpy.asarray(m, numpy.float64),
                     numpy.asarray(v, numpy.float64)) for m, v in stats]
        else:
            sums = [(sm + numpy.asarray(m, numpy.float64),
                     sv + numpy.asarray(v, numpy.float64))
                    for (sm, sv), (m, v) in zip(sums, stats)]

    eps = 1e-5
    results = []
    for (sm, sv) in sums:
        mean = (sm / n).astype(numpy.float32)
        var = (sv / n).astype(numpy.float32)
        stdinv = (1.0 / numpy.sqrt(var + eps)).astype(numpy.float32)
        results.append((mean, stdinv))
    return bn_layers, results


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Recompute batch-norm statistics over a dataset")
    logging.add_arguments(parser)
    parser.add_argument("--model", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--extension", default="png")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--thread-num", default=4, type=int)
    args = parser.parse_args(argv)
    logging.init(args)

    logging.info("Loading model:", args.model)
    model = model_mod.load_from_file(args.model, args.batch_size)

    logging.info("Loading Dataset...")
    data = dataset.load(args.input, args.extension, is_training=True,
                        thread_num=args.thread_num)
    data.shuffle()
    data.load_from_subset(0)
    data_x, _, dataset_size = data.export(args.batch_size)

    logging.info("Estimating BN stats with %i samples" % dataset_size)
    bn_layers, results = compute_bn_stats(model, data_x, args.batch_size)
    for i, ((layer, state), (mean, stdinv)) in enumerate(zip(bn_layers, results)):
        logging.verbose("Layer %i - old mean:" % i, state["mean"])
        logging.verbose("Layer %i - new mean:" % i, mean)
        state["mean"] = mean
        state["stdinv"] = stdinv

    model_mod.save_to_file(model, args.output)
    logging.info("Done")


if __name__ == "__main__":
    sys.exit(main())
