"""model-train: single-chip training CLI.

Reference-compatible surface (denet/model/train.py): same flags, epoch loop
(shuffle -> subset load -> train epoch), per-epoch test error files, LR
annealing, per-epoch ``.mdl.gz`` checkpoints.
"""
import argparse
import random
import sys

import numpy

import denet_tpu.core.model as model_mod
import denet_tpu.data as dataset
import denet_tpu.utils as common
import denet_tpu.utils.logging as logging
from denet_tpu.train.trainer import Trainer


def compute_error(data, model):
    """Per-class top-1 error over every subset."""
    class_errors = [0] * model.class_num
    class_samples = [0] * model.class_num
    for subset in range(data.subset_num):
        data.load_from_subset(subset)
        logging.info("Computing error...")
        labels_predict = model.predict_label(data)
        labels = data.get_labels()
        for i in range(len(data)):
            class_samples[labels[i]] += 1
            if labels_predict[i] != labels[i]:
                class_errors[labels[i]] += 1

    error = 100.0 * sum(class_errors) / max(1, sum(class_samples))
    class_errors = [(i, 100.0 * class_errors[i] / max(1, class_samples[i]),
                     class_samples[i]) for i in range(model.class_num)]
    return error, class_errors


def save_results(fname, error, class_errors):
    with open(fname, "w") as f:
        print("Overall Error=%.2f%%" % error, file=f)
        for d in class_errors:
            print("Class %i=%.2f%% (%i samples)" % (d[0], d[1],
                                                    d[2] * d[1] / 100), file=f)


def parse_distort_mode(tokens):
    """``--distort-mode o4 s0.1 r10 m0.5`` tokens -> distort_affine kwargs
    (offset px, scale fraction, rotation degrees, mirror probability —
    reference README.md:76-82)."""
    kwargs = {}
    for tok in tokens:
        if not tok or tok in ("default", "disable"):
            continue
        key, val = tok[0], tok[1:]
        if key == "o":
            kwargs["doffset"] = float(val)
            kwargs["use_integer_offset"] = True
        elif key == "s":
            kwargs["dscale"] = float(val)
        elif key == "r":
            kwargs["dtheta"] = float(val)
        elif key == "m":
            kwargs["mirror"] = float(val)
    return kwargs


def build_parser():
    parser = argparse.ArgumentParser(
        description="Train a convolutional network using labelled data.")
    logging.add_arguments(parser)
    parser.add_argument("--model", default=None, help="Model to continue training.")
    parser.add_argument("--cost-factors", default=[], nargs="+", type=float,
                        help="Multiplicative factors for model costs")
    parser.add_argument("--thread-num", type=int, default=1)
    parser.add_argument("--extension", default="ppm", help="Image file extension")
    parser.add_argument("--train", default=None, help="Training data folder")
    parser.add_argument("--test", default=None, help="Testing data folder")
    parser.add_argument("--test-epochs", type=int, default=1)
    parser.add_argument("--test-mode", default="default")
    parser.add_argument("--border-mode", default="valid")
    parser.add_argument("--output-prefix", default="./model")
    parser.add_argument("--activation", default="relu")
    parser.add_argument("--solver", type=str, default="nesterov")
    parser.add_argument("--weight-init", nargs="+", default=["he-backward"])
    parser.add_argument("--learn-rate", type=float, default=0.1)
    parser.add_argument("--learn-momentum", type=float, default=[0.0, 0.0],
                        nargs="+")
    parser.add_argument("--learn-anneal", type=float, default=1)
    parser.add_argument("--learn-anneal-epochs", nargs="+", type=int, default=[])
    parser.add_argument("--learn-decay", type=float, default=0.0)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--max-samples", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--seed", type=int, default=23455)
    parser.add_argument("--distort-mode", default=[], nargs="+")
    parser.add_argument("--disable-intermediate", default=False,
                        action="store_true")
    parser.add_argument("--augment-mirror", default=False, action="store_true")
    parser.add_argument("--skip-train", default=False, action="store_true")
    parser.add_argument("--skip-layer-updates", type=int, nargs="+", default=[])
    parser.add_argument("--gradient-clip", type=float, default=0.0)
    parser.add_argument("--use-acc-mode", default=False, action="store_true")
    parser.add_argument("--pipeline-targets", default=False,
                        action="store_true",
                        help="Overlap host target generation with the device "
                             "step (one-step-stale sample selection)")
    parser.add_argument("--device-targets", default=False,
                        action="store_true",
                        help="Fuse sample selection + target construction "
                             "into the train step on device (detection "
                             "models; removes per-step host target work)")
    parser.add_argument("--cost-read-interval", type=int, default=8,
                        help="Pipelined epochs read cost scalars in blocks "
                             "of K (one stacked device read per block; "
                             "per-step reads serialize the loop)")
    parser.add_argument("--no-remat", default=False, action="store_true",
                        help="Disable split-mode rematerialization (faster "
                             "when the model fits in HBM without it)")
    parser.add_argument("--compute-dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="Trunk compute dtype (bfloat16 feeds the MXU at "
                             "2x rate)")
    parser.add_argument("--model-desc", default=["C[100,7]", "P[2]", "C[150,4]",
                                                 "P[2]", "C[250,4]", "P[2]",
                                                 "C[300,1]", "R"], nargs="+")
    return parser


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.train is None:
        parser.error("--train is required")
    logging.init(args)

    random.seed(args.seed)
    numpy.random.seed(args.seed)

    logging.info("Loading training data:", args.train)
    train_data = dataset.load(args.train, args.extension, is_training=True,
                              thread_num=args.thread_num)
    train_data.load_from_subset(0)
    data_shape = train_data.get_data_shape()
    class_num = train_data.get_class_num()
    class_labels = train_data.class_labels
    logging.info("Found %i class labels" % class_num)

    if args.max_samples is not None:
        train_data.data = random.sample(train_data.data, args.max_samples)

    if args.augment_mirror:
        train_data.augment_mirror()

    logging.info("Training: %i samples" % len(train_data))

    if args.test:
        logging.info("Loading test: " + args.test)
        test_data = dataset.load(args.test, args.extension, is_training=False,
                                 thread_num=args.thread_num,
                                 class_labels=class_labels)

    model = model_mod.initialize(args, data_shape, class_labels, class_num)
    model.gradient_clip = args.gradient_clip
    if args.compute_dtype == "bfloat16":
        import jax.numpy as jnp
        model.compute_dtype = jnp.bfloat16
    trainer = Trainer(model, args.solver, args.cost_factors,
                      use_acc_mode=args.use_acc_mode, seed=args.seed,
                      pipeline_targets=args.pipeline_targets,
                      device_targets=args.device_targets,
                      cost_read_interval=args.cost_read_interval,
                      use_remat=(False if args.no_remat else None))

    learn_rate = args.learn_rate
    for epoch in range(args.epochs):
        logging.info("----- Training Epoch: %i -----" % epoch)

        if not args.skip_train:
            logging.info("Training with solver %s, learning rate %s, momentum "
                         "%s" % (args.solver, learn_rate, args.learn_momentum))
            train_data.shuffle()
            distort_kwargs = parse_distort_mode(args.distort_mode)
            for subset in range(train_data.subset_num):
                timer = common.Timer()
                train_data.load_from_subset(subset)
                if distort_kwargs:
                    train_data.distort_affine(**distort_kwargs)
                logging.info("Performing gradient descent...")
                cost = trainer.train_epoch(train_data, epoch, learn_rate,
                                           args.learn_momentum,
                                           args.learn_decay)
                logging.info("Training subset %i - Cost: %.3f, Took %.1f sec" % (
                    subset, cost, timer.current()))

        if len(args.learn_anneal_epochs) == 0 or \
                (epoch + 1) in args.learn_anneal_epochs:
            logging.verbose("Annealing learning rate")
            learn_rate *= args.learn_anneal

        if args.test is not None and ((epoch % args.test_epochs) == 0 or
                                      epoch == (args.epochs - 1)):
            test_error, test_class_errors = compute_error(test_data, model)
            logging.info("Epoch %i test error: %.2f%%" % (epoch, test_error))
            save_results(args.output_prefix + "_epoch%03i.test" % epoch,
                         test_error, test_class_errors)

        if not args.disable_intermediate:
            model_mod.save_to_file(model,
                                   args.output_prefix + "_epoch%03i.mdl.gz" % epoch)

    model_mod.save_to_file(model,
                           args.output_prefix + "_epoch%03i_final.mdl.gz" % epoch)
    logging.info("Finished Training")


if __name__ == "__main__":
    sys.exit(main())
