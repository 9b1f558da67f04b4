"""model-train-multi: multi-chip (and multi-host) training CLI.

Reference-compatible surface (denet/model/train_multi.py) with a TPU-native
engine: the reference's one-process-per-GPU workers with shared-memory
parameter averaging and the TCP/MPI UpdateServer collapse into a single
GSPMD data-parallel jit step over a device mesh (denet_tpu/parallel/mesh.py);
multi-host runs join the mesh via ``jax.distributed`` (--coordinator /
--num-processes / --process-id replace the --update-server transport).

Preserved semantics: identical-seed shuffle per epoch across hosts
(train_multi.py:41-43), double-buffered background subset export,
``--batch-size-factor`` micro-batching (optionally with --use-acc-mode
parameter averaging), restart from pickled train.args + newest
``*_epoch*.mdl.gz``, timed intermediate checkpoints (--model-save-dt).
The reference's first-run model-dims.json two-phase startup was a Theano
shared-memory sizing hack with no TPU equivalent needed.
"""
import argparse
import math
import os
import pickle
import random
import sys
import time

import numpy

import denet_tpu.core.model as model_mod
import denet_tpu.data as dataset
import denet_tpu.utils as common
import denet_tpu.utils.logging as logging
from denet_tpu.data import DatasetExportThread
from denet_tpu.parallel import mesh as mesh_mod
from denet_tpu.train.trainer import Trainer
from denet_tpu.apps.train import compute_error, save_results


def run_train_epoch(args, epoch, trainer, model, train_data, learn_rate,
                    subset_start=0):
    logging.info("Perform train...")
    model_save_dt = args.model_save_dt * 60

    # identical shuffle order on every host
    random.seed(args.seed + epoch)
    train_data.shuffle()

    n_dev = trainer.mesh.devices.size if trainer.mesh is not None else 1
    super_batch = model.batch_size * args.batch_size_factor
    logging.info("SGD batch size is %ix%i = %i (over %i devices)" % (
        args.batch_size_factor, model.batch_size, super_batch, n_dev))

    subset_num = min(train_data.subset_num, args.subset_max)
    export_thread = DatasetExportThread(model, train_data, subset_start,
                                        super_batch, True)
    total_cost = 0.0
    total_it = 0
    timer_save = common.Timer()
    for subset in range(subset_start, subset_num):
        timer = common.Timer()
        export_thread.wait()
        data_x, data_m, data_size = export_thread.get_export()
        if timer.current() > 1:
            logging.warning("needed an additional %.1f sec for dataset "
                            "export" % timer.current())

        if subset + 1 < subset_num:
            export_thread = DatasetExportThread(model, train_data, subset + 1,
                                                super_batch, True)

        logging.info("Evaluating training function")
        timer.reset()
        batch_num = data_x.shape[0] // model.batch_size
        it_num = max(1, batch_num // args.batch_size_factor)
        subset_cost = 0.0
        index = 0
        while index < batch_num:
            ts = time.time()
            if args.use_acc_mode:
                trainer.train_begin()
            batch_cost = 0.0
            steps = 0
            for _ in range(args.batch_size_factor):
                if index >= batch_num:
                    break
                dx = data_x[index * model.batch_size:(index + 1) * model.batch_size]
                dm = data_m[index * model.batch_size:(index + 1) * model.batch_size]
                cost, _ = trainer.train_step(dx, dm, epoch, model.iteration,
                                             learn_rate, args.learn_momentum,
                                             args.learn_decay)
                if math.isnan(cost):
                    raise Exception("ERROR: Cost is NaN")
                batch_cost += cost
                model.iteration += 1
                index += 1
                steps += 1
            if args.use_acc_mode:
                trainer.train_end()
            batch_cost /= max(1, steps)
            subset_cost += batch_cost
            logging.info("Subset %i/%i, Batch It %i/%i - Cost: %s, "
                         "Time: %i ms" % (subset + 1, subset_num,
                                          index // args.batch_size_factor,
                                          it_num, batch_cost,
                                          1000 * (time.time() - ts)))

        logging.info("Training subset %i took %0.1f sec, mean cost: %s" % (
            subset + 1, timer.current(), subset_cost / it_num))
        total_it += it_num
        total_cost += subset_cost

        if model_save_dt > 0 and timer_save.current() > model_save_dt:
            model_mod.save_to_file(model, args.output_prefix +
                                   "_epoch%03i_subset%03i.mdl.gz" % (epoch,
                                                                     subset + 1))
            timer_save.reset()

    model_mod.save_to_file(model,
                           args.output_prefix + "_epoch%03i_final.mdl.gz" % epoch)
    return total_cost / max(1, total_it)


def load_restart_args(args_fname, args):
    if not os.path.isfile(args_fname):
        raise Exception("Cannot find arguments file: " + args_fname)
    logging.info("Loading arguments from:", args_fname)
    with open(args_fname, "rb") as f:
        args = pickle.load(f)

    model_fnames = common.find_files(os.path.dirname(args.output_prefix) or ".",
                                     "*_epoch*.mdl.gz")
    if len(model_fnames) == 0:
        raise Exception("Could not find any intermediate models to continue "
                        "training from!")

    v = os.path.basename(model_fnames[-1])
    v = v[:v.find(".")].split("_")
    if v[-1] == "final":
        args.epoch_start = int(v[-2][5:]) + 1
        args.subset_start = 0
    else:
        # intermediate names are 1-based ("subset003" = subsets 0..2 done), so
        # the resume index IS the parsed value (the reference added another +1,
        # silently skipping one subset per restart — train_multi.py:263-264)
        args.epoch_start = int(v[-2][5:])
        args.subset_start = int(v[-1][6:])

    args.model = model_fnames[-1]
    logging.info("Continuing training with model:", args.model, "epoch:",
                 args.epoch_start, "subset:", args.subset_start)
    return args


def build_parser():
    parser = argparse.ArgumentParser(
        description="Train a convolutional network over a device mesh")
    logging.add_arguments(parser)
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
    parser.add_argument("--cost-factors", default=[], nargs="+", type=float)
    parser.add_argument("--model-save-dt", default=30, type=int,
                        help="Minutes between intermediate model saves (0 off)")
    parser.add_argument("--model", default=None)
    parser.add_argument("--devices", type=int, default=None,
                        help="Number of mesh devices (default: all)")
    parser.add_argument("--coordinator", default=None,
                        help="Multi-host coordinator address (jax.distributed)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--subset-max", type=int, default=10000000)
    parser.add_argument("--train", default=None)
    parser.add_argument("--test", default=None)
    parser.add_argument("--test-mode", default="default")
    parser.add_argument("--test-epochs", type=int, default=1)
    parser.add_argument("--thread-num", type=int, default=1)
    parser.add_argument("--extension", default="ppm")
    parser.add_argument("--activation", default="relu")
    parser.add_argument("--border-mode", default="half")
    parser.add_argument("--output-prefix", default="./model")
    parser.add_argument("--solver", type=str, default="nesterov")
    parser.add_argument("--weight-init", nargs="+", default=["he-backward"])
    parser.add_argument("--initial-tune", type=float, default=0.0)
    parser.add_argument("--learn-rate", type=float, default=0.1)
    parser.add_argument("--learn-momentum", type=float, default=[0.0, 0.0],
                        nargs="+")
    parser.add_argument("--learn-anneal", type=float, default=1)
    parser.add_argument("--learn-anneal-epochs", nargs="+", type=int, default=[])
    parser.add_argument("--learn-decay", type=float, default=0.0)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--epoch-start", type=int, default=0)
    parser.add_argument("--subset-start", type=int, default=0)
    parser.add_argument("--max-samples", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=32,
                        help="GLOBAL batch size per step (sharded over mesh)")
    parser.add_argument("--batch-size-factor", type=int, default=1)
    parser.add_argument("--seed", type=int, default=23455)
    parser.add_argument("--distort-mode", default=[], nargs="+")
    parser.add_argument("--augment-mirror", default=False, action="store_true")
    parser.add_argument("--skip-train", default=False, action="store_true")
    parser.add_argument("--skip-layer-updates", type=int, nargs="+", default=[])
    parser.add_argument("--gradient-clip", type=float, default=0.0)
    # accepted for reference CLI compatibility; the reference parses these
    # but never consumes them (train_multi.py:309-312)
    parser.add_argument("--batch-data-size", type=int, default=1,
                        help=argparse.SUPPRESS)
    parser.add_argument("--split-seed", type=int, default=0,
                        help=argparse.SUPPRESS)
    parser.add_argument("--export-symbolic", default=None,
                        help=argparse.SUPPRESS)
    parser.add_argument("--model-desc", default=["C[100,7]", "P[2]", "C[150,4]",
                                                 "P[2]", "C[250,4]", "P[2]",
                                                 "C[300,1]", "R"], nargs="+")
    parser.add_argument("--restart", default=False, action="store_true")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.init(args)

    args_fname = "./train.args"
    if args.restart:
        args = load_restart_args(args_fname, args)
    else:
        logging.info("Exporting arguments:", args_fname)
        with open(args_fname, "wb") as f:
            pickle.dump(args, f)

    mesh_mod.init_distributed(args.coordinator, args.num_processes,
                              args.process_id)

    random.seed(args.seed)
    numpy.random.seed(args.seed)

    logging.info("Loading training data: " + str(args.train))
    train_data = dataset.load(args.train, args.extension, is_training=True,
                              thread_num=args.thread_num)
    train_data.load_from_subset(0)
    data_shape = train_data.get_data_shape()
    class_num = train_data.get_class_num()
    class_labels = train_data.class_labels
    logging.info("Found %i samples across %i class labels" % (
        train_data.get_total_size(), class_num))

    if args.augment_mirror:
        train_data.augment_mirror()

    if args.test:
        test_data = dataset.load(args.test, args.extension, is_training=False,
                                 class_labels=class_labels,
                                 thread_num=args.thread_num)

    model = model_mod.initialize(args, data_shape, class_labels, class_num)
    model.gradient_clip = args.gradient_clip
    mesh = mesh_mod.make_mesh(args.devices)
    logging.info("Training over mesh:", mesh)
    trainer = Trainer(model, args.solver, args.cost_factors,
                      use_acc_mode=args.use_acc_mode, seed=args.seed, mesh=mesh,
                      pipeline_targets=args.pipeline_targets,
                      device_targets=args.device_targets,
                      cost_read_interval=args.cost_read_interval,
                      use_remat=(False if args.no_remat else None))

    if args.initial_tune > 0:
        logging.info("----- Initial Fine Tune -----")
        run_train_epoch(args, 0, trainer, model, train_data, args.initial_tune)

    learn_rate = args.learn_rate
    for epoch in range(0, args.epoch_start):
        if len(args.learn_anneal_epochs) == 0 or \
                (epoch + 1) in args.learn_anneal_epochs:
            learn_rate *= args.learn_anneal
        # per-epoch shuffles compose in place, so replay the skipped epochs'
        # shuffle history — a restarted run then sees the same data order an
        # uninterrupted run would (and all hosts stay in lockstep)
        random.seed(args.seed + epoch)
        train_data.shuffle()

    for epoch in range(args.epoch_start, args.epochs):
        logging.info("----- Training Epoch: %i -----" % epoch)
        if not args.skip_train:
            subset_start = args.subset_start if epoch == args.epoch_start else 0
            cost = run_train_epoch(args, epoch, trainer, model, train_data,
                                   learn_rate, subset_start)
            logging.info("Epoch %i mean cost: %s" % (epoch, cost))

        if len(args.learn_anneal_epochs) == 0 or \
                (epoch + 1) in args.learn_anneal_epochs:
            logging.verbose("Annealing learning rate")
            learn_rate *= args.learn_anneal

        if args.test and ((epoch % args.test_epochs) == 0 or
                          epoch == (args.epochs - 1)):
            test_error, test_class_errors = compute_error(test_data, model)
            logging.info("Epoch %i test error: %.2f%%" % (epoch, test_error))
            save_results(args.output_prefix + "_epoch%03i.test" % epoch,
                         test_error, test_class_errors)

    logging.info("Finished Training")


if __name__ == "__main__":
    sys.exit(main())
