"""Training driver: one jit-compiled train step over the whole model.

Replaces the reference's compiled Theano update graphs
(denet/model/model_cnn.py:205-470) with a pure step function

    (params, slots, state, x, targets, hyper) -> (params, slots, state, costs)

jitted once and reused every batch.  Gradient accumulation
(``--batch-size-factor`` with ``--use-acc-mode``) reproduces the reference's
*parameter-averaging* accumulator semantics (model_cnn.py:374-392).
"""
import math

import jax
import jax.numpy as jnp
import numpy

import denet_tpu.utils as common
import denet_tpu.utils.logging as logging
from denet_tpu.layers.base import Ctx
from denet_tpu.train import solver as solver_mod


class Trainer:
    def __init__(self, model, solver_mode="sgd", cost_factors=None,
                 use_acc_mode=False, seed=None, mesh=None,
                 pipeline_targets=False, use_remat=None,
                 device_targets=False, gt_cap=128, cost_read_interval=8,
                 input_fn=None):
        self.model = model
        self.solver_mode = solver_mode
        self.use_acc_mode = use_acc_mode
        # optional traced input transform: x = input_fn(rng, x) INSIDE the
        # step jit.  Lets a data source ship compact device inputs (e.g. the
        # synthetic geometry arrays of data/synthetic_device.py) and expand
        # them to the image batch on device with zero extra dispatches —
        # fusing the round-2 separate render jit (+ its host key-split) into
        # the train step closed the measured ~2-dispatch/step overhead of
        # device-data training (PERF.md round 3)
        self.input_fn = input_fn
        # device-target mode: sample selection + dense target construction
        # traced into the train step (ops/target_device); the host supplies
        # only compact padded gt arrays.  gt_cap is the static per-image
        # ground-truth capacity (COCO maxes out near 93 objects).
        self.device_targets = device_targets
        self.gt_cap = gt_cap
        # None = reference split-mode semantics (remat at SPLIT/SKIPSRC.X
        # boundaries, trading recompute for peak memory); False turns the
        # recompute off when the model fits in HBM (measured +28% train
        # step rate for DeNet34-skip @512 on v5e — see PERF.md)
        self.use_remat = use_remat
        self.mesh = mesh  # data-parallel GSPMD mesh (denet_tpu.parallel.mesh)
        # overlap host target generation (corner search etc.) for batch k+1
        # with the device step for batch k; sample selection then uses
        # one-step-stale parameters (selection only — gradients stay exact)
        self.pipeline_targets = pipeline_targets
        # the pipelined epoch reads cost scalars in batches of K (one
        # stacked transfer) instead of one blocking read per step: each
        # read is a full round trip to the device, which serializes the
        # loop (measured 117 -> 282 img/s at K=8 on the relay link; the
        # total cost stays exact, NaN aborts trail by <=K steps)
        self.cost_read_interval = max(1, int(cost_read_interval))

        clayers = model.cost_layers()
        self.cost_factors = ([1.0] * len(clayers) if not cost_factors
                             else [float(f) for f in cost_factors])
        assert len(self.cost_factors) == len(clayers), \
            "Different number of cost factors (%i) and cost layers (%i)" % (
                len(self.cost_factors), len(clayers))
        logging.info("Found %i costs in model:" % len(clayers),
                     list(zip([l.type_name for l in clayers], self.cost_factors)))

        self.slots = solver_mod.init_slots(model.params, solver_mode)
        self.roles = [layer.param_roles(p) for layer, p in
                      zip(model.layers, model.params)]
        self.update_mask = None
        if model.skip_layer_updates:
            skip = set(model.skip_layer_updates)
            self.update_mask = [
                jax.tree_util.tree_map(lambda _: i not in skip, p)
                for i, p in enumerate(model.params)]

        self.rng = jax.random.PRNGKey(seed if seed is not None else model.rng_seed)
        self._step_fn = None
        self._scan_fns = {}
        self._acc = None
        self._acc_count = 0
        self._placed = False

    def _build_step(self):
        model = self.model
        cost_factors = self.cost_factors
        roles = self.roles
        solver_mode = self.solver_mode
        bias_decay = model.bias_decay
        gradient_clip = model.gradient_clip
        update_mask = self.update_mask

        use_remat = self.use_remat
        input_fn = self.input_fn

        def step(params, slots, state, x, targets, aux, hyper, rng):
            # hyper = f32[6]: (epoch, iteration, lr, momentum0, momentum1,
            # decay) packed into ONE small upload — separate jnp scalar
            # wrappers were 5 host->device transfers per step, visible as
            # dispatch latency on the relay link.  The rng chain advances
            # on device too (same split sequence the host used, so the
            # training trajectory is bit-identical).
            epoch, iteration, lr = hyper[0], hyper[1], hyper[2]
            momentum, decay = hyper[3:5], hyper[5]
            if input_fn is not None:
                rng_next, step_rng, data_rng = jax.random.split(rng, 3)
                x = input_fn(data_rng, x)
            else:
                rng_next, step_rng = jax.random.split(rng)

            def loss_fn(params):
                ctx = Ctx(train=True, rng=step_rng, epoch=epoch,
                          iteration=iteration, aux=aux,
                          compute_dtype=model.compute_dtype)
                total, (costs, new_state) = model.loss(
                    params, state, x, targets, ctx, cost_factors,
                    use_remat=use_remat)
                return total, (costs, new_state)

            (total, (costs, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)

            if gradient_clip > 0.0:
                grads = jax.tree_util.tree_map(
                    lambda g: jnp.clip(g, -gradient_clip, gradient_clip), grads)

            params_new, slots_new = solver_mod.apply_updates(
                solver_mode, params, grads, slots, roles, lr, momentum, decay,
                iteration, bias_decay, update_mask)
            return params_new, slots_new, new_state, total, costs, rng_next

        self._raw_step = step
        if self.pipeline_targets and not self.device_targets:
            # host-pipelined mode keeps a stale params reference alive for
            # the next batch's sample selection — donation would invalidate
            # it (device-target mode selects inside the step, so it donates)
            return jax.jit(step)
        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _build_scan(self):
        """K sequential optimizer steps in ONE dispatch (lax.scan over the
        step body).  Every per-step input arrives stacked on a new leading
        axis; BN state, params, solver slots and the rng chain thread through
        the scan carry, so the trajectory is bit-identical to K train_step
        calls.  Closes the residual host-dispatch gap of the pipelined loop
        (measured 0.886 of the device-step rate at K=1; PERF.md round 3)."""
        if self._step_fn is None:
            self._step_fn = self._build_step()   # defines self._raw_step
        step = self._raw_step

        def scan_fn(params, slots, state, xs, targets, auxs, hypers, rng):
            def body(carry, inp):
                params, slots, state, rng = carry
                x, t, aux, hyper = inp
                params, slots, state, total, costs, rng = step(
                    params, slots, state, x, t, aux, hyper, rng)
                return (params, slots, state, rng), (total, costs)

            carry, (totals, costs) = jax.lax.scan(
                body, (params, slots, state, rng),
                (xs, targets, auxs, hypers))
            params, slots, state, rng = carry
            return params, slots, state, totals, costs, rng

        return jax.jit(scan_fn, donate_argnums=(0, 1, 2))

    def train_steps(self, batches, epoch, learning_rate, momentum, decay):
        """Run ``len(batches)`` optimizer steps as ONE device dispatch.

        ``batches`` is a list of (data_x, data_m) pairs; per-step inputs are
        prepared host-side, stacked on a leading K axis and uploaded as one
        transfer per leaf.  Returns the stacked per-step total costs as a
        DEVICE array (callers flush blocks of them like the pipelined epoch
        does).  Requires same-structure targets/aux across the K batches
        (true for fixed-shape detection training); acc-mode and mesh
        sharding keep the per-step path."""
        assert not self.use_acc_mode and self.mesh is None, \
            "train_steps (scan mode) supports the plain single-device path"
        model = self.model
        k = len(batches)
        if k not in self._scan_fns:
            logging.info("Building %d-step scan training function" % k)
            self._scan_fns[k] = self._build_scan()
        model.ensure_on_device()

        prepared = [self.prepare_targets(x, m) for x, m in batches]
        stack = lambda *xs: jnp.stack([jnp.asarray(v) for v in xs])  # noqa: E731
        targets = jax.tree_util.tree_map(stack, *[p[0] for p in prepared])
        auxs = jax.tree_util.tree_map(stack, *[p[1] for p in prepared])
        xs = jax.tree_util.tree_map(stack, *[b[0] for b in batches])
        m = numpy.asarray(momentum, dtype=numpy.float32).ravel()
        hypers = jnp.asarray(numpy.stack([
            numpy.array([epoch, model.iteration + i, learning_rate, m[0],
                         m[1] if m.size > 1 else 0.0, decay],
                        dtype=numpy.float32) for i in range(k)]))

        params, slots, state, totals, _costs, rng = self._scan_fns[k](
            model.params, self.slots, model.state, xs, targets, auxs,
            hypers, self.rng)
        model.params = params
        model.state = state
        self.slots = slots
        self.rng = rng
        model.iteration += k
        return totals

    def prepare_targets(self, data_x, data_m):
        """Host-side target generation for one batch -> (targets, aux).
        Separated from the step so an epoch loop can overlap it with the
        previous device step (SURVEY.md §7 hard part 1).

        In device-target mode this only packs the compact gt arrays (plus
        host targets/selection for any layer without a device builder)."""
        model = self.model
        # multi-host data parallelism: this process owns the global batch
        # slice [process_index * local_b, ...) — index-encoding targets
        # (e.g. the regression layer's flat indices) need the global offset
        model.target_batch_offset = (jax.process_index() * len(data_m)
                                     if jax.process_count() > 1 else 0)
        if self.device_targets:
            from denet_tpu.ops import target_device
            targets = model.get_targets(data_x, data_m, device_targets=True)
            gt_bbox, gt_class, gt_count = target_device.pack_gt_arrays(
                data_m, self.gt_cap)
            aux = dict(getattr(model, "train_aux", {}))
            sparse = common.find_layers(model.layers, "denet-sparse", False)
            if sparse is not None:
                aux.pop("sample_bbox", None)   # fused on-device selection
            aux.update({"gt_bbox": jnp.asarray(gt_bbox),
                        "gt_class": jnp.asarray(gt_class),
                        "gt_count": jnp.asarray(gt_count)})
            return [jnp.asarray(t) for t in targets], aux
        targets = model.get_targets(data_x, data_m)
        aux = dict(getattr(model, "train_aux", {}))
        return [jnp.asarray(t) for t in targets], aux

    def train_step(self, data_x, data_m, epoch, it, learning_rate, momentum,
                   decay, prepared=None, block=True):
        """One optimizer step; targets generated host-side per cost layer
        (or passed precomputed via ``prepared``).  ``block=False`` returns
        the (total, costs) device futures instead of floats."""
        model = self.model
        if self._step_fn is None:
            logging.info("Building training function - solver: %s, "
                         "use_acc_mode: %s" % (self.solver_mode, self.use_acc_mode))
            self._step_fn = self._build_step()
        if self.mesh is None:
            model.ensure_on_device()

        targets, aux = (prepared if prepared is not None
                        else self.prepare_targets(data_x, data_m))

        m = numpy.asarray(momentum, dtype=numpy.float32).ravel()
        hyper = numpy.array([epoch, it, learning_rate, m[0],
                             m[1] if m.size > 1 else 0.0, decay],
                            dtype=numpy.float32)
        # with an input_fn, data_x may be a compact pytree (e.g. geometry
        # arrays) expanded to the image batch inside the step jit
        data_x = jax.tree_util.tree_map(jnp.asarray, data_x)

        if self.mesh is not None:
            # GSPMD data parallelism: batch-major inputs sharded over the
            # mesh's data axis, params/state replicated — XLA inserts the
            # gradient all-reduce over ICI (see denet_tpu/parallel/mesh.py)
            from denet_tpu.parallel import mesh as mesh_mod
            if not self._placed:
                model.params = mesh_mod.shard_args(self.mesh, model.params)
                model.state = mesh_mod.shard_args(self.mesh, model.state)
                self.slots = mesh_mod.shard_args(self.mesh, self.slots)
                self._placed = True
            data_x = mesh_mod.shard_args(self.mesh, data_x, batch_leaves=True)
            targets = mesh_mod.shard_args(self.mesh, targets, batch_leaves=True)
            aux = mesh_mod.shard_args(self.mesh, aux, batch_leaves=True)

        params, slots, state, total, costs, rng_next = self._step_fn(
            model.params, self.slots, model.state, data_x, targets, aux,
            hyper, self.rng)
        model.params = params
        model.state = state
        self.slots = slots
        self.rng = rng_next

        if self.use_acc_mode:
            # reference acc-mode averages every shared update: parameters,
            # solver slots AND the BN EMA state (model_cnn.py:374-392)
            acc_tree = (params, slots, state)
            if self._acc is None:
                self._acc = jax.tree_util.tree_map(jnp.copy, acc_tree)
            else:
                self._acc = jax.tree_util.tree_map(
                    lambda a, b: a + b, self._acc, acc_tree)
            self._acc_count += 1

        if not block:
            return total, costs
        return float(total), [float(c) for c in costs]

    # -- accumulation mode (parameter averaging, model_cnn.py:374-392) -------

    def train_begin(self):
        self._acc = None
        self._acc_count = 0

    def train_end(self):
        if not self.use_acc_mode or self._acc_count == 0:
            return
        n = float(self._acc_count)
        mean = jax.tree_util.tree_map(lambda a: a / n, self._acc)
        self.model.params, self.slots, self.model.state = mean
        self._acc = None
        self._acc_count = 0

    # -- epoch loop (reference model_cnn.py:447-470) -------------------------

    def train_epoch(self, dataset, epoch, learning_rate, momentum=(0.9, 0.999),
                    decay=0.0):
        logging.info("Evaluating training function")
        dataset_x, dataset_m, dataset_size = dataset.export(self.model.batch_size)
        index_num = math.ceil(dataset_size / self.model.batch_size)
        total_cost = 0.0
        bs = self.model.batch_size

        if self.pipeline_targets:
            return self._train_epoch_pipelined(dataset_x, dataset_m, index_num,
                                               epoch, learning_rate, momentum,
                                               decay)

        for index in range(index_num):
            timer = common.Timer()
            data_x = dataset_x[index * bs:(index + 1) * bs]
            data_m = dataset_m[index * bs:(index + 1) * bs]
            cost, _ = self.train_step(data_x, data_m, epoch,
                                      self.model.iteration, learning_rate,
                                      momentum, decay)
            if math.isnan(cost):
                raise Exception("ERROR: Cost is NaN")
            logging.verbose("Batch %i.%i - iteration: %i cost:" % (
                epoch, index * bs, self.model.iteration), cost,
                "took: %i ms" % timer.current_ms())
            total_cost += cost
            self.model.iteration += 1
        return total_cost

    def _train_epoch_pipelined(self, dataset_x, dataset_m, index_num, epoch,
                               learning_rate, momentum, decay):
        """Pipelined epoch: the host target pipeline for batch k+1 (corner
        search, gt matching, numpy packing) runs while the device executes
        step k.  Sample *selection* uses the pre-step parameters (one step
        stale); cost readback / NaN checks trail by one step."""
        model = self.model
        bs = model.batch_size

        def batch(i):
            return (dataset_x[i * bs:(i + 1) * bs],
                    dataset_m[i * bs:(i + 1) * bs])

        total_cost = 0.0
        pending = []     # total-cost futures of in-flight steps
        first_it = model.iteration

        def flush():
            # ONE stacked transfer reads every pending cost scalar: each
            # host read is a full device round trip, so per-step reads
            # serialize the loop (117 -> 282 img/s at interval 8; PERF.md)
            nonlocal total_cost
            if not pending:
                return
            vals = numpy.asarray(jnp.stack(pending))
            if not numpy.isfinite(vals).all():
                # with cost_read_interval>1 the abort trails the bad step by
                # up to K-1 optimizer updates; report the exact iteration so
                # callers can checkpoint/rollback accurately (the params are
                # post-NaN — roll back to the last saved checkpoint)
                bad = int(numpy.flatnonzero(~numpy.isfinite(vals))[0])
                bad_it = model.iteration - len(vals) + bad
                raise Exception(
                    "ERROR: Cost is NaN (first non-finite at iteration %d; "
                    "%d further update(s) were already applied)" % (
                        bad_it, len(vals) - 1 - bad))
            total_cost += float(vals.sum())
            logging.verbose("Batch block ending %i.%i - cost:" % (
                epoch, model.iteration - first_it - 1), float(vals[-1]))
            pending.clear()

        data_x, data_m = batch(0)
        prepared = self.prepare_targets(data_x, data_m)
        for index in range(index_num):
            # stale refs for the NEXT batch's sample selection
            model._target_params = model.params
            model._target_state = model.state
            out = self.train_step(data_x, data_m, epoch, model.iteration,
                                  learning_rate, momentum, decay,
                                  prepared=prepared, block=False)
            model.iteration += 1

            if index + 1 < index_num:
                data_x, data_m = batch(index + 1)
                prepared = self.prepare_targets(data_x, data_m)

            pending.append(out[0])
            if len(pending) >= self.cost_read_interval:
                flush()

        model._target_params = None
        model._target_state = None
        flush()
        return total_cost
