"""Stage-level device timing of the WIDE detection pipeline @512 b8.

The wide rows are the weakest bench margins (denet34_wide_v1 388 img/s,
wide_v2 376 vs the 8x goal of 640).  Round-2 evidence shows the host
clustering round-trip costs only ~12 img/s (wide_v1 vs wide_v2 near-equal),
so the limiter is the wide pipeline itself.  This script times each fused
segment to locate it: trunk, trunk+corner head (PI-upsampled 128^2 convs),
+corner search, +clustering, the RoI gather + detect head (2304 RoIs x
4802ch), and the full pipeline incl. NMS.

Run on the TPU: python -u scripts/profile_wide.py [--v2]
"""
import argparse
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from denet_tpu.utils import chiplock
    # single-writer relay guard (VERDICT r4 item 6)
    with chiplock.chip_lease("profile_wide",
                             log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--v2", action="store_true")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--model", default=None,
                   help="profile a trained checkpoint (training-distribution"
                        " inputs, realistic corner density) instead of the "
                        "perturbed-head build; v2-ness is read from the "
                        "checkpoint")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import denet_tpu.utils.logging as logging
    from __graft_entry__ import _build_detect_model
    from bench import calibrate_corner_bias_device, perturb_heads_host
    from denet_tpu.core.model import _keepalive
    from denet_tpu.layers.base import Ctx
    from denet_tpu.models import zoo

    logging.init(level="warning")
    batch, size = 8, args.size
    if args.model:
        import denet_tpu.core.model as model_mod
        model = model_mod.load_from_file(args.model, batch_size=batch)
        model.compute_dtype = jnp.bfloat16
        detect_layer = model.layers[-1]
        sparse = [l for l in model.layers
                  if l.type_name == "denet-sparse"][0]
        dnc = sparse.corner_layer
        sn = sparse.sample_num
        args.v2 = sparse.nms_threshold < 1.0
        model.ensure_on_device()
        from denet_tpu.data.synthetic import make_uint8_batch_hard
        rng = numpy.random.RandomState(3)
        x = jnp.asarray(make_uint8_batch_hard(rng, batch, size,
                                              model.class_num)[0])
        if args.v2:
            cap, mx = model.calibrate_cluster_cap(detect_layer, [x])
            print("calibrated cluster cap %d (observed max %d)" % (cap, mx),
                  flush=True)
    else:
        desc = zoo.denet34("wide", v2=args.v2)
        model = _build_detect_model(batch, size, class_num=80,
                                    desc_override=desc)
        model.compute_dtype = jnp.bfloat16
        detect_layer = model.layers[-1]
        sparse = [l for l in model.layers
                  if l.type_name == "denet-sparse"][0]
        dnc = sparse.corner_layer
        sn = sparse.sample_num
        perturb_heads_host(model)
        model.ensure_on_device()
        rng = numpy.random.RandomState(3)
        x = jnp.asarray(rng.randint(0, 256, (batch, 3, size, size))
                        .astype(numpy.uint8))
        calibrate_corner_bias_device(model, x)
    params = model.inference_params()

    from denet_tpu.utils import chiplock

    def timeit(name, fn, fargs, iters=args.iters):
        # each stage = compile + timed loop: yield to a bench first, then
        # mark the stage busy so an arriving bench waits for its boundary
        chiplock.yield_to_bench(log=lambda m: print(m, flush=True))
        with chiplock.queue_busy():
            r = fn(*fargs)
            numpy.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
            t0 = time.time()
            for _ in range(iters):
                r = fn(*fargs)
            numpy.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
            dt = (time.time() - t0) / iters
        print("%-30s %7.2f ms/batch  (%6.1f img/s)" % (
            name, 1000 * dt, batch / dt), flush=True)
        return r

    corner_index = dnc.layer_index

    # 1. trunk through the corner head (incl. the PI-upsampled head convs)
    def trunk_corner(params, state, x):
        ctx = Ctx(train=False, compute_dtype=model.compute_dtype)
        outputs = {0: model.prep_input(x, ctx)}
        for i in range(1, corner_index + 1):
            y, _ = model.layers[i].apply(params[i], state[i], outputs, ctx)
            outputs[i] = y
        c = ctx.collect[corner_index]
        # corner_diff, not corner_pr: the shipped inference jits consume the
        # precomputed diff (round-5 DCE) — reading corner_pr here would time
        # the logsumexp tree the fused path no longer executes
        return c["corner_diff"][:, 0, 0, 0], c["sample"][:, 0, 0, 0]

    timeit("trunk+corner-head", _keepalive(jax.jit(trunk_corner)),
           (params, model.state, x))

    # 2. + device corner search (and clustering for v2)
    from denet_tpu.ops.corner_search_device import corner_search

    def with_search(params, state, x):
        ctx = Ctx(train=False, compute_dtype=model.compute_dtype)
        outputs = {0: model.prep_input(x, ctx)}
        for i in range(1, corner_index + 1):
            y, _ = model.layers[i].apply(params[i], state[i], outputs, ctx)
            outputs[i] = y
        c = ctx.collect[corner_index]
        diff = c["corner_diff"]
        if args.v2:
            from denet_tpu.ops.cluster_device import cluster_candidates
            cap = min(10 * sn * sn,
                      getattr(model, "cluster_cap", None)
                      or sparse.cluster_device_cap)
            bb, pr, cnt = corner_search(diff, sparse.corner_threshold, sn,
                                        out_count=cap,
                                        local_max=sparse.local_max)
            bb, pr, cnt = cluster_candidates(bb, pr, cnt,
                                             sparse.nms_threshold,
                                             sn * sn, cap)
        else:
            bb, pr, cnt = corner_search(diff, sparse.corner_threshold, sn,
                                        local_max=sparse.local_max)
        return bb[:, 0], cnt

    timeit("+corner-search%s" % ("+cluster" if args.v2 else ""),
           _keepalive(jax.jit(with_search)), (params, model.state, x))

    # 3. full fused pipeline (adds RoI gather + detect head + NMS)
    full = model.build_full_detect_fn(detect_layer, 0.01, 0.5)
    timeit("full pipeline", full, (params, model.state, x))

    # 4. detect phase alone on stashed features (gather + head + NMS)
    dnm = model.build_detect_nms_fn(detect_layer, 0.01, 0.5)
    fn = model.build_sample_fn(sparse, train=False, return_sample=True)
    feat = fn(params, model.state, x)[1]
    rngb = numpy.random.RandomState(5)
    x0 = rngb.uniform(0, 0.7, (batch, sn, sn)).astype(numpy.float32)
    y0 = rngb.uniform(0, 0.7, (batch, sn, sn)).astype(numpy.float32)
    wh = rngb.uniform(0.05, 0.3, (batch, sn, sn, 2)).astype(numpy.float32)
    bbox4 = jnp.asarray(numpy.stack(
        [x0, y0, x0 + wh[..., 0], y0 + wh[..., 1]], axis=-1))
    cnt = jnp.full((batch,), sn * sn, jnp.int32)
    timeit("detect-phase (gather+head+NMS)", dnm,
           (params, model.state, feat, bbox4, cnt))

    # 5. sub-stages of the detect phase
    from denet_tpu.ops import nms_device
    from denet_tpu.ops.sparse_gather import sparse_gather

    gather = _keepalive(jax.jit(
        lambda f, bb: sparse_gather(f, bb, sparse.grid_size)))
    roi = timeit("  RoI gather alone", gather, (feat, bbox4))

    def head_only(params, roi_feat):
        ctx = Ctx(train=False, compute_dtype=model.compute_dtype,
                  aux={"sample_feat": feat, "sample_bbox": bbox4})
        outs = dict()
        y = roi_feat
        for i in range(sparse.layer_index + 1, len(model.layers)):
            layer = model.layers[i]
            outs[layer.layer_index - 1] = y
            y2, _ = layer.apply(params[i], model.state[i],
                                {layer.input_index: y}, ctx)
            y = y2
        c = ctx.collect[detect_layer.layer_index]
        return c["det_pr"][:, 0, 0, 0]

    timeit("  head convs alone", _keepalive(jax.jit(head_only)),
           (params, roi))

    det_pr = jnp.zeros((batch, detect_layer.class_num + 1, sn, sn),
                       jnp.float32) - 2.0
    timeit("  NMS alone", _keepalive(jax.jit(
        lambda d, bb, c: nms_device.nms(d, d, bb, c, pr_threshold=0.01,
                                        nms_threshold=0.5))),
        (det_pr, bbox4, cnt))
    return 0


if __name__ == "__main__":
    sys.exit(main())
