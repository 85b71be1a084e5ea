"""Training-step throughput for the bench workload (R101 600px, batch 8).

Same methodology as bench.py: on-device lax.fori_loop with a carried data
dependency, best-of-N host timing around a single scalar fetch.

Usage: python tools/bench_train.py [--batch 8] [--iters 10] [--net res101]
"""

import argparse
import dataclasses
import json
import time

import _init_paths  # noqa: F401
import numpy as np


def measure(net="res101", batch=8, iters=10, canvas="608,1024", s2d=True,
            cfg_path=None, image=None):
    """Measure the train step; returns the metrics dict (also used by the
    repo-root bench.py so train-perf regressions land in BENCH_r*.json).

    ``image``: optional pre-built [batch, H, W, 3] float32 input (e.g. the
    synthetic scenes bench.py uses); defaults to scaled noise. Space-to-
    depth relayout is applied here either way.
    """
    args = argparse.Namespace(net=net, batch=batch, iters=iters,
                              canvas=canvas, s2d=int(s2d), cfg=cfg_path)

    from tf_faster_rcnn_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tf_faster_rcnn_tpu.config import cfg
    from tf_faster_rcnn_tpu.engine.train import (create_train_state,
                                                 lr_schedule, make_train_step)
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg

    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if args.s2d and args.net.startswith("res"):
        cfg.TPU.SPACE_TO_DEPTH = True
    b = args.batch
    if args.cfg:
        # measure the config's own TRAIN canvas/anchors/proposal counts
        from tf_faster_rcnn_tpu.config import canvas_hw, cfg_from_file
        cfg_from_file(args.cfg)
        spec = dataclasses.replace(
            spec_from_cfg(args.net, 21, "TRAIN"), rpn_pre_nms_top_n=6000)
        h, w = canvas_hw(cfg.TRAIN)
    else:
        h, w = (int(x) for x in args.canvas.split(","))
        spec = dataclasses.replace(
            spec_from_cfg(args.net, 21, "TRAIN"),
            rpn_pre_nms_top_n=6000, rpn_post_nms_top_n=2000)
    model = FasterRCNN(spec)

    rng = np.random.RandomState(0)
    if image is None:
        image = rng.randn(b, h, w, 3).astype(np.float32) * 40.0
    else:
        assert image.shape == (b, h, w, 3), (image.shape, (b, h, w, 3))
        image = image.astype(np.float32)
    if cfg.TPU.SPACE_TO_DEPTH:
        from tf_faster_rcnn_tpu.data.blob import space_to_depth
        image = np.stack([space_to_depth(im) for im in image])
    ih, iw = float(h * 600 // 608), float(w * 1000 // 1024)
    batch = {
        "image": image,
        "im_info": np.tile(np.array([[ih, iw, 1.6]], np.float32), (b, 1)),
        "gt_boxes": np.tile(np.array(
            [[[40, 60, 300, 400, 7], [200, 100, 500, 330, 12]]], np.float32),
            (b, 1, 1)),
        "gt_valid": np.ones((b, 2), bool),
    }
    # jitted init: eager flax init is thousands of per-op dispatches, each
    # paying the relay RTT (minutes); jitted it is one cached compile
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch["image"][:1], batch["im_info"][:1], batch["gt_boxes"][:1],
        batch["gt_valid"][:1])
    state = create_train_state(spec, params, jax.random.PRNGKey(3))
    step_fn = make_train_step(
        model, spec, weight_decay=float(cfg.TRAIN.WEIGHT_DECAY),
        mobile_weight_decay=float(cfg.MOBILENET.WEIGHT_DECAY),
        bias_decay=bool(cfg.TRAIN.BIAS_DECAY), donate=False,
        lr_fn=lr_schedule(0.001, 0.1, [350000]))

    @jax.jit
    def timed(state, batch, iters):
        def body(i, carry):
            st, acc = carry
            st, metrics = step_fn(st, batch)
            return st, acc + metrics["total_loss"]
        st, acc = lax.fori_loop(0, iters, body,
                                (state, jnp.float32(0.0)))
        # depend on the params so no step's update is dead code
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        return acc + jnp.sum(leaf).astype(jnp.float32)

    state = jax.device_put(state)
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    float(timed(state, batch, 2))  # compile + warm
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed(state, batch, args.iters))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    ips = b * args.iters / dt
    return {"metric": f"{args.net}_train_throughput",
            "batch": b, "images_per_sec": round(ips, 2),
            "ms_per_step": round(1000 * dt / args.iters, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--net", default="res101")
    ap.add_argument("--canvas", default="608,1024")
    ap.add_argument("--s2d", type=int, default=1,
                    help="host space-to-depth input (ResNet backbones)")
    ap.add_argument("--cfg", default=None,
                    help="yml config; uses its TRAIN canvas/anchors/counts")
    args = ap.parse_args()
    print(json.dumps(measure(net=args.net, batch=args.batch,
                             iters=args.iters, canvas=args.canvas,
                             s2d=bool(args.s2d), cfg_path=args.cfg)))


if __name__ == "__main__":
    main()
