"""Throughput sweep for the bench workload (600px TEST).

Sweeps batch size and/or backbone.

Measures images/sec/chip at several batch sizes to pick the bench batch.
Same methodology as bench.py (on-device fori_loop timing, best-of-N).

Usage: python tools/bench_sweep.py [--batches 4,8,16,32] [--iters 20]
       python tools/bench_sweep.py --net vgg16 --batches 8
"""

import argparse
import dataclasses
import json
import time

import _init_paths  # noqa: F401
import numpy as np


def measure(batch, iters, warmup=3, reps=4, canvas=(608, 1024),
            net="res101", s2d=False, cfg_file=None):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tf_faster_rcnn_tpu.config import canvas_buckets, cfg, cfg_from_file
    from tf_faster_rcnn_tpu.engine.detect import postprocess_detections
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg

    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if s2d and net.startswith("res"):
        cfg.TPU.SPACE_TO_DEPTH = True
    if cfg_file:
        # measure the config's own TEST proposal counts and the engine's
        # landscape-bucket canvas (what test_net compiles for landscape
        # batches — most of VOC/COCO)
        cfg_from_file(cfg_file)
        spec = spec_from_cfg(net, 21, "TEST")
        canvas = canvas_buckets(cfg.TEST)[0]
    else:
        spec = dataclasses.replace(
            spec_from_cfg(net, 21, "TEST"),
            rpn_pre_nms_top_n=6000, rpn_post_nms_top_n=300)
    model = FasterRCNN(spec)

    h, w = canvas
    rng = np.random.RandomState(0)
    image = rng.randn(batch, h, w, 3).astype(np.float32) * 40.0
    if cfg.TPU.SPACE_TO_DEPTH:
        from tf_faster_rcnn_tpu.data.blob import space_to_depth
        image = np.stack([space_to_depth(im) for im in image])
    # true extent just inside the padded canvas, scale ~1.6 (bench workload)
    ih, iw = float(h * 600 // 608), float(w * 1000 // 1024)
    im_info = np.tile(np.array([[ih, iw, 1.6]], np.float32), (batch, 1))
    orig_hw = np.tile(np.array([[ih / 1.6, iw / 1.6]], np.float32),
                      (batch, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), image[:1],
                                 im_info[:1])

    def detect(params, image, im_info, orig_hw):
        out = model.apply(params, image, im_info)
        return postprocess_detections(
            out["rois"], out["roi_valid"], out["cls_prob"], out["bbox_pred"],
            im_info, orig_hw, num_classes=21,
            max_per_image=int(cfg.TPU.MAX_PER_IMAGE),
            nms_thresh=float(cfg.TEST.NMS))

    @jax.jit
    def timed(params, image, im_info, orig_hw, iters):
        def body(i, carry):
            det, dv = detect(params, image + carry * 1e-20, im_info, orig_hw)
            return det[0, 0, 1]
        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    params = jax.device_put(params)
    image = jax.device_put(image)
    im_info = jax.device_put(im_info)
    orig_hw = jax.device_put(orig_hw)
    float(timed(params, image, im_info, orig_hw, warmup))
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(timed(params, image, im_info, orig_hw, iters))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    return batch * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="4,8,16,32")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--net", default="res101",
                    choices=("vgg16", "res50", "res101", "res152", "mobile"))
    ap.add_argument("--s2d", type=int, default=0,
                    help="host space-to-depth input (ResNet backbones)")
    ap.add_argument("--cfg", default=None,
                    help="yml config; uses its TEST canvas/proposal counts")
    args = ap.parse_args()
    if args.s2d and not args.net.startswith("res"):
        ap.error("--s2d is only supported for ResNet backbones")
    from tf_faster_rcnn_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    for b in [int(x) for x in args.batches.split(",")]:
        ips = measure(b, args.iters, net=args.net, s2d=bool(args.s2d),
                      cfg_file=args.cfg)
        print(json.dumps({"net": args.net, "batch": b, "s2d": bool(args.s2d),
                          "cfg": args.cfg, "images_per_sec": round(ips, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
