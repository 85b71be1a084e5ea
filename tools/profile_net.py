"""Capture a jax.profiler trace of the detect program.

Counterpart of the reference's wall-clock-only Timer observability
(lib/utils/timer.py): writes an XPlane/TensorBoard trace of the full
batched detect step so per-op device time can be inspected with
`tensorboard --logdir <dir>` or xprof.

The train-step analog is built into the train loop (TPU.PROFILE_DIR).

Usage: python tools/profile_net.py --dir /tmp/frcnn_trace [--net res101]
       [--batch 8] [--steps 3] [--canvas 608,1024] [--s2d]
       [--cfg experiments/cfgs/X.yml]   # config canvas/proposal counts
                                        # + full on-device postprocess
"""

import argparse
import dataclasses

import _init_paths  # noqa: F401
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="trace output directory")
    ap.add_argument("--net", default="res101",
                    choices=("vgg16", "res50", "res101", "res152", "mobile"))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--canvas", default="608,1024")
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth host input (ResNet backbones)")
    ap.add_argument("--cfg", default=None,
                    help="yml config; its TEST canvas/proposal counts and "
                         "the full detect+postprocess program (bench_sweep "
                         "workload)")
    args = ap.parse_args()

    import jax
    from tf_faster_rcnn_tpu.config import cfg
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg

    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if args.s2d:
        cfg.TPU.SPACE_TO_DEPTH = True
    if args.cfg:
        from tf_faster_rcnn_tpu.config import canvas_buckets, cfg_from_file
        cfg_from_file(args.cfg)
        spec = spec_from_cfg(args.net, 21, "TEST")
        h, w = canvas_buckets(cfg.TEST)[0]
    else:
        h, w = (int(x) for x in args.canvas.split(","))
        spec = dataclasses.replace(
            spec_from_cfg(args.net, 21, "TEST"),
            rpn_pre_nms_top_n=6000, rpn_post_nms_top_n=300)
    model = FasterRCNN(spec)

    rng = np.random.RandomState(0)
    image = rng.randn(args.batch, h, w, 3).astype(np.float32) * 40.0
    if cfg.TPU.SPACE_TO_DEPTH:
        from tf_faster_rcnn_tpu.data.blob import space_to_depth
        image = np.stack([space_to_depth(im) for im in image])
    ih, iw = float(h * 600 // 608), float(w * 1000 // 1024)
    im_info = np.tile(np.array([[ih, iw, 1.6]], np.float32),
                      (args.batch, 1))

    params = jax.jit(model.init)(jax.random.PRNGKey(0), image[:1],
                                 im_info[:1])
    if args.cfg:
        from tf_faster_rcnn_tpu.engine.detect import postprocess_detections
        orig_hw = np.tile(np.array([[ih / 1.6, iw / 1.6]], np.float32),
                          (args.batch, 1))
        orig_hw = jax.device_put(orig_hw)

        def run(params, image, im_info):
            out = model.apply(params, image, im_info)
            return postprocess_detections(
                out["rois"], out["roi_valid"], out["cls_prob"],
                out["bbox_pred"], im_info, orig_hw, num_classes=21,
                max_per_image=int(cfg.TPU.MAX_PER_IMAGE),
                nms_thresh=float(cfg.TEST.NMS))
        fwd = jax.jit(run)
    else:
        fwd = jax.jit(model.apply)
    image, im_info = jax.device_put(image), jax.device_put(im_info)
    jax.block_until_ready(fwd(params, image, im_info))  # compile outside trace

    with jax.profiler.trace(args.dir):
        for _ in range(args.steps):
            jax.block_until_ready(fwd(params, image, im_info))
    print(f"Wrote {args.steps}-step {args.net} detect trace to {args.dir}")


if __name__ == "__main__":
    main()
