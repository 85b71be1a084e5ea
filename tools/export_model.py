#!/usr/bin/env python
"""Export a trained detector as self-contained StableHLO serving artifacts.

No reference counterpart — the reference serves from a live TF session
(lib/model/test.py). This tool ahead-of-time lowers the full batched
detect program (one artifact per canvas bucket; params ship alongside and
enter as function inputs — see utils/serving.py for why baking them as
constants would break bit-exactness) into a directory that
`tf_faster_rcnn_tpu.utils.serving.load_detect` can run with nothing but
jax installed.

    python tools/export_model.py --net res101 --model snapshot.msgpack \
        --out exported/ --batch 8 [--platforms tpu cpu] [--verify]
"""

import argparse

import _init_paths  # noqa: F401
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Export the detect program for serving")
    ap.add_argument("--net", required=True,
                    choices=("vgg16", "res50", "res101", "res152", "mobile"))
    ap.add_argument("--model", default=None,
                    help="params msgpack / TF ckpt / slim dict "
                         "(default: random init, for plumbing tests)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--num-classes", type=int, default=21)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-per-image", type=int, default=None)
    ap.add_argument("--platforms", nargs="+", default=None,
                    help="lowering platforms, e.g. --platforms tpu cpu "
                         "(default: current backend)")
    ap.add_argument("--verify", action="store_true",
                    help="reload every artifact and check it matches the "
                         "live program on random inputs")
    ap.add_argument("--cfg", dest="cfg_file", default=None)
    ap.add_argument("--set", dest="set_cfgs", default=None,
                    nargs=argparse.REMAINDER)
    args = ap.parse_args(argv)

    from tf_faster_rcnn_tpu.config import (canvas_buckets, cfg, cfg_from_file,
                                           cfg_from_list)
    if args.cfg_file:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
    from tf_faster_rcnn_tpu.utils.serving import export_detect, load_detect
    from test_net import load_model_params

    spec = spec_from_cfg(args.net, args.num_classes, "TEST")
    model = FasterRCNN(spec)
    params = load_model_params(args.model, model, spec, args.net,
                               canvas_buckets(cfg.TEST)[0])

    platforms = tuple(args.platforms) if args.platforms else None
    manifest = export_detect(model, spec, params, args.out, args.batch,
                             max_per_image=args.max_per_image,
                             platforms=platforms)
    for e in manifest["artifacts"]:
        print(f"wrote {args.out}/{e['file']}  image {e['image_shape']}")

    if args.verify:
        from tf_faster_rcnn_tpu.engine.test_engine import make_detect_fn
        detect = make_detect_fn(model, spec, args.max_per_image)
        _, fns = load_detect(args.out)
        rng = np.random.RandomState(0)
        for e in manifest["artifacts"]:
            image = rng.randn(*e["image_shape"]).astype(
                manifest["transfer_dtype"])
            h, w = e["canvas"]
            im_info = np.tile(np.array([[h * 0.9, w * 0.9, 1.5]], np.float32),
                              (manifest["batch"], 1))
            orig_hw = im_info[:, :2] / im_info[:, 2:]
            got = fns[(h, w)](image, im_info, orig_hw)
            want = detect(params, image, im_info, orig_hw)
            for g, v in zip(got, want):
                np.testing.assert_allclose(np.asarray(g), np.asarray(v),
                                           rtol=0, atol=0)
            print(f"verified {e['file']}: exported == live")


if __name__ == "__main__":
    main()
