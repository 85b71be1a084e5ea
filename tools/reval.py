#!/usr/bin/env python
"""Re-score saved detections without re-running the network.

Covers the reference's tools/reval.py:50-72 surface: point it at an output
directory holding ``detections.pkl`` (written by test_net), optionally
re-apply NMS with the current ``TEST.NMS``, and run the imdb's evaluator.
Useful for sweeping eval settings (competition mode, MATLAB eval, NMS
threshold) over one detection pass.
"""

import argparse
import pickle
from pathlib import Path

import _init_paths  # noqa: F401


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Re-evaluate a saved detections.pkl")
    ap.add_argument("output_dir", help="directory containing detections.pkl")
    ap.add_argument("--imdb", dest="imdb_name", default="voc_2007_test")
    ap.add_argument("--matlab", dest="matlab_eval", action="store_true")
    ap.add_argument("--comp", dest="comp_mode", action="store_true")
    ap.add_argument("--nms", dest="apply_nms", action="store_true",
                    help="re-run per-class NMS at TEST.NMS before evaluating")
    ap.add_argument("--set", dest="set_cfgs", default=None,
                    nargs=argparse.REMAINDER)
    args = ap.parse_args(argv)

    from tf_faster_rcnn_tpu.config import cfg, cfg_from_list
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    det_file = Path(args.output_dir).resolve() / "detections.pkl"
    all_boxes = pickle.loads(det_file.read_bytes())

    if args.apply_nms:
        from tf_faster_rcnn_tpu.engine.test_engine import apply_nms
        print("Applying NMS to all detections")
        all_boxes = apply_nms(all_boxes, cfg.TEST.NMS)

    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    imdb = get_imdb(args.imdb_name)
    imdb.competition_mode(args.comp_mode)
    imdb.config["matlab_eval"] = args.matlab_eval
    print("Evaluating detections")
    imdb.evaluate_detections(all_boxes, str(det_file.parent))


if __name__ == "__main__":
    main()
