"""Mint pycocotools golden triples for the pycoco_lite conformance suite.

Run on any host where REAL pycocotools is installed (the Docker image runs
this at build time; the development container has no egress to install it):
generates the same randomized scenes the differential suite uses
(tests/test_cocoeval_protocol.py), scores each with pycocotools'
COCOeval, and writes (gt, dt, 12-stat vector) triples to
tests/fixtures/cocoeval_goldens.json. Once the file is checked in,
``test_pycocotools_golden_triples`` replays every triple against
datasets/pycoco_lite.py — closing the last correlated-oracle gap on the
COCO headline evaluator (reference eval entry:
/root/reference/lib/datasets/coco.py:245-256).

Usage: python tools/make_cocoeval_goldens.py [--seeds 30] [--out <json>]
"""

import argparse
import contextlib
import io
import json
import os.path as osp
import sys

import _init_paths  # noqa: F401
import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def pycocotools_stats(gt_dict, dt_list):
    from pycocotools.coco import COCO as RealCOCO
    from pycocotools.cocoeval import COCOeval as RealEval

    # pycocotools insists on loading from a file path or dict via its own
    # constructor quirks; the dict path needs createIndex by hand
    with contextlib.redirect_stdout(io.StringIO()):
        gt = RealCOCO()
        gt.dataset = json.loads(json.dumps(gt_dict))  # deep copy
        gt.createIndex()
        dt = gt.loadRes(json.loads(json.dumps(dt_list)))
        ev = RealEval(gt, dt, "bbox")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
    return [float(x) for x in ev.stats]


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--seeds", type=int, default=30)
    ap.add_argument("--out", default=osp.join(
        REPO, "tests", "fixtures", "cocoeval_goldens.json"))
    args = ap.parse_args()

    try:
        import pycocotools  # noqa: F401
    except ImportError:
        sys.exit("make_cocoeval_goldens: real pycocotools is not installed "
                 "here; run inside the Docker image (docker/Dockerfile) or "
                 "any host with pycocotools")

    sys.path.insert(0, osp.join(REPO, "tests"))
    from test_cocoeval_protocol import _dataset, _dets, _random_scene

    triples = []
    for seed in range(args.seeds):
        rng = np.random.RandomState(seed)
        images, cats, gt_anns, dt_anns = _random_scene(rng)
        if not gt_anns or not dt_anns:
            continue
        gt = _dataset(images, cats, gt_anns)
        dt = _dets(dt_anns)
        triples.append({"seed": seed, "gt": gt, "dt": dt,
                        "stats": pycocotools_stats(gt, dt)})

    import os
    os.makedirs(osp.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(triples, f)
    print(f"wrote {len(triples)} golden triples -> {args.out}")
    print("check the file in; tests/test_cocoeval_protocol.py replays it")


if __name__ == "__main__":
    main()
