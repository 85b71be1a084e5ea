"""COCO-scale end-to-end rehearsal at the headline shapes.

Builds an 80-class synthetic COCO devkit (tools/make_synthetic_coco.py:
non-contiguous category ids, crowd regions, both orientations, dense
images up to TPU.MAX_GT instances), then drives the REAL experiment
scripts end-to-end:

    experiments/scripts/train_faster_rcnn.sh  (coco recipe, res101, from
        random init)  ->  chains into test_faster_rcnn.sh (res101 cfg)
    experiments/scripts/test_faster_rcnn.sh   again under the res101-lg
        cfg (800px canvases, RPN_POST_NMS_TOP_N=1000) on the SAME
        snapshot — this exercises the batch x 81-class x 1000-proposal
        lane-tiled postprocess NMS and the COCO results-json/COCOeval
        path at exactly the shapes the published COCO headline needs
        (reference lib/datasets/coco.py:212-308, test schedule from
        experiments/scripts/test_faster_rcnn.sh).

Finally asserts non-trivial AP@[0.5:0.95] on the synthetic minival for
both evals. The synthetic task is color->class memorization, so a healthy
TRAIN+TEST path clears the gate quickly; a silent regression anywhere in
the 81-class pipeline (targets at 100 gt, crowd exclusion, results json,
category-id mapping, COCOeval) fails it.

Usage (v5e chip, ~6 min):
    python tools/coco_rehearsal.py
    python tools/coco_rehearsal.py --iters 4000 --min-ap 0.10 --keep
"""

import argparse
import glob
import json
import os
import os.path as osp
import pickle
import shutil
import subprocess
import sys
import tempfile
import time

import _init_paths  # noqa: F401

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def record_result(payload):
    """Driver-visible artifact: REHEARSAL_r{N}.json at the repo root (N =
    current round, inferred from the newest BENCH_r*.json) + a PROGRESS
    line. A red rehearsal can no longer end a round unrecorded (round 3
    ended on an unlogged NaN divergence; VERDICT r3 'Next' #3).

    The file holds one entry PER NET ({"res101": {...}, "mobile": {...}})
    so a later run of another backbone cannot clobber an earlier result.
    """
    rounds = [int(p.rsplit("_r", 1)[1].split(".")[0])
              for p in glob.glob(osp.join(REPO, "BENCH_r*.json"))]
    n = (max(rounds) + 1) if rounds else 1
    path = osp.join(REPO, f"REHEARSAL_r{n:02d}.json")
    try:
        merged = {}
        if osp.exists(path):
            with open(path) as f:
                old = json.load(f)
            # migrate a flat single-run record into the per-net form
            merged = old if "net" not in old else {old["net"]: old}
        merged[payload["net"]] = payload
        with open(path, "w") as f:
            json.dump(merged, f)
            f.write("\n")
        with open(osp.join(REPO, "PROGRESS.jsonl"), "a") as f:
            json.dump({"ts": time.strftime("%Y-%m-%d %H:%M:%S"),
                       "event": "coco_rehearsal",
                       **payload}, f)
            f.write("\n")
        print(f"[rehearsal] result recorded in {path}")
    except OSError as e:  # read-only checkout: still print the record
        print(f"[rehearsal] could not record result ({e}): {payload}")


def run_driver(script, devices, net, workdir, extra_sets, env_extra):
    env = dict(os.environ)
    env.update(env_extra)
    env.setdefault("FRCNN_TAG", "rehearsal")
    # the driver scripts emit their own `--set` and append these extras to
    # its KEY VALUE list — pass bare pairs, never a second `--set` token
    cmd = ([osp.join("experiments", "scripts", script), str(devices),
            "coco", net] + extra_sets)
    print(f"[rehearsal] {' '.join(cmd)}  (env: "
          f"{ {k: v for k, v in env_extra.items()} })")
    subprocess.run(cmd, cwd=REPO, env=env, check=True)


def read_minival_ap(workdir, exp_dir):
    """AP@[0.5:0.95] from the eval's pickled COCOeval."""
    pat = osp.join(workdir, "output", exp_dir, "coco_2014_minival", "*",
                   "detection_results.pkl")
    hits = sorted(glob.glob(pat), key=osp.getmtime)
    if not hits:
        sys.exit(f"[rehearsal] no detection_results.pkl under {pat}")
    with open(hits[-1], "rb") as f:
        evaluator = pickle.load(f)
    return float(evaluator.stats[0])


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--net", default="res101",
                    choices=("vgg16", "res50", "res101", "res152", "mobile"))
    ap.add_argument("--devices", type=int, default=1)
    ap.add_argument("--iters", type=int, default=4000,
                    help="training length in images (recipe units)")
    ap.add_argument("--train-images", type=int, default=96)
    ap.add_argument("--val-images", type=int, default=16,
                    help="images in each of valminusminival/minival")
    ap.add_argument("--base-hw", type=int, nargs=2, default=(480, 640),
                    help="generated image size (pre-resize)")
    ap.add_argument("--max-gt", type=int, default=100,
                    help="instance count of the dense images")
    ap.add_argument("--ims-per-device", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--set", dest="set_cfgs", nargs="+", default=[],
                    metavar="KEY VALUE",
                    help="extra config override pairs forwarded to both "
                         "drivers (bare pairs; the drivers add --set)")
    ap.add_argument("--min-ap", type=float, default=0.05,
                    help="AP@[0.5:0.95] gate on the synthetic minival")
    ap.add_argument("--skip-lg", action="store_true",
                    help="skip the res101-lg-shape second eval")
    ap.add_argument("--workdir", default=None,
                    help="keep artifacts here (default: fresh temp dir)")
    ap.add_argument("--no-record", action="store_true",
                    help="skip the REHEARSAL_r*.json/PROGRESS record "
                         "(CI toy invocations)")
    args = ap.parse_args()

    # KEY=VALUE tokens are split into pairs (lets values that start with a
    # dash through argparse); validate BEFORE any workdir is created so a
    # usage error cannot leak a temp dir
    set_cfgs = []
    for tok in args.set_cfgs:
        if len(set_cfgs) % 2 == 0 and "=" in tok:  # KEY position
            set_cfgs.extend(tok.split("=", 1))
        else:
            set_cfgs.append(tok)
    if len(set_cfgs) % 2:
        ap.error("--set takes KEY VALUE pairs or KEY=VALUE tokens "
                 "(got an odd count)")
    args.set_cfgs = set_cfgs

    workdir = osp.abspath(args.workdir or
                          tempfile.mkdtemp(prefix="coco_rehearsal_"))
    os.makedirs(workdir, exist_ok=True)
    shutil.rmtree(osp.join(workdir, "cache"), ignore_errors=True)

    from make_synthetic_coco import make_synthetic_coco
    out = make_synthetic_coco(workdir, n_train=args.train_images,
                              n_valminusminival=args.val_images,
                              n_minival=args.val_images,
                              max_gt=args.max_gt,
                              base_hw=tuple(args.base_hw),
                              seed=args.seed)
    for split, ds in out.items():
        print(f"[rehearsal] {split}: {len(ds['images'])} images, "
              f"{len(ds['annotations'])} annotations")

    # every run artifact (roidb caches, snapshots, detections, logs') data
    # root lives under the workdir; the drivers themselves run from REPO
    sets = ["DATA_DIR", workdir, "ROOT_DIR", workdir,
            "TPU.IMS_PER_DEVICE", str(args.ims_per_device),
            "TRAIN.SNAPSHOT_ITERS", str(max(args.iters, 1000))]
    sets += args.set_cfgs
    env = {"FRCNN_ITERS": str(args.iters),
           "FRCNN_STEPSIZE": f"[{10**9}]",   # no decay over the drill
           "FRCNN_WEIGHT": "",               # random init: no hosted ckpt
           "FRCNN_OUTPUT_ROOT": workdir}

    # `iters` is the recipe's IMAGE budget (reference units); `steps` is
    # the optimizer-step count the batched engine actually runs — readers
    # cross-referencing ROADMAP (which narrates steps) need both (VERDICT
    # r4 weak #6: image-units-only records miscounted by the batch factor)
    global_batch = args.ims_per_device * args.devices
    result = {"net": args.net, "iters": args.iters,
              "steps": -(-args.iters // global_batch),
              "gate": args.min_ap,
              "workdir": workdir, "ok": False, "ap_600": None,
              "ap_lg": None, "log_path": None}
    try:
        # train (chains into the res101-cfg eval automatically)
        run_driver("train_faster_rcnn.sh", args.devices, args.net, workdir,
                   sets, env)
        logs = sorted(glob.glob(osp.join(REPO, "experiments", "logs",
                                         f"train_{args.net}_*rehearsal*")),
                      key=osp.getmtime)
        result["log_path"] = logs[-1] if logs else None
        ap_std = read_minival_ap(workdir, args.net)
        result["ap_600"] = ap_std

        ap_lg = None
        lg_cfg = osp.join(REPO, "experiments", "cfgs", f"{args.net}-lg.yml")
        if not args.skip_lg and not osp.exists(lg_cfg):
            # the reference ships only res101-lg.yml (its FPN-ish config);
            # for other backbones there is no -lg recipe to rehearse
            print(f"[rehearsal] no {args.net}-lg.yml — skipping the "
                  f"large-config second eval")
            args.skip_lg = True
        if not args.skip_lg:
            env_lg = dict(env,
                          FRCNN_CFG=f"experiments/cfgs/{args.net}-lg.yml")
            run_driver("test_faster_rcnn.sh", args.devices, args.net,
                       workdir, sets, env_lg)
            ap_lg = read_minival_ap(workdir, f"{args.net}-lg")
            result["ap_lg"] = ap_lg
    except (subprocess.CalledProcessError, SystemExit) as e:
        result["error"] = str(e)
        if not result["log_path"]:
            logs = sorted(glob.glob(
                osp.join(REPO, "experiments", "logs",
                         f"train_{args.net}_*rehearsal*")), key=osp.getmtime)
            result["log_path"] = logs[-1] if logs else None
        if not args.no_record:
            record_result(result)
        print(f"[rehearsal] FAIL: driver chain died: {e}")
        print(f"[rehearsal] artifacts retained: {workdir}")
        sys.exit(1)

    print(f"[rehearsal] minival AP@[0.5:0.95]: {args.net}={ap_std:.4f}"
          + (f"  {args.net}-lg={ap_lg:.4f}" if ap_lg is not None else ""))
    ok = ap_std >= args.min_ap and (ap_lg is None or ap_lg >= args.min_ap)
    result["ok"] = bool(ok)
    if not args.no_record:
        record_result(result)
    print(f"[rehearsal] {'PASS' if ok else 'FAIL'} (gate {args.min_ap})")
    if not args.workdir:
        if ok:
            shutil.rmtree(workdir, ignore_errors=True)
        else:
            print(f"[rehearsal] artifacts retained: {workdir}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
