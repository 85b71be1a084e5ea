"""Hardware-validation drill: from-scratch overfit on a synthetic VOC set.

Generates a tiny VOCdevkit tree of solid-color rectangles, trains a network
from random init on it, evaluates on the SAME images, and asserts every
present class reaches AP >= --min-ap. A healthy training path memorizes
this task (vgg16 reaches AP 1.0 on all present classes by ~1600 iters on
a v5e chip); a silent regression anywhere in the TRAIN graph (targets,
losses, optimizer, masking) shows up here long before a real-data run
could reveal it. This is the standing re-validation discipline after any
training-path math change (ROADMAP "Pending hardware validation" item 4).

The reference has no equivalent; its only end-to-end check is a full
VOC training run scored by mAP (reference README.md:138).

Usage:
    python tools/overfit_check.py                    # vgg16, 1600 iters
    python tools/overfit_check.py --iters 400 --net res50 --eval-every 200
"""

import argparse
import os
import os.path as osp
import pickle
import shutil
import sys
import tempfile

import _init_paths  # noqa: F401
import numpy as np

CLASSES_USED = ("aeroplane", "car", "person")


def make_synthetic_voc(root, n_images, seed=0):
    """VOCdevkit2007 tree of noise images with bright solid rectangles.

    The same images back both the trainval and test splits — this drill
    measures memorization, not generalization. Returns the sorted list of
    classes actually emitted (each image draws only 1-2 random classes, so
    with few images a class can be absent). Stale caches from a previous
    run of the same workdir (imdb gt_roidb pickle, voc_eval annotation
    cache) are removed first — they would otherwise silently serve the old
    annotations to a run with a different --seed/--images.
    """
    import cv2
    rng = np.random.RandomState(seed)
    shutil.rmtree(osp.join(root, "cache"), ignore_errors=True)
    shutil.rmtree(osp.join(root, "VOCdevkit2007", "annotations_cache"),
                  ignore_errors=True)
    voc = osp.join(root, "VOCdevkit2007", "VOC2007")
    os.makedirs(osp.join(voc, "JPEGImages"), exist_ok=True)
    os.makedirs(osp.join(voc, "Annotations"), exist_ok=True)
    os.makedirs(osp.join(voc, "ImageSets", "Main"), exist_ok=True)
    names = []
    emitted = set()
    for i in range(n_images):
        name = f"{i:06d}"
        names.append(name)
        h, w = 96, 128
        im = rng.randint(0, 60, (h, w, 3), np.uint8)
        objs = []
        for _ in range(rng.randint(1, 3)):
            x1, y1 = rng.randint(5, 60), rng.randint(5, 40)
            x2 = min(x1 + rng.randint(20, 50), w - 2)
            y2 = min(y1 + rng.randint(20, 40), h - 2)
            cls = CLASSES_USED[rng.randint(len(CLASSES_USED))]
            emitted.add(cls)
            im[y1:y2, x1:x2] = rng.randint(150, 255, 3)
            objs.append((cls, x1 + 1, y1 + 1, x2 + 1, y2 + 1))  # 1-based
        cv2.imwrite(osp.join(voc, "JPEGImages", name + ".jpg"), im)
        xml_objs = "".join(
            f"<object><name>{c}</name><pose>Left</pose>"
            f"<truncated>0</truncated><difficult>0</difficult>"
            f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
            f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>"
            for c, x1, y1, x2, y2 in objs)
        with open(osp.join(voc, "Annotations", name + ".xml"), "w") as f:
            f.write(f"<annotation><size><width>{w}</width>"
                    f"<height>{h}</height><depth>3</depth></size>"
                    f"{xml_objs}</annotation>")
    for split in ("trainval", "test"):
        with open(osp.join(voc, "ImageSets", "Main", split + ".txt"),
                  "w") as f:
            f.write("\n".join(names) + "\n")
    return sorted(emitted)


def configure_tiny(workdir):
    """Shrink the pipeline to the synthetic 96x128 task (single canvas,
    small anchor scales, no LR decay over the drill's horizon)."""
    from tf_faster_rcnn_tpu.config import cfg
    cfg.DATA_DIR = workdir
    cfg.ROOT_DIR = workdir
    cfg.EXP_DIR = "overfit"
    cfg.TPU.CANVAS_SIZE = [96, 128]
    cfg.TPU.MAX_GT = 8
    cfg.TRAIN.SCALES = (64,)
    cfg.TRAIN.MAX_SIZE = 96
    cfg.TEST.SCALES = (64,)
    cfg.TEST.MAX_SIZE = 96
    cfg.ANCHOR_SCALES = [2, 4]
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfg.TEST.RPN_POST_NMS_TOP_N = 32
    cfg.TRAIN.RPN_PRE_NMS_TOP_N = 256
    cfg.TRAIN.RPN_POST_NMS_TOP_N = 48
    cfg.TRAIN.BATCH_SIZE = 16
    cfg.TRAIN.RPN_BATCHSIZE = 32
    cfg.TRAIN.USE_FLIPPED = False
    cfg.TRAIN.STEPSIZE = [10 ** 9]
    cfg.TRAIN.DISPLAY = 100
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--net", default="vgg16",
                    choices=("vgg16", "res50", "res101", "res152", "mobile"))
    ap.add_argument("--iters", type=int, default=1600)
    ap.add_argument("--images", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min-ap", type=float, default=0.99,
                    help="per-present-class AP gate")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="in-training validation mAP cadence (TPU.EVAL_ITERS)")
    ap.add_argument("--workdir", default=None,
                    help="keep artifacts here (default: fresh temp dir)")
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="overfit_")
    os.makedirs(workdir, exist_ok=True)
    present = make_synthetic_voc(workdir, args.images, seed=args.seed)
    configure_tiny(workdir)

    import jax
    from tf_faster_rcnn_tpu.config import cfg
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.test_engine import test_net
    from tf_faster_rcnn_tpu.engine.train_loop import train_net
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
    from tf_faster_rcnn_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    print(f"devices: {jax.devices()}  workdir: {workdir}")

    if args.eval_every:
        cfg.TPU.EVAL_ITERS = args.eval_every

    imdb = get_imdb("voc_2007_trainval")
    imdb.set_proposal_method("gt")
    prepare_roidb(imdb)
    roidb = imdb.roidb
    out_dir = osp.join(workdir, "train_out")
    tb_dir = osp.join(workdir, "tb")
    evalimdb = get_imdb("voc_2007_test")
    state = train_net(args.net, imdb, roidb, list(roidb), out_dir, tb_dir,
                      max_iters=args.iters,
                      valimdb=evalimdb if args.eval_every else None)

    spec = spec_from_cfg(args.net, evalimdb.num_classes, "TEST")
    model = FasterRCNN(spec)
    params = jax.device_get(state.params)
    eval_dir = osp.join(workdir, "eval_out")
    mean_ap = test_net(model, spec, params, evalimdb, f"iter_{args.iters}",
                       max_per_image=20, output_dir=eval_dir)

    # gate only on classes the generator actually emitted: with a small
    # --images or unlucky --seed a CLASSES_USED member can have zero gt
    # instances, and its AP would be a spurious 0
    aps = {}
    for cls in present:
        with open(osp.join(eval_dir, f"{cls}_pr.pkl"), "rb") as f:
            aps[cls] = float(pickle.load(f)["ap"])
    print(f"[overfit] {args.net} @ {args.iters} iters: mAP(20cls) "
          f"{float(np.asarray(mean_ap).ravel()[0]):.4f}; present classes: "
          + ", ".join(f"{c}={a:.4f}" for c, a in aps.items()))
    ok = all(a >= args.min_ap for a in aps.values())
    print(f"[overfit] {'PASS' if ok else 'FAIL'} (gate {args.min_ap})")
    if not args.workdir:
        if ok:
            shutil.rmtree(workdir, ignore_errors=True)
        else:
            # keep the evidence (detections, PR pickles, snapshots) —
            # deleting it on FAIL leaves nothing to diagnose with
            print(f"[overfit] artifacts retained for diagnosis: {workdir}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
