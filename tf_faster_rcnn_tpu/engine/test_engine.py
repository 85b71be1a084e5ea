"""Evaluation engine: batched im_detect over an imdb, detections.pkl,
dataset evaluation.

Flow parity with the reference test engine (/root/reference/lib/model/
test.py:86-193): blob prep per TEST.SCALES/MAX_SIZE, forward, per-class NMS
at TEST.NMS, max_per_image cap, detections.pkl, imdb.evaluate_detections,
plus apply_nms for re-evaluation (reval). The TPU differences: images run in
fixed-shape batches through one jitted program that includes the postprocess
(the reference loops classes on the host per image, test.py:162-170), and
the per-image timing printout is kept.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from tf_faster_rcnn_tpu.config import bucket_index, canvas_buckets, cfg
from tf_faster_rcnn_tpu.data.blob import (batch_image_shape, image_pool,
                                          place_on_canvas, prep_im_for_blob,
                                          read_image_bgr, transfer_dtype)
from tf_faster_rcnn_tpu.engine.detect import postprocess_detections
from tf_faster_rcnn_tpu.utils.native import nms_cpu
from tf_faster_rcnn_tpu.utils.timer import Timer

__all__ = ["make_detect_fn", "im_detect", "test_net", "apply_nms"]


def make_detect_fn(model, spec, max_per_image: Optional[int] = None,
                   score_thresh: float = 0.0):
    """Jitted (params, image, im_info, orig_hw) -> (detections, valid).

    detections: [B, max_per_image, 6] as (cls, score, x1, y1, x2, y2) in
    original image coordinates.
    """
    import jax
    mpi = int(max_per_image or cfg.TPU.MAX_PER_IMAGE)
    nms_thresh = float(cfg.TEST.NMS)
    bbox_reg = bool(cfg.TEST.BBOX_REG)

    @jax.jit
    def detect(params, image, im_info, orig_hw):
        out = model.apply(params, image, im_info)
        return postprocess_detections(
            out["rois"], out["roi_valid"], out["cls_prob"], out["bbox_pred"],
            im_info, orig_hw, num_classes=spec.num_classes,
            max_per_image=mpi, nms_thresh=nms_thresh,
            score_thresh=score_thresh, bbox_reg=bbox_reg)

    return detect


def _prep_batch(paths, canvas):
    b = len(paths)
    img_shape, s2d = batch_image_shape(b, canvas)
    images = np.zeros(img_shape, transfer_dtype())
    im_info = np.zeros((b, 3), np.float32)
    orig_hw = np.zeros((b, 2), np.float32)

    def _load(i, p):
        im = read_image_bgr(p)
        orig_hw[i] = (im.shape[0], im.shape[1])
        prepped, scale = prep_im_for_blob(
            im, cfg.PIXEL_MEANS, cfg.TEST.SCALES[0], cfg.TEST.MAX_SIZE)
        h, w = place_on_canvas(images[i], prepped, s2d)
        im_info[i] = (h, w, scale)

    list(image_pool().map(_load, range(b), paths))
    return images, im_info, orig_hw


def im_detect(detect_fn, params, im, canvas=None):
    """Single-image detection (demo-style). Returns (dets [N,6], valid)."""
    if canvas is None:
        buckets = canvas_buckets(cfg.TEST)
        canvas = buckets[bucket_index(im.shape[0], im.shape[1], buckets)]
    img_shape, s2d = batch_image_shape(1, canvas)
    orig_hw = np.array([[im.shape[0], im.shape[1]]], np.float32)
    prepped, scale = prep_im_for_blob(
        im.copy(), cfg.PIXEL_MEANS, cfg.TEST.SCALES[0], cfg.TEST.MAX_SIZE)
    c = np.zeros(img_shape[1:], transfer_dtype())
    h, w = place_on_canvas(c, prepped, s2d)
    det, dv = detect_fn(params, c[None], np.array([[h, w, scale]], np.float32),
                        orig_hw)
    det, dv = np.asarray(det[0]), np.asarray(dv[0])
    return det[dv], dv


def _slab_to_all_boxes(det, dv, num_classes):
    """Fixed detection slab -> the reference all_boxes row (per-class [N,5]
    arrays of (x1,y1,x2,y2,score))."""
    per_class = [[] for _ in range(num_classes)]
    for row, ok in zip(det, dv):
        if not ok:
            continue
        c = int(row[0])
        per_class[c].append([row[2], row[3], row[4], row[5], row[1]])
    return [np.array(v, np.float32).reshape(-1, 5) for v in per_class]


def test_net(model, spec, params, imdb, weights_filename,
             max_per_image: int = 100, thresh: float = 0.0,
             batch_size: Optional[int] = None, output_dir: Optional[str] = None,
             mesh=None, detect_fn=None):
    """Evaluate a model on an imdb; writes detections.pkl, runs the dataset
    evaluator, returns its result (mAP for VOC).

    With a mesh, evaluation runs data-parallel: the image batch shards over
    the mesh's data axis with replicated params (the reference has no
    multi-device eval at all)."""
    from tf_faster_rcnn_tpu.config import get_output_dir
    np.random.seed(cfg.RNG_SEED)
    num_images = imdb.num_images
    num_classes = imdb.num_classes
    all_boxes = [[[] for _ in range(num_images)]
                 for _ in range(num_classes)]
    output_dir = output_dir or get_output_dir(imdb, weights_filename)
    os.makedirs(output_dir, exist_ok=True)
    buckets = canvas_buckets(cfg.TEST)
    b = batch_size or max(1, int(cfg.TPU.IMS_PER_DEVICE))
    if mesh is not None:
        # batch follows the DATA axis; model-axis devices cooperate on the
        # same images (TP head / SP backbone, parallel/mesh.py)
        from tf_faster_rcnn_tpu.parallel.mesh import (data_axis_size,
                                                      shard_params)
        n_dev = data_axis_size(mesh)
        b = max(b, n_dev)
        b -= b % n_dev
        params = shard_params(mesh, params, spec.backbone)

    # callers that evaluate repeatedly (in-training eval) pass a cached
    # detect_fn — a fresh closure per call would miss jax.jit's cache and
    # pay the full trace+compile every time
    detect_fn = detect_fn or make_detect_fn(model, spec, max_per_image,
                                            thresh)

    _t = {'im_detect': Timer(), 'misc': Timer()}

    # group images by orientation bucket so every batch runs on the tight
    # canvas for its orientation (one compiled program per bucket); a header
    # probe is enough since uniform resize preserves orientation
    if len(buckets) > 1:
        from PIL import Image
        groups = [[] for _ in buckets]
        for i in range(num_images):
            with Image.open(imdb.image_path_at(i)) as img:
                iw, ih = img.size
            groups[bucket_index(ih, iw, buckets)].append(i)
    else:
        groups = [list(range(num_images))]
    schedule = [(k, grp[s:s + b])
                for k, grp in enumerate(groups)
                for s in range(0, len(grp), b)]

    # multi-host: detection is embarrassingly parallel over images, so each
    # process takes a stripe of the batch schedule on its LOCAL devices (no
    # collectives) and the coordinator merges part files before evaluating
    # (same shared-output-dir assumption as multi-host snapshots)
    import jax
    pid, pcount = jax.process_index(), jax.process_count()
    run_token = None
    if pcount > 1:
        schedule = schedule[pid::pcount]
        # a coordinator-chosen token names this run's part files, so a
        # rerun into the same output dir can never merge a previous run's
        # leftovers (one tiny collective; processes are already clustered)
        import uuid
        from jax.experimental import multihost_utils
        seed = np.int64(np.frombuffer(uuid.uuid4().bytes[:8], np.int64)[0]
                        if pid == 0 else 0)
        run_token = f"{int(multihost_utils.broadcast_one_to_all(seed)):x}"

    # overlap host-side decode/resize with device compute: batches are
    # prepared by a pool of worker threads (cv2 decode/resize release the
    # GIL) consumed strictly in schedule order through a bounded window, so
    # one slow decode cannot stall the device behind an idle pipeline (the
    # reference preps synchronously inside its loop, test.py:152-153)
    from concurrent.futures import ThreadPoolExecutor
    n_workers = max(1, int(cfg.TPU.EVAL_PREFETCH_THREADS))
    window = n_workers + 2

    def _prep(item):
        k, idx = item
        # fixed batch shape: repeat the last image to fill the tail
        pad = b - len(idx)
        paths = [imdb.image_path_at(i) for i in idx] + \
                [imdb.image_path_at(idx[-1])] * pad
        return idx, _prep_batch(paths, buckets[k])

    pool = ThreadPoolExecutor(max_workers=n_workers)
    try:
        pending = [pool.submit(_prep, item) for item in schedule[:window]]
        next_submit = window

        done = 0
        for _ in schedule:
            _t['im_detect'].tic()
            idx, (images, im_info, orig_hw) = pending.pop(0).result()
            if next_submit < len(schedule):
                pending.append(pool.submit(_prep, schedule[next_submit]))
                next_submit += 1
            if mesh is not None:
                from tf_faster_rcnn_tpu.parallel.mesh import shard_batch
                sharded = shard_batch(mesh, {"image": images, "im_info": im_info,
                                             "orig_hw": orig_hw},
                                      spatial=bool(cfg.TPU.SPATIAL_PARTITION))
                with mesh:
                    det, dv = detect_fn(params, sharded["image"],
                                        sharded["im_info"], sharded["orig_hw"])
            else:
                det, dv = detect_fn(params, images, im_info, orig_hw)
            det, dv = np.asarray(det), np.asarray(dv)
            _t['im_detect'].toc()

            _t['misc'].tic()
            for j, i in enumerate(idx):
                boxes = _slab_to_all_boxes(det[j], dv[j], num_classes)
                for c in range(1, num_classes):
                    all_boxes[c][i] = boxes[c]
            _t['misc'].toc()
            # reference cadence: one line per image (test.py:158-160); times are
            # the batch averages since detection is batched here
            for _ in idx:
                done += 1
                print('im_detect: {:d}/{:d} {:.3f}s {:.3f}s'.format(
                    done, num_images,
                    _t['im_detect'].average_time, _t['misc'].average_time))
    finally:
        # cancel queued prep work on any exit path; non-daemon workers would
        # otherwise outlive an eval that raised mid-loop
        pool.shutdown(wait=False, cancel_futures=True)
    det_file = os.path.join(output_dir, 'detections.pkl')
    if pcount > 1:
        all_boxes = _merge_multihost_parts(det_file, all_boxes, pid, pcount,
                                           num_classes, num_images,
                                           token=run_token)
        if all_boxes is None:  # non-coordinator: part written, done
            # align with the coordinator's merge + dataset evaluation so a
            # caller that resumes collective work (in-training eval) cannot
            # run >30 s ahead into a fresh gloo context init
            # (parallel/dist.py::barrier). Token-scoped: concurrent evals
            # in one process group cannot cross-release.
            from tf_faster_rcnn_tpu.parallel import dist
            dist.barrier(f"testnet_{run_token}", timeout_ms=1_800_000)
            return None
    with open(det_file, 'wb') as f:
        pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)

    print('Evaluating detections')
    mean = imdb.evaluate_detections(all_boxes, output_dir)
    if pcount > 1:
        from tf_faster_rcnn_tpu.parallel import dist
        dist.barrier(f"testnet_{run_token}", timeout_ms=1_800_000)
    return mean


def _merge_multihost_parts(det_file, all_boxes, pid, pcount, num_classes,
                           num_images, token, timeout_s=900.0):
    """Non-coordinators write their detections as a token-named part file;
    the coordinator waits for every part, merges, and removes them. Owned
    entries are np arrays (possibly empty), unowned ones are the initial
    [] lists — unambiguous."""
    import time as _time

    def _part(p):
        return f'{det_file}.{token}.part{p}'

    if pid != 0:
        part = _part(pid)
        with open(part + '.tmp', 'wb') as f:
            pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)
        os.replace(part + '.tmp', part)  # atomic: never read half-written
        print(f'wrote {part}')
        return None
    parts = [_part(p) for p in range(1, pcount)]
    deadline = _time.time() + timeout_s
    while not all(os.path.exists(p) for p in parts):
        if _time.time() > deadline:
            missing = [p for p in parts if not os.path.exists(p)]
            raise RuntimeError(f'eval parts never arrived: {missing}')
        _time.sleep(0.2)
    for p in parts:
        with open(p, 'rb') as f:
            other = pickle.load(f)
        for c in range(num_classes):
            for i in range(num_images):
                if isinstance(other[c][i], np.ndarray):
                    all_boxes[c][i] = other[c][i]
        os.unlink(p)
    return all_boxes


def apply_nms(all_boxes, thresh):
    """Host-side per-class NMS over pickled detections (reval path;
    reference test.py:109-136). Uses the native C++ op with the reference
    gpu_nms semantics (+1 IoU, suppress at >)."""
    num_classes = len(all_boxes)
    num_images = len(all_boxes[0])
    nms_boxes = [[[] for _ in range(num_images)]
                 for _ in range(num_classes)]
    for cls_ind in range(num_classes):
        for im_ind in range(num_images):
            dets = all_boxes[cls_ind][im_ind]
            if len(dets) == 0:
                continue
            dets = np.asarray(dets, np.float32)
            x1, y1 = dets[:, 0], dets[:, 1]
            x2, y2 = dets[:, 2], dets[:, 3]
            inds = np.where((x2 > x1) & (y2 > y1))[0]
            dets = dets[inds, :]
            if dets.size == 0:
                continue
            keep = nms_cpu(dets, thresh, plus_one=True, suppress_eq=False)
            if len(keep) == 0:
                continue
            nms_boxes[cls_ind][im_ind] = dets[keep, :].copy()
    return nms_boxes
