"""Protocol-conformance validation of datasets/pycoco_lite.COCOeval
(VERDICT round-1 item 4).

The real pycocotools cannot be installed here (no egress, C extension), so
the evidence is two independent sources instead of one:

* hand-derived analytic fixtures — tiny scenes whose 12-stat vector is
  computed by hand from the published COCO evaluation protocol
  (cocodataset.org/#detection-eval: IoU .5:.95, 101-pt interpolated AP,
  area ranges, maxDets 1/10/100, crowd-ignore, area-range dt-ignore), each
  chosen so the targeted rule CHANGES the value if implemented wrong;
* a randomized differential test against ``_oracle_stats`` below — a
  second, independently-structured implementation of the same protocol
  (per-(img,cat) greedy matcher + vectorized accumulate) written directly
  from the protocol spec, exercised on 30 random scenes with crowds,
  mixed areas, score ties, and absent categories.

Reference eval entry point being protected: lib/datasets/coco.py:245-256
(_do_detection_eval -> COCOeval(gt, dt, 'bbox')).
"""

import os.path as osp

import numpy as np
import pytest

from tf_faster_rcnn_tpu.datasets.pycoco_lite import COCO, COCOeval

AREA_SMALL, AREA_MEDIUM = 32 ** 2, 96 ** 2


def _dataset(images, cats, anns):
    """Minimal COCO gt dict. anns: (img_id, cat_id, xywh, iscrowd)."""
    return {
        "images": [{"id": i, "height": 1000, "width": 1000} for i in images],
        "categories": [{"id": c, "name": f"c{c}"} for c in cats],
        "annotations": [
            {"id": j + 1, "image_id": im, "category_id": c,
             "bbox": list(map(float, bb)), "area": float(bb[2] * bb[3]),
             "iscrowd": int(crowd)}
            for j, (im, c, bb, crowd) in enumerate(anns)],
    }


def _dets(dts):
    """dt list: (img_id, cat_id, xywh, score)."""
    return [{"image_id": im, "category_id": c,
             "bbox": list(map(float, bb)), "score": float(s)}
            for im, c, bb, s in dts]


def _stats(gt_dict, dt_list):
    gt = COCO(gt_dict)
    ev = COCOeval(gt, gt.loadRes(list(dt_list)))
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return np.asarray(ev.stats)


def test_perfect_detection():
    """Two medium gts detected exactly: every AP 1.0; AR@1 is capped at one
    detection per (image, class) so it sees only the higher-scored match."""
    gt = _dataset([1], [1], [(1, 1, (10, 10, 40, 40), 0),
                             (1, 1, (300, 300, 50, 50), 0)])
    dt = _dets([(1, 1, (10, 10, 40, 40), 0.9),
                (1, 1, (300, 300, 50, 50), 0.8)])
    s = _stats(gt, dt)
    np.testing.assert_allclose(
        s, [1, 1, 1, -1, 1, -1, 0.5, 1, 1, -1, 1, -1], atol=1e-10)


def test_iou_threshold_boundary():
    """dt at IoU exactly 0.50 with the gt: matched at t=0.5 (>= semantics
    via min(t, 1-1e-10)), unmatched at every higher threshold ->
    AP = 1/10, AP50 = 1, AP75 = 0."""
    gt = _dataset([1], [1], [(1, 1, (0, 0, 10, 10), 0)])
    dt = _dets([(1, 1, (0, 0, 10, 5), 0.9)])   # inter 50 / union 100
    s = _stats(gt, dt)
    assert s[0] == pytest.approx(0.1, abs=1e-10)
    assert s[1] == pytest.approx(1.0, abs=1e-10)
    assert s[2] == pytest.approx(0.0, abs=1e-10)
    assert s[8] == pytest.approx(0.1, abs=1e-10)  # AR@100 averages over t


def test_interpolated_pr_curve():
    """TP(0.9), FP(0.8), TP(0.7) over 2 gts: pr=[1, 1/2, 2/3] -> monotone
    envelope [1, 2/3, 2/3], rc=[.5, .5, 1]; 101-pt AP =
    (51*1 + 50*(2/3)) / 101 = 253/303 at every IoU threshold."""
    gt = _dataset([1], [1], [(1, 1, (0, 0, 10, 10), 0),
                             (1, 1, (100, 100, 10, 10), 0)])
    dt = _dets([(1, 1, (0, 0, 10, 10), 0.9),
                (1, 1, (200, 200, 10, 10), 0.8),
                (1, 1, (100, 100, 10, 10), 0.7)])
    s = _stats(gt, dt)
    ap = 253.0 / 303.0
    assert s[0] == pytest.approx(ap, abs=1e-10)
    assert s[1] == pytest.approx(ap, abs=1e-10)
    assert s[2] == pytest.approx(ap, abs=1e-10)
    assert s[3] == pytest.approx(ap, abs=1e-10)   # all boxes small
    assert s[4] == -1 and s[5] == -1
    assert s[6] == pytest.approx(0.5, abs=1e-10)  # AR@1: top det only
    assert s[7] == pytest.approx(1.0, abs=1e-10)
    assert s[8] == pytest.approx(1.0, abs=1e-10)


def test_crowd_gt_ignores_matching_dt():
    """A dt inside a crowd region is IGNORED (crowd IoU = inter/dt-area),
    not a false positive: AP stays 1.0. A wrong implementation that counts
    it as FP (it outranks the TP) would give AP 0.5."""
    gt = _dataset([1], [1], [(1, 1, (0, 0, 10, 10), 0),
                             (1, 1, (50, 50, 30, 30), 1)])
    dt = _dets([(1, 1, (55, 55, 10, 10), 0.9),    # fully inside the crowd
                (1, 1, (0, 0, 10, 10), 0.8)])     # exact TP
    s = _stats(gt, dt)
    assert s[0] == pytest.approx(1.0, abs=1e-10)
    # AR@1: the single allowed det is the (ignored) crowd match -> 0
    assert s[6] == pytest.approx(0.0, abs=1e-10)
    assert s[8] == pytest.approx(1.0, abs=1e-10)


def test_unmatched_dt_outside_area_range_ignored():
    """In the 'small' slot an unmatched large dt is ignored, not FP: the
    small gt's AP_small stays 1.0 while AP_all (where the large FP outranks
    the TP) drops to 0.5."""
    gt = _dataset([1], [1], [(1, 1, (0, 0, 10, 10), 0)])
    dt = _dets([(1, 1, (200, 200, 100, 100), 0.95),  # large FP, no overlap
                (1, 1, (0, 0, 10, 10), 0.9)])        # small TP
    s = _stats(gt, dt)
    assert s[0] == pytest.approx(0.5, abs=1e-10)   # all: FP ranks first
    assert s[3] == pytest.approx(1.0, abs=1e-10)   # small: FP ignored
    assert s[4] == -1 and s[5] == -1               # no medium/large gts


def test_absent_category_excluded_from_mean():
    """A category with no gt anywhere stays -1 in the precision tensor and
    is excluded from the mean (not averaged in as 0)."""
    gt = _dataset([1], [1, 2], [(1, 1, (0, 0, 10, 10), 0)])
    dt = _dets([(1, 1, (0, 0, 10, 10), 0.9)])
    s = _stats(gt, dt)
    assert s[0] == pytest.approx(1.0, abs=1e-10)


def test_per_image_maxdets_cap():
    """maxDets caps detections PER IMAGE (before the global score merge):
    11 gts in one image, 11 perfect dts -> AR@10 = 10/11, AR@100 = 1."""
    boxes = [(60 * i, 60 * i, 40, 40) for i in range(11)]
    gt = _dataset([1], [1], [(1, 1, b, 0) for b in boxes])
    dt = _dets([(1, 1, b, 0.9 - 0.01 * i) for i, b in enumerate(boxes)])
    s = _stats(gt, dt)
    assert s[7] == pytest.approx(10.0 / 11.0, abs=1e-10)
    assert s[8] == pytest.approx(1.0, abs=1e-10)
    # AP@100 = 1; AP slice with maxDets=10: precision 1 up to recall 10/11,
    # unreached beyond -> (92*1)/101 (searchsorted: recThrs <= 10/11)
    assert s[0] == pytest.approx(1.0, abs=1e-10)


# ---------------------------------------------------------------------------
# Differential oracle: an independent implementation of the protocol.
# ---------------------------------------------------------------------------

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = (1, 10, 100)
AREA_RNGS = ((0, 1e10), (0, AREA_SMALL), (AREA_SMALL, AREA_MEDIUM),
             (AREA_MEDIUM, 1e10))


def _iou_xywh(d, g, crowd):
    dx, dy, dw, dh = d
    gx, gy, gw, gh = g
    iw = min(dx + dw, gx + gw) - max(dx, gx)
    ih = min(dy + dh, gy + gh) - max(dy, gy)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    denom = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / denom if denom > 0 else 0.0


def _match_scene(gts, dts, arng, maxdet):
    """Greedy matching for one (image, category, areaRng): returns
    (scores [D], matched [T,D], dt_ignored [T,D], n_countable_gt) with dts
    score-sorted and capped at maxdet. gts: (xywh, iscrowd); dts:
    (xywh, score)."""
    # countable gts first, ignored (crowd or out-of-range) last, original
    # order preserved within each group
    def g_ignored(g):
        box, crowd = g
        area = box[2] * box[3]
        return bool(crowd) or area < arng[0] or area > arng[1]

    order = sorted(range(len(gts)), key=lambda i: g_ignored(gts[i]))
    gts = [gts[i] for i in order]
    gig = [g_ignored(g) for g in gts]
    dts = sorted(dts, key=lambda d: -d[1])[:maxdet]
    T = len(IOU_THRS)
    matched = np.zeros((T, len(dts)), bool)
    ignored = np.zeros((T, len(dts)), bool)
    taken = np.zeros((T, len(gts)), bool)
    for ti, t in enumerate(IOU_THRS):
        for di, (dbox, _) in enumerate(dts):
            best, best_iou = -1, min(t, 1 - 1e-10)
            for gi, (gbox, crowd) in enumerate(gts):
                if taken[ti, gi] and not crowd:
                    continue
                if best > -1 and not gig[best] and gig[gi]:
                    break  # countable candidates exhausted
                iou = _iou_xywh(dbox, gbox, crowd)
                if iou >= best_iou:
                    best, best_iou = gi, iou
            if best > -1:
                matched[ti, di] = True
                taken[ti, best] = True
                ignored[ti, di] = gig[best]
        for di, (dbox, _) in enumerate(dts):
            area = dbox[2] * dbox[3]
            if not matched[ti, di] and (area < arng[0] or area > arng[1]):
                ignored[ti, di] = True
    scores = np.array([s for _, s in dts])
    return scores, matched, ignored, sum(1 for i in gig if not i)


def _oracle_stats(images, cats, gt_anns, dt_anns):
    """12-stat vector from first principles. gt_anns: (img, cat, xywh,
    iscrowd); dt_anns: (img, cat, xywh, score)."""
    K, A, M, T, R = len(cats), len(AREA_RNGS), len(MAX_DETS), len(
        IOU_THRS), len(REC_THRS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for ki, cat in enumerate(cats):
        for ai, arng in enumerate(AREA_RNGS):
            for mi, maxdet in enumerate(MAX_DETS):
                scenes = [
                    _match_scene(
                        [(g[2], g[3]) for g in gt_anns
                         if g[0] == im and g[1] == cat],
                        [(d[2], d[3]) for d in dt_anns
                         if d[0] == im and d[1] == cat],
                        arng, maxdet)
                    for im in images]
                scenes = [s for s in scenes if s[0].size or s[3]]
                npig = sum(s[3] for s in scenes)
                if npig == 0:
                    continue
                if scenes:
                    scores = np.concatenate([s[0] for s in scenes])
                    matched = np.concatenate([s[1] for s in scenes], axis=1)
                    ignored = np.concatenate([s[2] for s in scenes], axis=1)
                else:
                    scores = np.zeros(0)
                    matched = ignored = np.zeros((T, 0), bool)
                order = np.argsort(-scores, kind="mergesort")
                matched, ignored = matched[:, order], ignored[:, order]
                for ti in range(T):
                    keep = ~ignored[ti]
                    m = matched[ti][keep]
                    tp = np.cumsum(m)
                    fp = np.cumsum(~m)
                    rc = tp / npig
                    pr = tp / np.maximum(tp + fp, 1e-12)
                    recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0.0
                    # monotone-from-the-right envelope
                    env = np.maximum.accumulate(pr[::-1])[::-1] if len(
                        pr) else pr
                    q = np.zeros(R)
                    idx = np.searchsorted(rc, REC_THRS, side="left")
                    ok = idx < len(env)
                    q[ok] = env[idx[ok]]
                    precision[ti, :, ki, ai, mi] = q
    def _mean(x):
        v = x[x > -1]
        return float(v.mean()) if v.size else -1.0
    s = np.zeros(12)
    s[0] = _mean(precision[:, :, :, 0, 2])
    s[1] = _mean(precision[0, :, :, 0, 2])
    s[2] = _mean(precision[5, :, :, 0, 2])
    s[3] = _mean(precision[:, :, :, 1, 2])
    s[4] = _mean(precision[:, :, :, 2, 2])
    s[5] = _mean(precision[:, :, :, 3, 2])
    s[6] = _mean(recall[:, :, 0, 0])
    s[7] = _mean(recall[:, :, 0, 1])
    s[8] = _mean(recall[:, :, 0, 2])
    s[9] = _mean(recall[:, :, 1, 2])
    s[10] = _mean(recall[:, :, 2, 2])
    s[11] = _mean(recall[:, :, 3, 2])
    return s


def _random_scene(rng, n_imgs=3, n_cats=3):
    images = list(range(1, n_imgs + 1))
    cats = list(range(1, n_cats + 1))
    gt_anns, dt_anns = [], []
    for im in images:
        for c in cats:
            for _ in range(rng.randint(0, 5)):
                # log-spread sizes so all three area buckets occur
                w, h = np.exp(rng.uniform(1.5, 5.0, 2))
                x, y = rng.uniform(0, 400, 2)
                crowd = rng.rand() < 0.2
                gt_anns.append((im, c, (x, y, w, h), crowd))
                # detections correlated with gts: jittered copies + misses
                if rng.rand() < 0.75:
                    jit = rng.uniform(-0.25, 0.25, 4) * (w, h, w, h)
                    # quantized scores force ties across images
                    dt_anns.append((im, c, (x + jit[0], y + jit[1],
                                            max(2.0, w + jit[2]),
                                            max(2.0, h + jit[3])),
                                    round(rng.rand(), 1)))
            for _ in range(rng.randint(0, 3)):   # pure false positives
                w, h = np.exp(rng.uniform(1.5, 5.0, 2))
                x, y = rng.uniform(0, 400, 2)
                dt_anns.append((im, c, (x, y, w, h), round(rng.rand(), 1)))
    return images, cats, gt_anns, dt_anns


@pytest.mark.parametrize("seed", range(30))
def test_differential_random_scenes(seed):
    rng = np.random.RandomState(seed)
    images, cats, gt_anns, dt_anns = _random_scene(rng)
    if not gt_anns:
        pytest.skip("empty scene")
    expected = _oracle_stats(images, cats, gt_anns, dt_anns)
    got = _stats(_dataset(images, cats, gt_anns), _dets(dt_anns))
    np.testing.assert_allclose(got, expected, atol=1e-9,
                               err_msg=f"seed {seed}")


# ---------------------------------------------------------------------------
# Torture cases (VERDICT r2 item 6): every maxDets cap binding, area-range
# boundaries hit exactly, and mass score ties where sort stability decides
# the PR curve.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(4))
def test_differential_maxdets_torture(seed):
    """>100 detections per (image, category): all three maxDets slots
    (1/10/100) truncate, with exact score ties straddling each cap boundary
    so an unstable per-image sort or a post-merge cap shows up."""
    rng = np.random.RandomState(100 + seed)
    images, cats = [1, 2], [1]
    gt_anns, dt_anns = [], []
    for im in images:
        for i in range(30):
            x, y = rng.uniform(0, 900, 2)
            gt_anns.append((im, 1, (x, y, 40.0, 40.0), False))
            # a matching det + extra jittered duplicates -> ~120 dts/img
            for j in range(4):
                # scores quantized to 8 levels: heavy ties, including at
                # ranks 1, 10 and 100
                score = round(rng.randint(1, 9) / 8.0, 3)
                jit = rng.uniform(-10, 10, 2)
                dt_anns.append((im, 1, (x + jit[0], y + jit[1], 40.0, 40.0),
                                score))
    expected = _oracle_stats(images, cats, gt_anns, dt_anns)
    got = _stats(_dataset(images, cats, gt_anns), _dets(dt_anns))
    np.testing.assert_allclose(got, expected, atol=1e-9,
                               err_msg=f"seed {seed}")


@pytest.mark.parametrize("seed", range(4))
def test_differential_area_boundary_torture(seed):
    """gt and dt areas exactly AT the small/medium boundaries (32^2, 96^2)
    and one unit either side: the protocol's closed [a, b] ranges must
    include the boundary on both adjacent slots."""
    rng = np.random.RandomState(200 + seed)
    images, cats = [1], [1, 2]
    sizes = [(32.0, 32.0),              # area == 1024: small AND medium edge
             (32.0, 32.0 + 1.0 / 32),   # just above
             (31.0, 33.0),              # 1023: strictly small
             (96.0, 96.0),              # area == 9216: medium AND large edge
             (96.0, 96.0 + 1.0 / 96),
             (95.0, 97.0)]
    gt_anns, dt_anns = [], []
    for k, (w, h) in enumerate(sizes):
        for c in cats:
            x, y = rng.uniform(0, 800, 2)
            gt_anns.append((1, c, (x, y, w, h), False))
            if rng.rand() < 0.8:
                dt_anns.append((1, c, (x, y, w, h), round(rng.rand(), 1)))
            # unmatched dt at the same boundary size (dt-ignore rule)
            dt_anns.append((1, c, (x + 500, y + 100, w, h),
                            round(rng.rand(), 1)))
    expected = _oracle_stats(images, cats, gt_anns, dt_anns)
    got = _stats(_dataset(images, cats, gt_anns), _dets(dt_anns))
    np.testing.assert_allclose(got, expected, atol=1e-9,
                               err_msg=f"seed {seed}")


@pytest.mark.parametrize("levels", [1, 2])
def test_differential_total_score_tie(levels):
    """Every detection shares one (or two) score values across images and
    categories: the global merge is decided entirely by sort stability;
    oracle and implementation must agree on the resulting PR curve."""
    rng = np.random.RandomState(42)
    images, cats = [1, 2, 3], [1, 2]
    gt_anns, dt_anns = [], []
    for im in images:
        for c in cats:
            for _ in range(rng.randint(1, 6)):
                w, h = np.exp(rng.uniform(2.0, 5.0, 2))
                x, y = rng.uniform(0, 700, 2)
                crowd = rng.rand() < 0.15
                gt_anns.append((im, c, (x, y, w, h), crowd))
                score = 0.5 if levels == 1 else (0.5, 0.7)[rng.randint(2)]
                if rng.rand() < 0.8:
                    jit = rng.uniform(-0.2, 0.2, 2) * (w, h)
                    dt_anns.append((im, c, (x + jit[0], y + jit[1], w, h),
                                    score))
                dt_anns.append((im, c, (rng.uniform(0, 700),
                                        rng.uniform(0, 700), w, h), score))
    expected = _oracle_stats(images, cats, gt_anns, dt_anns)
    got = _stats(_dataset(images, cats, gt_anns), _dets(dt_anns))
    np.testing.assert_allclose(got, expected, atol=1e-9)


# ---------------------------------------------------------------------------
# pycocotools golden triples: replayed when the fixture exists (minted by
# tools/make_cocoeval_goldens.py on any host with real pycocotools — the
# Docker image runs it at build time; this container has no pycocotools).
# ---------------------------------------------------------------------------

GOLDENS = osp.join(osp.dirname(__file__), "fixtures",
                   "cocoeval_goldens.json")


def test_pycocotools_golden_triples():
    if not osp.exists(GOLDENS):
        # LOUD on purpose (VERDICT r3 weak #6): this skip means the COCO
        # evaluator that would produce the headline AP has NEVER been run
        # against real pycocotools — only against the in-repo oracles.
        # Mint tests/fixtures/cocoeval_goldens.json on any
        # pycocotools-bearing host (tools/make_cocoeval_goldens.py; the
        # Docker build does it automatically) and check it in.
        import warnings
        warnings.warn(
            "UNVALIDATED BOUNDARY: pycoco_lite has never been checked "
            "against real pycocotools — cocoeval_goldens.json is not "
            "minted (see ROADMAP 'Known validation boundaries')")
        pytest.skip("NEVER RUN vs real pycocotools: golden triples not "
                    "minted (tools/make_cocoeval_goldens.py needs a "
                    "pycocotools-bearing host; this container has none)")
    import json
    triples = json.load(open(GOLDENS))
    assert triples, "empty goldens file"
    for t in triples:
        got = _stats(t["gt"], t["dt"])
        np.testing.assert_allclose(
            got, np.asarray(t["stats"], float), atol=1e-9,
            err_msg=f"golden seed {t['seed']}")
