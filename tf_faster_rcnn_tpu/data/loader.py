"""Training data layer: epoch permutations, cursors, fixed-shape minibatches.

Behavior parity with the reference RoIDataLayer and minibatch builder
(/root/reference/lib/roi_data_layer/layer.py:24-88, minibatch.py:19-74):
epoch-wise permutation with optional aspect-ratio grouping, cursor-based
index generation whose state is checkpointable (the reference pickles it
into every snapshot, train_val.py:57-78), random scale selection, flip
handling, and the COCO crowd-box exclusion under USE_ALL_GT=False.

TPU differences: the batch has static shape — images land on a fixed canvas
(see data/blob.py), gt boxes pad to TPU.MAX_GT with a validity mask, and the
batch size is images-per-step across the data-parallel mesh rather than the
reference's hard-coded single image.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Dict, Optional, Tuple

import numpy as np

from tf_faster_rcnn_tpu.config import cfg
from tf_faster_rcnn_tpu.data.blob import (batch_image_shape, image_pool,
                                          place_on_canvas, prep_im_for_blob,
                                          read_image_bgr, transfer_dtype)

__all__ = ["RoIDataLayer", "get_minibatch"]

_TRUNC_WARNED = False


def _sample_scale(rng: np.random.RandomState):
    scales = cfg.TRAIN.SCALES
    return scales[int(rng.randint(0, high=len(scales)))]


def get_minibatch(roidb_entries, canvas_hw: Tuple[int, int], max_gt: int,
                  rng: Optional[np.random.RandomState] = None,
                  target_sizes=None) -> Dict:
    """Build a fixed-shape batch from roidb entries.

    Returns dict with image [B,H,W,3], im_info [B,3], gt_boxes [B,G,5],
    gt_valid [B,G], plus orig_hw [B,2] for eval-time clipping.
    ``target_sizes`` (one per entry) overrides the per-image random scale
    draw — used by the multi-host layer, which draws scales for the global
    batch so every host's RNG stays in lockstep.
    """
    rng = rng or np.random
    b = len(roidb_entries)
    img_shape, s2d = batch_image_shape(b, canvas_hw)
    images = np.zeros(img_shape, transfer_dtype())
    im_info = np.zeros((b, 3), np.float32)
    gt_boxes = np.zeros((b, max_gt, 5), np.float32)
    gt_valid = np.zeros((b, max_gt), bool)
    orig_hw = np.zeros((b, 2), np.float32)

    # all RNG draws happen up front in call order (identical stream to the
    # previous sequential loop) so the per-image work is pure and can fan
    # out over the image pool
    if target_sizes is None:
        target_sizes = [_sample_scale(rng) for _ in roidb_entries]

    def _load(i, entry):
        im = read_image_bgr(entry['image'])
        orig_hw[i] = (im.shape[0], im.shape[1])
        if entry.get('flipped', False):
            im = im[:, ::-1, :]
        im, scale = prep_im_for_blob(im, cfg.PIXEL_MEANS, target_sizes[i],
                                     cfg.TRAIN.MAX_SIZE)
        h, w = place_on_canvas(images[i], im, s2d)
        im_info[i] = (h, w, scale)
        return scale

    scales_out = list(image_pool().map(
        _load, range(b), roidb_entries))

    for i, entry in enumerate(roidb_entries):
        scale = scales_out[i]
        if cfg.TRAIN.USE_ALL_GT:
            gt_inds = np.where(entry['gt_classes'] != 0)[0]
        else:
            # exclude crowd boxes (gt_overlaps row max == -1, coco.py:158)
            gt_inds = np.where(
                (entry['gt_classes'] != 0)
                & np.all(entry['gt_overlaps'].toarray() > -1.0, axis=1))[0]
        n = min(len(gt_inds), max_gt)
        if len(gt_inds) > max_gt:
            # dropped objects would otherwise train as background — make the
            # truncation loud so TPU.MAX_GT gets raised for dense datasets
            global _TRUNC_WARNED
            if not _TRUNC_WARNED:
                print(f"WARNING: image {entry.get('image', '?')} has "
                      f"{len(gt_inds)} gt boxes > TPU.MAX_GT={max_gt}; "
                      f"truncating (raise cfg.TPU.MAX_GT). Further "
                      f"truncations will not be logged.")
                _TRUNC_WARNED = True
        sel = gt_inds[:n]
        gt_boxes[i, :n, :4] = entry['boxes'][sel, :].astype(np.float32) * scale
        gt_boxes[i, :n, 4] = entry['gt_classes'][sel]
        gt_valid[i, :n] = True

    return {"image": images, "im_info": im_info, "gt_boxes": gt_boxes,
            "gt_valid": gt_valid, "orig_hw": orig_hw}


class RoIDataLayer(object):
    """Fast R-CNN style data layer with checkpointable iteration state."""

    def __init__(self, roidb, random=False, batch_size: Optional[int] = None,
                 canvas_hw: Optional[Tuple[int, int]] = None,
                 max_gt: Optional[int] = None,
                 process_index: int = 0, process_count: int = 1):
        """``batch_size`` is the GLOBAL batch. With process_count > 1 every
        host runs identical permutation/cursor/RNG state (same seed, and all
        random draws are made at global-batch granularity) but materializes
        — decodes, resizes, pads — only its own contiguous slice of each
        batch, for parallel/mesh.py::shard_batch to assemble."""
        from tf_faster_rcnn_tpu.config import canvas_buckets, mixed_canvas
        self._roidb = roidb
        self._random = random
        self._batch = batch_size or int(cfg.TRAIN.IMS_PER_BATCH)
        # an explicit canvas pins every batch to one shape; otherwise each
        # batch runs on its orientation bucket's canvas (mixed-orientation
        # batches fall back to the union canvas) — with ASPECT_GROUPING the
        # permutation keeps batches orientation-pure, so the step program
        # compiles once per bucket instead of once for the big square
        self._buckets = (canvas_hw,) if canvas_hw else \
            canvas_buckets(cfg.TRAIN)
        self._mixed = mixed_canvas(self._buckets)
        self._max_gt = max_gt or int(cfg.TPU.MAX_GT)
        assert self._batch % process_count == 0, (
            f"global batch {self._batch} not divisible by "
            f"{process_count} processes")
        self._pid = process_index
        self._pcount = process_count
        self._rng = np.random.RandomState(cfg.RNG_SEED)
        self._shuffle_roidb_inds()

    def _shuffle_roidb_inds(self):
        """Randomly permute the roidb, optionally grouping by aspect ratio
        (layer.py:32-62)."""
        if self._random:
            # time-seeded shuffle for the validation layer (layer.py:37-41);
            # multi-host runs need every host on the same permutation, so
            # the seed must not come from local wall-clock there
            if self._pcount > 1:
                seed = (cfg.RNG_SEED + 0x5EED
                        + getattr(self, "_n_shuffles", 0)) % (2 ** 31)
            else:
                seed = int(time.time() * 1000) % 4096
            self._rng = np.random.RandomState(seed)
        self._n_shuffles = getattr(self, "_n_shuffles", 0) + 1
        if cfg.TRAIN.ASPECT_GROUPING:
            # same-orientation pairing (layer.py:43-56 semantics): permute
            # each orientation group, concatenate, shuffle at pair
            # granularity. Odd group sizes straddle exactly one mixed pair;
            # an odd TOTAL (unflipped roidbs) holds the last index out
            # rather than failing the pair reshape like the reference.
            landscape = np.array(
                [r['width'] >= r['height'] for r in self._roidb])
            order = np.concatenate(
                [self._rng.permutation(np.flatnonzero(landscape)),
                 self._rng.permutation(np.flatnonzero(~landscape))])
            tail = order[len(order) & ~1:]
            pairs = order[:len(order) & ~1].reshape(-1, 2)
            self._perm = np.concatenate(
                [pairs[self._rng.permutation(len(pairs))].ravel(), tail])
        else:
            self._perm = self._rng.permutation(np.arange(len(self._roidb)))
        self._cur = 0

    def _get_next_minibatch_inds(self):
        if self._cur + self._batch > len(self._roidb):
            self._shuffle_roidb_inds()
        if self._batch > len(self._roidb):
            # tiny roidb: wrap so the batch shape stays fixed (a short batch
            # would recompile the jitted step, or break mesh sharding)
            reps = -(-self._batch // len(self._roidb))
            db_inds = np.tile(self._perm, reps)[:self._batch]
            self._cur = len(self._roidb)  # force reshuffle next time
            return db_inds
        db_inds = self._perm[self._cur:self._cur + self._batch]
        self._cur += self._batch
        return db_inds

    def _batch_canvas(self, db_inds):
        """Canvas for a batch, decided from the GLOBAL index list (before
        host slicing) so every process ships the same shard shape."""
        if len(self._buckets) == 1:
            return self._buckets[0]
        from tf_faster_rcnn_tpu.config import bucket_index
        entries = [self._roidb[int(i)] for i in db_inds]
        if not all('width' in e and 'height' in e for e in entries):
            return self._mixed  # no size metadata (prepare_roidb not run)
        ks = {bucket_index(e['height'], e['width'], self._buckets)
              for e in entries}
        return self._buckets[ks.pop()] if len(ks) == 1 else self._mixed

    def forward(self) -> Dict:
        db_inds = self._get_next_minibatch_inds()
        canvas = self._batch_canvas(db_inds)
        # one global-batch-sized draw keeps host RNG streams identical
        # regardless of which slice each host materializes
        scales = cfg.TRAIN.SCALES
        scale_inds = self._rng.randint(0, len(scales), size=len(db_inds))
        if self._pcount > 1:
            per = self._batch // self._pcount
            sl = slice(self._pid * per, (self._pid + 1) * per)
            db_inds, scale_inds = db_inds[sl], scale_inds[sl]
        entries = [self._roidb[int(i)] for i in db_inds]
        return get_minibatch(entries, canvas, self._max_gt, self._rng,
                             target_sizes=[scales[int(i)]
                                           for i in scale_inds])

    # --- checkpointable iteration state (mirrors the reference's pickled
    # cursors/permutations, train_val.py:57-78) ---

    def get_state(self) -> Dict:
        return {"cur": self._cur, "perm": np.asarray(self._perm),
                "rng_state": self._rng.get_state(),
                "n_shuffles": getattr(self, "_n_shuffles", 0)}

    def set_state(self, state: Dict):
        self._cur = int(state["cur"])
        self._perm = np.asarray(state["perm"])
        self._rng.set_state(state["rng_state"])
        self._n_shuffles = int(state.get("n_shuffles", 0))


class PrefetchingDataLayer(object):
    """Background-thread prefetch wrapper around RoIDataLayer.

    The reference left prefetching as an unimplemented comment
    (lib/roi_data_layer/layer.py:78-79); image decode/resize there runs
    synchronously inside the train loop. This wrapper overlaps the host-side
    minibatch build with device compute via a bounded queue.

    Checkpointing note: get_state() drains nothing — it snapshots the inner
    layer's state *before* prefetched batches were consumed, so resume
    replays at most `depth` batches (sampling noise only, like the
    reference's own acknowledged RNG-restore slack, train_val.py:86-88).
    """

    def __init__(self, inner: RoIDataLayer, depth: int = 2):
        self._inner = inner
        self._queue = queue.Queue(maxsize=depth)
        self._lock = threading.Lock()
        self._gen = 0  # bumped by set_state; stale-generation items dropped
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            with self._lock:
                gen = self._gen
                state = self._inner.get_state()
                batch = self._inner.forward()
            # put outside the lock: a blocking put while holding the lock
            # would deadlock against set_state's drain-under-lock
            while not self._stop.is_set():
                try:
                    self._queue.put((gen, state, batch), timeout=0.5)
                    break
                except queue.Full:
                    continue

    def forward(self) -> Dict:
        while True:
            gen, state, batch = self._queue.get()
            # a worker blocked in put() during set_state can land one item
            # built from the pre-restore state; its stale generation tag
            # identifies it
            if gen == self._gen:
                self._last_state = state
                return batch

    def get_state(self) -> Dict:
        return getattr(self, "_last_state", self._inner.get_state())

    def set_state(self, state: Dict):
        with self._lock:
            self._gen += 1
            # drain prefetched batches built from the old state
            while not self._queue.empty():
                try:
                    self._queue.get_nowait()
                except queue.Empty:
                    break
            self._inner.set_state(state)

    def close(self):
        self._stop.set()
        while not self._queue.empty():
            try:
                self._queue.get_nowait()
            except queue.Empty:
                break
