"""Training driver: the SolverWrapper equivalent.

Flow parity with the reference (/root/reference/lib/model/train_val.py:
27-378): filter invalid roidb entries, build train/val data layers (val
layer time-seed shuffled), construct the model/optimizer, initialize from
pretrained weights (with the per-backbone import surgery) or resume from the
newest snapshot, then the hot loop: train step, loss display every DISPLAY
iters, periodic val-loss summaries every SUMMARY_INTERVAL seconds, snapshots
every SNAPSHOT_ITERS with SNAPSHOT_KEPT retention. LR gamma-decay at the
STEPSIZE boundaries happens inside the optimizer schedule (a pure function
of the step, so resume needs no LR bookkeeping and the reference's
pre-decay snapshot dance at :267-274 is unnecessary).

Observability: losses/LR stream to stdout in the reference's format, to a
metrics JSONL file (utils/metrics.py), and to real TensorBoard event files
in train/val sibling dirs — scalar losses, trainable-parameter histograms,
and the GT-boxes image summary, matching the reference writer setup
(train_val.py:148-151, network.py:437-450) without a TF dependency
(utils/tb_writer.py).
"""

from __future__ import annotations

import os
import signal
import time
import jax
import numpy as np

from tf_faster_rcnn_tpu.config import canvas_buckets, cfg
from tf_faster_rcnn_tpu.data.loader import RoIDataLayer
from tf_faster_rcnn_tpu.data.roidb import filter_roidb
from tf_faster_rcnn_tpu.engine.losses import detection_losses
from tf_faster_rcnn_tpu.engine.train import (create_train_state,
                                             lr_schedule, make_train_step,
                                             scale_recipe)
from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
from tf_faster_rcnn_tpu.utils import checkpoint as ckpt
from tf_faster_rcnn_tpu.utils.metrics import MetricsWriter
from tf_faster_rcnn_tpu.utils.tb_writer import TBEventWriter
from tf_faster_rcnn_tpu.utils.timer import Timer

__all__ = ["SolverWrapper", "train_net"]


class SolverWrapper(object):
    def __init__(self, network_name, imdb, roidb, valroidb, output_dir,
                 tb_dir, pretrained_model=None, mesh=None, valimdb=None):
        self.net_name = network_name
        self.imdb = imdb
        self.roidb = roidb
        self.valroidb = valroidb
        self.valimdb = valimdb
        self.output_dir = output_dir
        self.tb_dir = tb_dir
        self.pretrained_model = pretrained_model
        self.mesh = mesh

    def _eval_map(self, state, it, writer):
        """In-training validation mAP (TPU.EVAL_ITERS; no reference
        counterpart — the reference only summarizes val losses,
        train_val.py:198-210). Runs the full TEST-mode eval engine on
        ``valimdb`` with the live params and records the metric.

        Multi-host: test_net itself stripes the batch schedule across
        processes on their LOCAL devices (no collectives; engine/
        test_engine.py) and merges part files on the coordinator, so every
        process calls in here at the same iter with mesh=None and only the
        coordinator gets a non-None mAP back (writers/best-params are
        coordinator-only anyway). Equality with a single-process run at
        the same iter is pinned by tests/test_multihost.py."""
        from tf_faster_rcnn_tpu.engine.test_engine import (make_detect_fn,
                                                           test_net)
        multihost = jax.process_count() > 1
        if not hasattr(self, "_eval_model"):
            self._eval_spec = spec_from_cfg(
                self.net_name, self.valimdb.num_classes, "TEST")
            self._eval_model = FasterRCNN(self._eval_spec)
            # one closure for the whole run: jax.jit caches per function
            # object, so a fresh make_detect_fn per eval would recompile
            self._eval_detect_fn = make_detect_fn(
                self._eval_model, self._eval_spec,
                int(cfg.TPU.MAX_PER_IMAGE))
        out_dir = os.path.join(self.output_dir, f"val_eval_iter_{it}")
        params = jax.device_get(state.params)  # replicated: every process
        # has a full copy, so device_get works under a global mesh too
        mean_ap = test_net(self._eval_model, self._eval_spec, params,
                           self.valimdb, f"iter_{it}",
                           max_per_image=int(cfg.TPU.MAX_PER_IMAGE),
                           mesh=None if multihost else self.mesh,
                           output_dir=out_dir,
                           detect_fn=self._eval_detect_fn)
        # keep only the newest eval artifacts (detections.pkl per eval
        # would otherwise grow the run dir unboundedly); coordinator-only:
        # out_dir is shared in multi-host runs
        if not multihost or mean_ap is not None:
            prev_dir = getattr(self, "_last_eval_dir", None)
            if prev_dir and os.path.isdir(prev_dir):
                import shutil
                shutil.rmtree(prev_dir, ignore_errors=True)
            self._last_eval_dir = out_dir
        if mean_ap is not None:
            mean_ap = float(np.asarray(mean_ap).ravel()[0])
            print(f"iter {it}: validation mAP = {mean_ap:.4f}")
            if writer is not None:
                writer.write(it, {"val_mAP": mean_ap})
            if self.tb_writer_val is not None:
                self.tb_writer_val.add_scalar("VAL/mAP", mean_ap, it)
            if mean_ap > getattr(self, "_best_map", -1.0):
                # keep the best-so-far params where test_net/demo read them
                self._best_map = mean_ap
                best = os.path.join(self.output_dir,
                                    f"{cfg.TRAIN.SNAPSHOT_PREFIX}_best.msgpack")
                ckpt.save_params(best, params)
                print(f"iter {it}: new best mAP {mean_ap:.4f} -> {best}")
        return mean_ap

    def construct(self):
        np.random.seed(cfg.RNG_SEED)
        self.spec = spec_from_cfg(self.net_name, self.imdb.num_classes,
                                  "TRAIN")
        self.model = FasterRCNN(self.spec)
        canvas = canvas_buckets(cfg.TRAIN)[0]  # params are shape-agnostic
        # global batch follows the DATA axis only — devices on the model
        # axis cooperate on the same images (TP/SP), they don't add images
        from tf_faster_rcnn_tpu.parallel.mesh import data_axis_size
        b = int(cfg.TPU.IMS_PER_DEVICE) * (
            data_axis_size(self.mesh) if self.mesh is not None else 1)
        self.batch_size = b
        from tf_faster_rcnn_tpu.data.blob import batch_image_shape
        dummy = {
            "image": np.zeros(batch_image_shape(1, canvas)[0], np.float32),
            "im_info": np.array([[canvas[0], canvas[1], 1.0]], np.float32),
            "gt_boxes": np.zeros((1, cfg.TPU.MAX_GT, 5), np.float32),
            "gt_valid": np.zeros((1, cfg.TPU.MAX_GT), bool),
        }
        key = jax.random.PRNGKey(cfg.RNG_SEED)
        # jitted init: one (persistently cached) compile instead of
        # thousands of eager per-op dispatches, each paying the device RTT
        params = jax.jit(self.model.init)(
            {"params": key, "sampling": key, "dropout": key},
            dummy["image"], dummy["im_info"], dummy["gt_boxes"],
            dummy["gt_valid"])
        if self.pretrained_model:
            from tf_faster_rcnn_tpu.utils.slim_import import \
                load_pretrained_into
            params = load_pretrained_into(params, self.pretrained_model,
                                          self.net_name)
            print(f"Loaded pretrained weights from {self.pretrained_model}")
        else:
            # The frozen-prefix knobs exist to PRESERVE pretrained features
            # (reference resnet_v1.py:88-113 / mobilenet_v1.py:114). From
            # random init there is nothing to preserve: a frozen random
            # prefix is a fixed lossy projection the rest of the net can
            # never repair (mobilenet's residual-free separable stem loses
            # far more than resnet's, whose identity paths bypass the
            # frozen blocks). Warn loudly instead of silently training a
            # handicapped model.
            for match, knob, n in (
                    ("res", "RESNET.FIXED_BLOCKS", self.spec.fixed_blocks),
                    ("mobile", "MOBILENET.FIXED_LAYERS",
                     self.spec.fixed_layers)):
                if self.net_name.startswith(match) and n > 0:
                    unit = "blocks" if "BLOCKS" in knob else "layers"
                    print(f"WARNING: training from RANDOM init with the "
                          f"first {n} backbone {unit} frozen ({knob}={n}); "
                          f"the frozen prefix never leaves its random "
                          f"state. Pass --set {knob} 0 unless this is "
                          f"deliberate.")
            # the UNCONDITIONAL freezes (no knob controls them): vgg16's
            # conv1/conv2 (reference vgg16.py:28-32) and the resnet stem
            # (resnet_v1.py:88-90 — frozen at every FIXED_BLOCKS setting).
            # Same handicap as above, but there is no flag to turn it off,
            # so say so rather than suggest one.
            unconditional = {"vgg16": "conv1/conv2", "res": "conv1 stem"}
            for match, frozen in unconditional.items():
                if self.net_name.startswith(match):
                    print(f"WARNING: {self.net_name}'s {frozen} is ALWAYS "
                          f"frozen (matching the reference) and will stay "
                          f"at its random init for this from-scratch run — "
                          f"a permanent lossy projection of the input. "
                          f"Use a pretrained model for production quality.")
        self.state = create_train_state(self.spec, params,
                                        jax.random.PRNGKey(cfg.RNG_SEED + 1),
                                        batch_size=b)
        # schedule mapped onto the global batch (linear-scaling rule;
        # identity at batch 1 — see engine/train.py::scale_recipe)
        self.recipe = scale_recipe(b)
        if self.recipe["scale"] > 1:
            print(f"Batched recipe: global batch {b} -> LR "
                  f"{self.recipe['learning_rate']:g}, stepsize "
                  f"{self.recipe['stepsizes']}, warmup "
                  f"{self.recipe['warmup_steps']} steps (reference units /"
                  f" {self.recipe['scale']})")
        self.lr_fn = lr_schedule(self.recipe["learning_rate"],
                                 float(cfg.TRAIN.GAMMA),
                                 self.recipe["stepsizes"],
                                 self.recipe["warmup_steps"],
                                 self.recipe["warmup_factor"])
        self.step_fn = make_train_step(
            self.model, self.spec,
            weight_decay=float(cfg.TRAIN.WEIGHT_DECAY),
            mobile_weight_decay=float(cfg.MOBILENET.WEIGHT_DECAY),
            bias_decay=bool(cfg.TRAIN.BIAS_DECAY),
            lr_fn=self.lr_fn,
            nan_guard=bool(cfg.TPU.NAN_GUARD))

        # eval-style val forward for the periodic summary
        val_spec = self.spec
        val_model = self.model

        @jax.jit
        def val_losses(params, batch, key):
            out = val_model.apply(
                params, batch["image"], batch["im_info"], batch["gt_boxes"],
                batch["gt_valid"],
                rngs={"sampling": key, "dropout": jax.random.fold_in(key, 1)})
            return detection_losses(out, val_spec)

        self.val_loss_fn = val_losses

    def _write_gt_image(self, batch, it):
        """GT-boxes-drawn image summary (the reference's GROUND_TRUTH image
        summary, network.py:47-55) saved as a PNG in the metrics dir."""
        try:
            from PIL import Image
            from tf_faster_rcnn_tpu.utils.visualization import \
                draw_bounding_boxes
            img = np.asarray(jax.device_get(batch["image"])[0], np.float32)
            if img.shape[-1] == 12:  # invert the host space-to-depth layout
                h2, w2, _ = img.shape
                img = img.reshape(h2, w2, 2, 2, 3).transpose(
                    0, 2, 1, 3, 4).reshape(h2 * 2, w2 * 2, 3)
            img = img + cfg.PIXEL_MEANS
            img = img[:, :, ::-1]  # BGR -> RGB
            gt = jax.device_get(batch["gt_boxes"])[0]
            gv = jax.device_get(batch["gt_valid"])[0]
            info = jax.device_get(batch["im_info"])[0]
            out = draw_bounding_boxes(img, gt[gv], (info[0], info[1], 1.0))
            out = np.uint8(np.clip(out, 0, 255))
            Image.fromarray(out).save(
                os.path.join(self.tb_dir, f"gt_image_iter_{it}.png"))
            self.tb_writer.add_image("GROUND_TRUTH", out, it)
        except Exception as e:
            print(f"gt image summary skipped: {e}")

    def _write_param_histograms(self, params, it):
        """Trainable-variable histogram summaries (network.py:442-447)."""
        from jax.tree_util import tree_flatten_with_path, keystr
        leaves, _ = tree_flatten_with_path(params)
        for path, leaf in leaves:
            tag = "TRAIN/" + keystr(path).strip("[]'").replace(
                "']['", "/").replace("'].", "/").replace(".", "/")
            self.tb_writer.add_histogram(tag, np.asarray(leaf), it)

    def snapshot(self):
        if not getattr(self, "_is_coord", True):
            # multi-host: state is replicated and iterator state identical
            # on every host; only the coordinator writes (a shared or
            # synced output_dir is assumed for restore)
            return
        prefix = cfg.TRAIN.SNAPSHOT_PREFIX
        ckpt.snapshot(self.output_dir, prefix, self.state,
                      {"train": self.data_layer.get_state(),
                       "val": self.data_layer_val.get_state()},
                      extra_meta={"best_map": getattr(self, "_best_map",
                                                      -1.0)})
        ckpt.remove_old_snapshots(self.output_dir, prefix,
                                  int(cfg.TRAIN.SNAPSHOT_KEPT))

    def train_model(self, max_iters):
        """``max_iters`` is in REFERENCE units (1 image/iter, the driver
        scripts' ITERS tables); batched runs execute ceil(max_iters / B)
        steps over the same image budget (scale_recipe)."""
        self.construct()
        max_iters = self.recipe["iters"](max_iters)
        snapshot_iters = self.recipe["iters"](cfg.TRAIN.SNAPSHOT_ITERS)
        eval_iters = 0
        if int(cfg.TPU.EVAL_ITERS) > 0 and self.valimdb is not None:
            eval_iters = self.recipe["iters"](cfg.TPU.EVAL_ITERS)
        # multi-host: every process holds identical iterator state but
        # materializes only its slice of the global batch. The layers pick
        # each batch's canvas from its orientation bucket (config.
        # canvas_buckets); the jitted step compiles once per bucket.
        pid, pcount = jax.process_index(), jax.process_count()
        self._is_coord = pid == 0
        self.data_layer = RoIDataLayer(self.roidb,
                                       batch_size=self.batch_size,
                                       process_index=pid,
                                       process_count=pcount)
        self.data_layer_val = RoIDataLayer(self.valroidb, random=True,
                                           batch_size=self.batch_size,
                                           process_index=pid,
                                           process_count=pcount)
        if int(cfg.TPU.PREFETCH) > 0:
            from tf_faster_rcnn_tpu.data.loader import PrefetchingDataLayer
            self.data_layer = PrefetchingDataLayer(self.data_layer,
                                                   depth=int(cfg.TPU.PREFETCH))

        # resume from the newest snapshot if present
        prev = ckpt.find_previous(self.output_dir, cfg.TRAIN.SNAPSHOT_PREFIX)
        if prev is not None:
            step, sp, mp = prev
            self.state = ckpt.restore(self.state, sp)
            meta = ckpt.restore_meta(mp)
            self.data_layer.set_state(meta["data_state"]["train"])
            self.data_layer_val.set_state(meta["data_state"]["val"])
            np.random.set_state(meta["np_rng_state"])
            # a resumed run must not let a worse eval clobber the saved
            # best-mAP params
            self._best_map = float(meta.get("best_map", -1.0))
            print(f"Restored from iter {step}")

        if pcount > 1:
            assert self.mesh is not None, "multi-host training needs a mesh"
        # host-side observability is coordinator-only in multi-host runs
        writer = MetricsWriter(self.tb_dir) if self._is_coord else None
        # real TensorBoard event files, train/val sibling dirs as in the
        # reference (train_val.py:149-151)
        self.tb_writer = (TBEventWriter(self.tb_dir)
                          if self._is_coord else None)
        self.tb_writer_val = (TBEventWriter(self.tb_dir + "_val")
                              if self._is_coord else None)
        timer = Timer()
        last_summary_time = time.time()
        state = self.state
        if self.mesh is not None:
            from tf_faster_rcnn_tpu.parallel.mesh import shard_state
            state = shard_state(self.mesh, state, self.net_name)

        profile_dir = str(cfg.TPU.PROFILE_DIR)
        profiling = False
        it = int(jax.device_get(state.step))
        profile_start = it + min(10, max(max_iters - it - 1, 0))

        # preemption safety: TPU VMs get SIGTERM ahead of maintenance or
        # spot reclaim — finish the in-flight step, snapshot, and exit
        # cleanly so the next run resumes from here (no reference
        # counterpart; it loses everything since the last snapshot)
        preempted = []

        def _on_sigterm(signum, frame):
            preempted.append(signum)
            print("SIGTERM received: will snapshot and stop after the "
                  "current step")
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:           # not the main thread (tests)
            prev_handler = None

        while it < max_iters:
            if preempted and pcount == 1:
                break
            if pcount > 1 and it % int(cfg.TRAIN.DISPLAY) == 0:
                # multi-host: breaking out of the loop must be AGREED, or
                # the un-signaled hosts hang in the next step's all-reduce
                # waiting for the one that left; a tiny allgather every
                # DISPLAY iters turns any host's SIGTERM into a collective
                # stop within a couple of seconds
                from jax.experimental import multihost_utils
                flags = multihost_utils.process_allgather(
                    np.asarray([bool(preempted)]))
                if np.asarray(flags).any():
                    if not preempted:
                        preempted.append("peer")
                    break
            if profile_dir and not profiling and it >= profile_start:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            elif profiling and it >= profile_start + 5:
                jax.profiler.stop_trace()
                profiling = False
                profile_dir = ""
                print(f"Wrote profiler trace to {cfg.TPU.PROFILE_DIR}")
            timer.tic()
            batch = host_batch = self.data_layer.forward()
            batch.pop("orig_hw", None)
            if self.mesh is not None:
                from tf_faster_rcnn_tpu.parallel.mesh import shard_batch
                batch = shard_batch(self.mesh, batch,
                                    spatial=bool(cfg.TPU.SPATIAL_PARTITION))
            state, metrics = self.step_fn(state, batch)
            it += 1
            timer.toc()

            # failure detection: a non-finite loss/grad step was skipped on
            # device; persistent failure means training is dead — stop with
            # a clear message instead of burning the rest of the schedule
            if float(metrics.get("step_skipped", 0.0)) > 0.0:
                self._skip_streak = getattr(self, "_skip_streak", 0) + 1
                if self._is_coord:
                    print(f"WARNING: iter {it}: non-finite loss/grads — "
                          f"update skipped ({self._skip_streak} consecutive)")
                patience = int(cfg.TPU.NAN_GUARD_PATIENCE)
                if patience and self._skip_streak >= patience:
                    self.state = state
                    self.snapshot()
                    raise RuntimeError(
                        f"training diverged: {self._skip_streak} consecutive "
                        f"non-finite steps (snapshot saved at iter {it})")
            else:
                self._skip_streak = 0

            now = time.time()
            # multi-host: the val forward is a collective every process must
            # enter, so the trigger has to be deterministic (iter-count, not
            # per-host wall clock)
            if pcount > 1:
                do_summary = it == 1 or (
                    int(cfg.TPU.SUMMARY_ITERS) > 0
                    and it % int(cfg.TPU.SUMMARY_ITERS) == 0)
            else:
                do_summary = (it == 1 or
                              now - last_summary_time >
                              cfg.TRAIN.SUMMARY_INTERVAL)
            if do_summary:
                m = {k: float(v) for k, v in metrics.items()}
                val_batch = self.data_layer_val.forward()
                val_batch.pop("orig_hw", None)
                if self.mesh is not None:
                    from tf_faster_rcnn_tpu.parallel.mesh import shard_batch
                    val_batch = shard_batch(
                        self.mesh, val_batch,
                        spatial=bool(cfg.TPU.SPATIAL_PARTITION))
                vl = self.val_loss_fn(state.params, val_batch,
                                      jax.random.PRNGKey(it))
                vm = {k: float(v) for k, v in vl.items()}
                if self._is_coord:
                    writer.write(it, m, prefix="train")
                    self.tb_writer.add_scalars(m, it)
                    writer.write(it, vm, prefix="val")
                    self.tb_writer_val.add_scalars(vm, it)
                    self._write_gt_image(host_batch, it)
                    self._write_param_histograms(
                        jax.device_get(state.params), it)
                    self.tb_writer.flush()
                    self.tb_writer_val.flush()
                if pcount > 1:
                    # coordinator-only writer work above can take tens of
                    # seconds; re-align before anyone creates the next
                    # communicator (parallel/dist.py::barrier)
                    from tf_faster_rcnn_tpu.parallel import dist
                    dist.barrier(f"summary_{it}")
                last_summary_time = now

            if it % cfg.TRAIN.DISPLAY == 0 and self._is_coord:
                m = {k: float(v) for k, v in metrics.items()}
                print('iter: %d / %d, total loss: %.6f\n '
                      '>>> rpn_loss_cls: %.6f\n '
                      '>>> rpn_loss_box: %.6f\n '
                      '>>> loss_cls: %.6f\n '
                      '>>> loss_box: %.6f\n >>> lr: %f' %
                      (it, max_iters, m["total_loss"],
                       m["rpn_cross_entropy"], m["rpn_loss_box"],
                       m["cross_entropy"], m["loss_box"],
                       m.get("learning_rate", 0.0)))
                print('speed: {:.3f}s / iter'.format(timer.average_time))

            if it % snapshot_iters == 0:
                self.state = state
                self.snapshot()

            if eval_iters and it % eval_iters == 0:
                self._eval_map(state, it, writer)
                if pcount > 1:
                    # the coordinator spends unbounded host time merging
                    # parts + running the dataset evaluation + saving best
                    # params while the other processes return to training;
                    # without this alignment the fast side hits the ~30 s
                    # gloo context-init deadline at its next fresh
                    # communicator (parallel/dist.py::barrier)
                    from tf_faster_rcnn_tpu.parallel import dist
                    dist.barrier(f"eval_{it}")

        if profiling:  # loop ended inside the trace window
            jax.profiler.stop_trace()
        self.state = state
        if preempted:
            self.snapshot()
            print(f"preempted at iter {it}: snapshot written, resume with "
                  f"the same command")
        elif max_iters % snapshot_iters != 0:
            self.snapshot()
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
        ckpt.wait_for_async()  # flush in-flight async orbax saves
        if self._is_coord:
            writer.close()
            self.tb_writer.close()
            self.tb_writer_val.close()
        if hasattr(self.data_layer, "close"):
            self.data_layer.close()
        return state


def get_training_roidb(imdb):
    """Flip-augment + enrich (reference train_val.py:324-335)."""
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    if cfg.TRAIN.USE_FLIPPED:
        print('Appending horizontally-flipped training examples...')
        imdb.append_flipped_images()
        print('done')
    print('Preparing training data...')
    prepare_roidb(imdb)
    print('done')
    return imdb.roidb


def train_net(network_name, imdb, roidb, valroidb, output_dir, tb_dir,
              pretrained_model=None, max_iters=40000, mesh=None,
              valimdb=None):
    """Train a Faster R-CNN network (reference train_val.py:363-378).
    ``valimdb`` enables in-training validation mAP (TPU.EVAL_ITERS)."""
    roidb = filter_roidb(roidb)
    valroidb = filter_roidb(valroidb)
    sw = SolverWrapper(network_name, imdb, roidb, valroidb, output_dir,
                       tb_dir, pretrained_model=pretrained_model, mesh=mesh,
                       valimdb=valimdb)
    print('Solving...')
    state = sw.train_model(max_iters)
    print('done solving')
    return state
