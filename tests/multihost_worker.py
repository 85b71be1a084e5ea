"""One process of a multi-host (multi-process) DP training run.

Launched by test_multihost.py: `python multihost_worker.py <pid> <nprocs>
<coordinator_port> <out.json>`. Each process owns 4 virtual CPU devices;
jax.distributed + gloo collectives join them into one global mesh. The
worker runs two data-parallel train steps on a deterministic synthetic
batch, slicing its process-local share exactly the way the real train loop
does, and process 0 reports final loss + a parameter checksum for the test
to compare against the single-process result.

Not a pytest file (no test_ prefix) — it is the spawned program.
"""

import json
import os
import sys


def tiny_setup(b):
    """Mirror of test_multichip._tiny_setup (kept in sync by the test)."""
    import dataclasses

    import jax
    import numpy as np

    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg

    spec = dataclasses.replace(
        spec_from_cfg("vgg16", 21, "TRAIN"),
        anchor_scales=(2, 4), rpn_pre_nms_top_n=256, rpn_post_nms_top_n=32,
        roi_batch_size=16, rpn_batchsize=32)
    model = FasterRCNN(spec)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(b, 64, 64, 3).astype(np.float32),
        "im_info": np.tile(np.array([[60.0, 62.0, 1.0]], np.float32),
                           (b, 1)),
        "gt_boxes": np.tile(
            np.array([[[8, 8, 40, 44, 3], [20, 16, 56, 58, 7]]], np.float32),
            (b, 1, 1)),
        "gt_valid": np.ones((b, 2), bool),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        batch["image"][:1], batch["im_info"][:1], batch["gt_boxes"][:1],
        batch["gt_valid"][:1])
    return spec, model, params, batch


def run(global_batch=8, steps=2, local_slice=None, restore_path=None,
        snapshot_dir=None):
    """Run the DP train steps; returns (final metrics, param checksum).

    With local_slice=None the whole global batch is fed from this process
    (single-process mode); otherwise only the slice is fed and
    shard_batch's multi-process path assembles the global array.

    restore_path: restore the TrainState from this snapshot before stepping
    (cross-process-count restore: the snapshot may come from a run with a
    DIFFERENT process count). snapshot_dir: after stepping, the coordinator
    writes a snapshot there; its path is returned as the 4th element.
    """
    return Harness(global_batch).episode(steps, local_slice, restore_path,
                                         snapshot_dir)


class Harness:
    """Model + mesh + ONE step_fn, reusable across episodes.

    Every episode shares the same program shapes, so building the step_fn
    once means one XLA compile serves fresh-train, restore-continue and
    train-then-snapshot — under gloo (no persistent compile cache, see
    main()) the compile is the entire cost of a scenario, which is why the
    suite runner exists (VERDICT r4 #6: per-spawn recompiles made
    test_multihost.py a 43-minute file). The pytest parent's single-process
    references still call run() per scenario; the parent is not under gloo,
    so its persistent compile cache absorbs the retraces."""

    def __init__(self, global_batch=8):
        import jax

        from tf_faster_rcnn_tpu.engine.train import (lr_schedule,
                                                     make_train_step)
        from tf_faster_rcnn_tpu.parallel.mesh import make_mesh

        (self.spec, self.model, self.params,
         self.batch) = tiny_setup(global_batch)
        self.mesh = make_mesh()
        self.step_fn = make_train_step(
            self.model, self.spec, weight_decay=1e-4,
            mobile_weight_decay=4e-5, donate=False,
            lr_fn=lr_schedule(0.001, 0.1, [30000]))
        self.key = jax.random.PRNGKey(3)

    def episode(self, steps=2, local_slice=None, restore_path=None,
                snapshot_dir=None):
        """Fresh TrainState -> (restore?) -> steps -> (snapshot?); returns
        (final metrics, param checksum, step, snapshot path).

        With local_slice=None the whole global batch is fed from this
        process (single-process mode); otherwise only the slice is fed and
        shard_batch's multi-process path assembles the global array.
        restore_path may come from a run with a DIFFERENT process count
        (cross-process-count restore)."""
        import jax
        import numpy as np

        from tf_faster_rcnn_tpu.engine.train import create_train_state
        from tf_faster_rcnn_tpu.parallel.mesh import replicate, shard_batch
        from tf_faster_rcnn_tpu.utils import checkpoint as ckpt

        state = create_train_state(self.spec, self.params, self.key)
        if restore_path:
            state = ckpt.restore(state, restore_path)
        local = self.batch if local_slice is None else {
            k: v[local_slice] for k, v in self.batch.items()}
        with self.mesh:
            state_r = replicate(self.mesh, state)
            metrics = None
            for _ in range(steps):
                state_r, metrics = self.step_fn(
                    state_r, shard_batch(self.mesh, local))
        host_state = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), state_r,
            is_leaf=lambda x: hasattr(x, "shape"))
        snap_path = None
        if snapshot_dir and jax.process_index() == 0:
            snap_path, _ = ckpt.snapshot(snapshot_dir, "worker", host_state,
                                         data_state={})
        leaves = jax.tree_util.tree_leaves(jax.device_get(state_r.params))
        checksum = float(sum(np.abs(np.asarray(x, np.float64)).sum()
                             for x in leaves))
        return ({k: float(v) for k, v in metrics.items()}, checksum,
                int(jax.device_get(state_r.step)), snap_path)


def main():
    pid, nprocs, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    # optional 5th arg: JSON {"steps", "restore", "snapshot_dir"}
    opts = json.loads(sys.argv[5]) if len(sys.argv) > 5 else {}
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    # NO persistent compile cache here: AOT-loaded XLA:CPU executables
    # embed gloo collective-context uids, and a cache hit on one process
    # vs a fresh compile on another desyncs the context numbering -> both
    # sides stall in "Gloo context initialization failed" (reproduced on
    # this host; dist.initialize also force-disables the cache under gloo)

    from tf_faster_rcnn_tpu.parallel import dist
    dist.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    metrics, checksum, step, snap = run(
        global_batch=8, steps=int(opts.get("steps", 2)),
        local_slice=dist.local_slice(8),
        restore_path=opts.get("restore"),
        snapshot_dir=opts.get("snapshot_dir"))
    if dist.on_coordinator():
        with open(outfile, "w") as f:
            json.dump({"total_loss": metrics["total_loss"],
                       "checksum": checksum, "step": step,
                       "snapshot": snap}, f)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
