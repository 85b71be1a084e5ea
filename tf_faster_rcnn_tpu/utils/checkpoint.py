"""Snapshot/resume.

The reference snapshots two files per checkpoint (train_val.py:45-103): the
TF weights and a pickle of (numpy RNG state, data cursors/permutations, iter
counter) — and notes that the TF-side RNG is NOT restored (:86-88). Here a
snapshot is a single msgpack of the full TrainState (params, optimizer
state, step, *and* the jax PRNG key — closing that reference gap) plus a
pickle sidecar of the host data-iterator state. Retention keeps the last
SNAPSHOT_KEPT (:221-240); resume picks the newest by step (find_previous,
:155-175).

Backends: 'msgpack' (default — one flat file, ideal at this model scale)
or 'orbax' (cfg.TPU.CHECKPOINT_BACKEND) — an orbax PyTree directory per
snapshot, for sharded/async-friendly checkpoints of much larger runs. Both
formats are discovered by find_previous and restored transparently.
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Optional, Tuple

import numpy as np
from flax import serialization

__all__ = ["snapshot", "restore", "find_previous", "remove_old_snapshots",
           "save_params", "load_params"]


def _backend():
    from tf_faster_rcnn_tpu.config import cfg
    return str(cfg.TPU.CHECKPOINT_BACKEND)


def _state_path(output_dir, prefix, step, backend=None):
    ext = "orbax" if (backend or _backend()) == "orbax" else "msgpack"
    return os.path.join(output_dir, f"{prefix}_iter_{step}.{ext}")


def _meta_path(output_dir, prefix, step):
    return os.path.join(output_dir, f"{prefix}_iter_{step}.pkl")


_ASYNC_CKPTR = None


def _async_checkpointer():
    """Process-wide orbax checkpointer reused across async saves (each save
    waits for the previous one internally, so ordering is preserved)."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    return _ASYNC_CKPTR


def wait_for_async():
    """Block until every in-flight async orbax save is durable on disk.
    No-op when async checkpointing was never used."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def snapshot(output_dir, prefix, state, data_state: dict,
             extra_meta: Optional[dict] = None) -> Tuple[str, str]:
    """Write a (state msgpack, host-meta pickle) snapshot pair."""
    os.makedirs(output_dir, exist_ok=True)
    step = int(state.step)
    sp = _state_path(output_dir, prefix, step)
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step, "key": state.key}
    if sp.endswith(".orbax"):
        from tf_faster_rcnn_tpu.config import cfg
        if bool(cfg.TPU.ASYNC_CHECKPOINT):
            # returns once device arrays are copied out; disk commit runs in
            # the background (a following save waits for the previous one)
            _async_checkpointer().save(os.path.abspath(sp), tree, force=True)
        else:
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(sp), tree, force=True)
            ckptr.wait_until_finished()
            ckptr.close()
    else:
        with open(sp, "wb") as f:
            f.write(serialization.to_bytes(tree))
    mp = _meta_path(output_dir, prefix, step)
    meta = {"data_state": data_state, "np_rng_state": np.random.get_state(),
            "step": step}
    if extra_meta:
        meta.update(extra_meta)
    with open(mp, "wb") as f:
        pickle.dump(meta, f, pickle.HIGHEST_PROTOCOL)
    print(f"Wrote snapshot to: {sp}")
    return sp, mp


def restore(state, path: str):
    """Restore a TrainState from a snapshot (structure-checked). The format
    is detected from the path, independent of the configured backend."""
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": state.step, "key": state.key}
    if path.endswith(".orbax"):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        loaded = ckptr.restore(os.path.abspath(path), target=target)
        ckptr.close()
    else:
        with open(path, "rb") as f:
            loaded = serialization.from_bytes(target, f.read())
    return state.replace(params=loaded["params"],
                         opt_state=loaded["opt_state"],
                         step=loaded["step"], key=loaded["key"])


def restore_meta(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def find_previous(output_dir, prefix):
    """Newest snapshot pair (by step). Returns (step, state_path, meta_path)
    or None.

    The reference skips snapshots sitting exactly on an LR boundary
    (train_val.py:160-164) because its stateful LR assign could resume with
    the wrong rate there. Here the LR is a pure function of the step counter
    (engine/train.py lr_schedule), so boundary snapshots are fully valid and
    are NOT skipped — skipping would silently retrain up to SNAPSHOT_ITERS
    iterations (or restart entirely when the boundary snapshot is the only
    one)."""
    entries = {}
    for ext in ("msgpack", "orbax"):
        for p in glob.glob(os.path.join(output_dir,
                                        f"{prefix}_iter_*.{ext}")):
            m = re.search(r"_iter_(\d+)\.(msgpack|orbax)$", p)
            if m:
                entries[int(m.group(1))] = p
    if not entries:
        return None
    s = max(entries)
    return s, entries[s], _meta_path(output_dir, prefix, s)


def remove_old_snapshots(output_dir, prefix, keep: int):
    entries = []
    for ext in ("msgpack", "orbax"):
        for p in glob.glob(os.path.join(output_dir,
                                        f"{prefix}_iter_*.{ext}")):
            m = re.search(r"_iter_(\d+)\.(msgpack|orbax)$", p)
            if m:
                entries.append((int(m.group(1)), p))
    entries.sort()
    for step, p in entries[:-keep] if keep > 0 else []:
        for path in (p, _meta_path(output_dir, prefix, step)):
            if os.path.isdir(path):
                import shutil
                shutil.rmtree(path)
            elif os.path.exists(path):
                os.remove(path)


def save_params(path, params):
    """Standalone parameter export (for demo/test_net consumption)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path, params_template):
    """Load model params from either a bare save_params export or a full
    training snapshot (which wraps them as {params, opt_state, step, key})."""
    if path.endswith(".orbax"):
        import orbax.checkpoint as ocp
        ckptr = ocp.PyTreeCheckpointer()
        raw = ckptr.restore(os.path.abspath(path))
        ckptr.close()
    else:
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and {"params", "opt_state", "step"} <= set(raw):
        raw = raw["params"]
    return serialization.from_state_dict(params_template, raw)
