"""Multi-host (multi-process) initialization and helpers.

The reference is strictly single-process/single-GPU (SURVEY.md 2.3). The
TPU-native scale-out path runs the same single-program DP train step over a
global mesh spanning hosts: `jax.distributed.initialize` brings up the
coordination service (the TPU-native equivalent of an NCCL/MPI bootstrap —
collectives themselves ride ICI/DCN via XLA), `jax.devices()` then returns
the global device list, and each host feeds only its local slice of the
global batch (data/loader.py process slicing +
`jax.make_array_from_process_local_data`).

On CPU (tests, this environment) cross-process collectives use the gloo
backend; on real TPU pods the backend is the platform's ICI/DCN stack and
coordinator/process topology usually comes from the TPU metadata
environment, in which case `initialize()` with no arguments is correct.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize", "is_initialized", "process_index", "process_count",
           "local_slice", "on_coordinator", "barrier"]

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_collectives: Optional[str] = None) -> None:
    """Bring up jax.distributed for a multi-process run.

    Arguments fall back to the FRCNN_COORDINATOR / FRCNN_NUM_PROCS /
    FRCNN_PROC_ID environment variables (set by the experiment driver
    scripts), then to JAX's own auto-detection (TPU pod metadata). A no-op
    for explicit single-process runs (num_processes in (None via env, 1)).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "FRCNN_COORDINATOR")
    if num_processes is None and "FRCNN_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["FRCNN_NUM_PROCS"])
    if process_id is None and "FRCNN_PROC_ID" in os.environ:
        process_id = int(os.environ["FRCNN_PROC_ID"])
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and num_processes is None:
        # nothing requested and no pod metadata handling needed here
        return
    # NB: must not touch the backend (jax.devices/default_backend) before
    # jax.distributed.initialize — inspect the config value only
    platforms = jax.config.jax_platforms or ""
    if cpu_collectives is None and "cpu" in platforms:
        cpu_collectives = "gloo"
    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation",
                          cpu_collectives)
        if cpu_collectives == "gloo" and \
                jax.config.jax_compilation_cache_dir:
            # XLA:CPU AOT results deserialized from the persistent cache
            # embed gloo collective-context uids; a cache hit on one
            # process vs a fresh compile on another desyncs the context
            # numbering and every later communicator init deadlocks
            # ("Gloo context initialization failed", reproduced in
            # tests/test_multihost.py on this host). TPU backends don't
            # have this hazard; disable the cache only for gloo runs.
            print("[dist] persistent compilation cache disabled for "
                  "gloo CPU collectives")
            jax.config.update("jax_compilation_cache_dir", None)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = True


def is_initialized() -> bool:
    return _INITIALIZED


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def on_coordinator() -> bool:
    """True on the process that owns host-side side effects (snapshots,
    metrics, TensorBoard events)."""
    return jax.process_index() == 0


def barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Align all processes via the COORDINATION SERVICE (gRPC), not a
    device collective.

    Needed wherever one process does long host-only work (the coordinator's
    eval merge + dataset evaluation, summary writers) while the others run
    ahead into collective-bearing code: creating a fresh gloo/ICI
    communicator has a hard ~30 s init deadline
    (GlooCollectives GetKeyValue), so unbounded process skew turns into
    'Gloo context initialization failed: DEADLINE_EXCEEDED' on whichever
    side reaches a new context first (reproduced by
    tests/test_multihost.py's in-training eval on a 1-CPU host). This
    barrier has a configurable long timeout and touches no device state.
    No-op in single-process runs.
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed
    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=int(timeout_ms))


def local_slice(global_batch: int) -> slice:
    """This process's contiguous slice of the global batch."""
    n, p = process_count(), process_index()
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} processes")
    per = global_batch // n
    return slice(p * per, (p + 1) * per)
