"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding tests run on virtual CPU devices per the environment's
testing recipe (no multi-chip TPU hardware is available); the real-TPU path
is exercised by bench.py and the driver's compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's axon sitecustomize registers the TPU plugin and pins
# jax_platforms before env vars are read; override it back to CPU here.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA CPU compiles of the full detector take
# minutes per shape on this class of host; identical programs recur across
# tests, subprocess workers (test_multihost.py), and suite re-runs. Keyed
# on the optimized HLO, so code changes invalidate exactly the programs
# they touch.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tf_frcnn_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_cfg():
    """Every test sees pristine defaults; tests mutate cfg freely."""
    from tf_faster_rcnn_tpu.config import reset_cfg
    reset_cfg()
    yield
    reset_cfg()


@pytest.fixture
def rng():
    return np.random.RandomState(3)
