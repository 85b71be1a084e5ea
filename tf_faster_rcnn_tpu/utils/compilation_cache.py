"""Persistent XLA compilation cache setup.

First compiles of the res101 detect/train programs take minutes; enabling
jax's persistent cache makes every subsequent process start warm. Called by
the CLIs and bench.py; safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "tf_faster_rcnn_tpu_xla")


def enable_compilation_cache(path: str = ""):
    import jax
    path = path or os.environ.get("TFRCNN_CACHE_DIR", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is best-effort
        print(f"compilation cache disabled: {e}")
