"""Metrics writer: the TensorBoard-equivalent observability channel.

The reference writes TF summaries (losses, histograms, a GT-image render)
to train/val FileWriter dirs (network.py:437-450, train_val.py:148-151).
Here scalars stream to JSONL files per run (one line per write: step,
wall-time, prefix, values) — greppable, plottable, and dependency-free. If
tensorboardX/tensorflow is available it could be layered on, but JSONL is
the source of truth.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsWriter(object):
    def __init__(self, out_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, filename)
        self._f = open(self.path, "a", buffering=1)

    def write(self, step: int, values: Dict[str, float], prefix: str = ""):
        rec = {"step": int(step), "time": time.time(), "prefix": prefix}
        rec.update({k: float(v) for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()
