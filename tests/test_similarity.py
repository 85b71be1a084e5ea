"""Guard: no source file is a transcription of the reference.

Round-1 review found the dataset/eval layer had been ported with renames
(normalized line similarity 56-72% against /root/reference). Everything
has since been re-derived in this framework's own idiom; this test pins
that state so a future edit can't quietly drift back toward the reference
text. Skips when the reference tree isn't mounted.
"""

import difflib
import glob
import os
import re

import pytest

REFERENCE = "/root/reference"
REPO = os.path.join(os.path.dirname(__file__), "..")

# Worst acceptable normalized similarity per file. No exceptions left:
# mcg_munge (the last one, a protocol shim once at 0.60) was re-derived as
# a pathlib prefix-tree walk in round 5 and now measures 0.06.
DEFAULT_MAX = 0.50
PER_FILE_MAX = {}


def _norm(path):
    lines = []
    with open(path, errors="ignore") as f:
        for line in f:
            line = re.sub(r"#.*", "", line).strip()
            if line:
                lines.append(re.sub(r"\s+", " ", line))
    return lines


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not mounted")
def test_no_source_file_transcribes_the_reference():
    refs = []
    for pat in ("**/*.py", "**/*.pyx", "**/*.sh"):
        for p in glob.glob(os.path.join(REFERENCE, pat), recursive=True):
            n = _norm(p)
            if len(n) >= 10:
                refs.append((p, n))

    offenders = []
    for pat in ("tf_faster_rcnn_tpu/**/*.py", "tools/*.py",
                "experiments/**/*.sh", "data/**/*.sh", "*.py"):
        for p in glob.glob(os.path.join(REPO, pat), recursive=True):
            if "/native/build/" in p:
                continue
            a = _norm(p)
            if len(a) < 10:
                continue
            rel = os.path.relpath(p, REPO)
            cap = PER_FILE_MAX.get(rel, DEFAULT_MAX)
            best, best_ref = 0.0, None
            for rp, b in refs:
                if not 0.3 < len(a) / max(len(b), 1) < 3.5:
                    continue
                r = difflib.SequenceMatcher(None, a, b).ratio()
                if r > best:
                    best, best_ref = r, rp
            if best > cap:
                offenders.append((rel, best, best_ref))

    assert not offenders, (
        "files too similar to the reference (re-derive, don't transcribe): "
        + "; ".join(f"{rel} {sim:.0%} vs {ref}"
                    for rel, sim, ref in offenders))
