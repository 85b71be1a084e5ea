#!/usr/bin/env python
"""Relayout MCG proposal files into the hierarchy the rpn_roidb external-
proposal path expects.

Vestigial external-proposal-era tool kept for surface parity with the
reference (/root/reference/lib/datasets/tools/mcg_munge.py — Python 2 only
there; working Python 3 here). A flat download directory of MCG .mat
proposal files becomes a two-level prefix tree under the current working
directory, so box-list loaders can address each file by image id:

    <src>/COCO_val2014_000000193401.mat
  -> ./MCG/mat/COCO_val2014_0/COCO_val2014_000000193/COCO_val2014_000000193401.mat

The bucket names are the stem's first 14 and first 22 characters (the
dataset+split prefix, then the prefix that fixes all but the last 3 id
digits), matching the layout of Hosang et al.'s precomputed proposals.
"""

import argparse
import shutil
from pathlib import Path

# (prefix lengths, destination root) of the on-disk tree the box-proposal
# loader walks; relative to CWD by design — the reference tool is run from
# the dataset's data/ directory
BUCKET_PREFIXES = (14, 22)
DEST_ROOT = Path("MCG") / "mat"


def munge(src_dir):
    """Move every *.mat under ``src_dir`` into its prefix-tree bucket."""
    for mat in sorted(Path(src_dir).glob("*.mat")):
        bucket = DEST_ROOT.joinpath(*(mat.stem[:n] for n in BUCKET_PREFIXES))
        bucket.mkdir(parents=True, exist_ok=True)
        print(f"MV: {mat} -> {bucket / mat.name}")
        shutil.move(str(mat), str(bucket / mat.name))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("src_dir", help="flat directory of downloaded .mat files")
    munge(p.parse_args(argv).src_dir)


if __name__ == "__main__":
    main()
