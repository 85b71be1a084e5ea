#!/usr/bin/env python
"""Relayout MCG proposal files into the hierarchy the rpn_roidb external-
proposal path expects.

Vestigial external-proposal-era tool kept for surface parity with the
reference (/root/reference/lib/datasets/tools/mcg_munge.py — Python 2 only
there; working Python 3 here). MCG .mat proposal files are copied from a
flat directory into data/MCG/mat/<first-4>/<first-8>/<name>.mat so
box-list loaders can address them by image id.
"""

import os
import shutil
import sys


def munge(src_dir):
    """box proposals before this script:
      src_dir/MCG-COCO-val2014-boxes/COCO_val2014_000000193401.mat
    after munging:
      src_dir/MCG/mat/COCO/COCO_val2/.../COCO_val2014_000000193401.mat
    """
    files = os.listdir(src_dir)
    for fn in files:
        base, ext = os.path.splitext(fn)
        if ext != '.mat':
            continue
        first = base[:14]
        second = base[:22]
        dst_dir = os.path.join('MCG', 'mat', first, second)
        os.makedirs(dst_dir, exist_ok=True)
        src = os.path.join(src_dir, fn)
        dst = os.path.join(dst_dir, fn)
        print('MV: {} -> {}'.format(src, dst))
        shutil.move(src, dst)


if __name__ == '__main__':
    if len(sys.argv) != 2:
        print('usage: mcg_munge.py /path/to/proposal/folder')
        sys.exit(1)
    munge(sys.argv[1])
