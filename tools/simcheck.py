#!/usr/bin/env python
"""Normalized line-similarity between our files and reference files.

Strips comments/docstrings/blank lines, collapses whitespace, then reports
difflib ratio plus the fraction of our meaningful lines that also appear in
the reference file. Used to keep host-side modules genuinely re-derived
(<40% per the round-1 review) rather than transcribed.
"""

import difflib
import io
import re
import sys
import tokenize


def normalized_lines(path):
    with open(path, 'rb') as f:
        src = f.read().decode('utf-8', errors='replace')
    # strip comments and docstrings via tokenize
    out = []
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    except Exception:
        toks = []
    drop_spans = []
    prev_significant = None
    for tok in toks:
        if tok.type == tokenize.COMMENT:
            drop_spans.append((tok.start, tok.end))
        elif tok.type == tokenize.STRING:
            # docstring: a string statement (previous significant token is
            # NEWLINE/INDENT/DEDENT or None)
            if prev_significant in (None, tokenize.NEWLINE, tokenize.INDENT,
                                    tokenize.DEDENT):
                drop_spans.append((tok.start, tok.end))
        if tok.type not in (tokenize.NL, tokenize.COMMENT):
            prev_significant = tok.type
    lines = src.split('\n')
    for (r0, c0), (r1, c1) in drop_spans:
        if r0 == r1:
            lines[r0 - 1] = lines[r0 - 1][:c0] + lines[r0 - 1][c1:]
        else:
            lines[r0 - 1] = lines[r0 - 1][:c0]
            for r in range(r0, r1 - 1):
                lines[r] = ''
            lines[r1 - 1] = lines[r1 - 1][c1:]
    norm = []
    for ln in lines:
        ln = re.sub(r'\s+', ' ', ln).strip()
        if ln and ln not in ('"""', "'''"):
            norm.append(ln)
    return norm


def similarity(ours, ref):
    a, b = normalized_lines(ours), normalized_lines(ref)
    if not a:
        return 0.0, 0.0, 0
    ratio = difflib.SequenceMatcher(a=a, b=b).ratio()
    bset = set(b)
    shared = sum(1 for ln in a if ln in bset)
    return ratio, shared / len(a), len(a)


if __name__ == '__main__':
    pairs = sys.argv[1:]
    if not pairs:
        pairs = [
            'tf_faster_rcnn_tpu/datasets/imdb.py:/root/reference/lib/datasets/imdb.py',
            'tf_faster_rcnn_tpu/datasets/pascal_voc.py:/root/reference/lib/datasets/pascal_voc.py',
            'tf_faster_rcnn_tpu/datasets/coco.py:/root/reference/lib/datasets/coco.py',
            'tf_faster_rcnn_tpu/datasets/voc_eval.py:/root/reference/lib/datasets/voc_eval.py',
            'tf_faster_rcnn_tpu/datasets/ds_utils.py:/root/reference/lib/datasets/ds_utils.py',
        ]
    for pair in pairs:
        ours, ref = pair.split(':')
        ratio, overlap, n = similarity(ours, ref)
        print(f'{ours}: seq={ratio:.0%} shared-lines={overlap:.0%} ({n} lines)')
