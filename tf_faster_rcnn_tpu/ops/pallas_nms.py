"""Pallas TPU kernel for exact greedy NMS over score-sorted boxes.

On-device replacement for the reference's CUDA NMS (/root/reference/lib/nms/
nms_kernel.cu:34-144). Same algorithmic shape — row blocks compute
suppression masks against all later boxes — but TPU-native:

* everything stays in VMEM; the CUDA version round-trips the bitmask matrix
  to the host for the greedy scan (:91-144), we keep the scan on-core;
* the O(N^2) IoU work is [BLOCK x TILE] VPU tiles; only the in-block greedy
  refinement is sequential (inherent to greedy NMS — the CUDA kernel's host
  scan is the same O(N) chain);
* an early-exit the CUDA kernel lacks: once ``max_keep`` survivors are
  finalized, remaining blocks are skipped. Callers only consume the first
  ``max_keep`` survivors (RPN takes post_nms_top_n), so the tail's keep bits
  are irrelevant. The survivor count is a loop-carried scalar VALUE gating a
  lax.cond — polling an SMEM ref per block instead costs ~0.7 ms/block in
  pipeline stalls (measured 34 ms vs 0.14 ms for 6k boxes on v5e).

Masks are float32 0/1 (int ops are second-class on the VPU); in/out keep
vectors are [1, N] so the lane dimension is the long one. Measured on one
v5e core: 6000 boxes full pass ~0.27 ms, with early exit ~0.14 ms — vs
~30 ms for the same exact-greedy computation as jnp ops under XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_nms_keep_mask", "pallas_batched_nms_keep"]

BLOCK = 128
COL_TILE = 2048


def _iou_tile(rows, cols, plus_one: bool):
    """IoU between row boxes ([B,1] coord tuples) and col boxes ([1,T])."""
    (rx1, ry1, rx2, ry2), (cx1, cy1, cx2, cy2) = rows, cols
    e = 1.0 if plus_one else 0.0
    iw = jnp.maximum(jnp.minimum(rx2, cx2) - jnp.maximum(rx1, cx1) + e, 0.0)
    ih = jnp.maximum(jnp.minimum(ry2, cy2) - jnp.maximum(ry1, cy1) + e, 0.0)
    inter = iw * ih
    ra = (rx2 - rx1 + e) * (ry2 - ry1 + e)
    ca = (cx2 - cx1 + e) * (cy2 - cy1 + e)
    union = ra + ca - inter
    return jnp.where(union > 0.0, inter / jnp.where(union > 0.0, union, 1.0),
                     0.0)


def _nms_kernel(boxes_ref, valid_ref, keep_ref, iou_scratch, *,
                n: int, thresh: float, plus_one: bool, suppress_eq: bool,
                max_keep: int):
    """boxes_ref: [4, N] (x1;y1;x2;y2 rows), valid_ref/keep_ref: [1, N].

    iou_scratch [BLOCK, BLOCK] stages the in-block IoU matrix so the
    sequential greedy refinement can read row i by dynamic (sublane) ref
    indexing — Mosaic has no dynamic_slice on values, and lane-dimension
    dynamic indexing must be 128-aligned (hence the masked-max read of
    ``alive`` at lane i).
    """
    num_blocks = n // BLOCK
    num_tiles = n // COL_TILE

    keep_ref[:, :] = valid_ref[:, :]

    def over(iou):
        return (iou >= thresh) if suppress_eq else (iou > thresh)

    def coords(start, size):
        return (boxes_ref[0:1, pl.ds(start, size)],
                boxes_ref[1:2, pl.ds(start, size)],
                boxes_ref[2:3, pl.ds(start, size)],
                boxes_ref[3:4, pl.ds(start, size)])

    col_ids_b = lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
    col_ids_t = lax.broadcasted_iota(jnp.int32, (1, COL_TILE), 1)
    # static [BLOCK, BLOCK] helpers for the fixpoint refinement
    row_ids_m = lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    col_ids_m = lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    eye_m = (row_ids_m == col_ids_m).astype(jnp.float32)
    upper_m = (col_ids_m > row_ids_m).astype(jnp.float32)

    def process(b, count):
        s = pl.multiple_of(b * BLOCK, BLOCK)
        row_c = tuple(jnp.reshape(c, (BLOCK, 1)) for c in coords(s, BLOCK))
        # strictly-upper suppression adjacency L (0/1): L[i, j] = 1 iff an
        # alive box i would suppress the later box j
        iou_scratch[:, :] = (
            over(_iou_tile(row_c, coords(s, BLOCK), plus_one)).astype(
                jnp.float32) * upper_m)

        # In-block greedy refinement as a fixpoint: the greedy keep vector
        # is the UNIQUE fixed point of  a = v & ~(L^T a)  (first differing
        # index of two fixed points yields a contradiction), and iterating
        # settles every box whose suppression-chain depth is <= the
        # iteration count, so the loop terminates in chain-depth steps
        # (typically 3-6, bound BLOCK). Each step is a few whole-[B,B] VPU
        # ops — vs BLOCK sequential [1,B] steps for the scan form, whose
        # per-step op-issue latency dominated (unrolling measured <3%).
        L = iou_scratch[:, :]
        v = keep_ref[0:1, pl.ds(s, BLOCK)]

        def fix_cond(carry):
            _, changed = carry
            return changed > 0.0

        def fix_body(carry):
            a, _ = carry
            # lanes -> sublanes without a transpose: eye-masked lane reduce
            a_rows = jnp.max(eye_m * a, axis=1, keepdims=True)   # [B, 1]
            sup = jnp.max(L * a_rows, axis=0, keepdims=True)     # [1, B]
            a_new = v * (1.0 - sup)
            changed = jnp.sum(jnp.abs(a_new - a))
            return a_new, changed

        alive, _ = lax.while_loop(fix_cond, fix_body, (v, jnp.float32(1.0)))
        keep_ref[0:1, pl.ds(s, BLOCK)] = alive
        alive_rows = jnp.reshape(alive, (BLOCK, 1))

        def tile_body(tj, _):
            ts = tj * COL_TILE
            # only tiles containing columns past this block matter
            @pl.when(ts + COL_TILE > s + BLOCK)
            def _():
                iou = _iou_tile(row_c, coords(ts, COL_TILE), plus_one)
                sup = jnp.max(jnp.where(over(iou), alive_rows, 0.0), axis=0,
                              keepdims=True)                   # [1, T]
                later = (col_ids_t + ts) >= (s + BLOCK)
                sup = sup * later.astype(jnp.float32)
                keep_ref[0:1, pl.ds(ts, COL_TILE)] = (
                    keep_ref[0:1, pl.ds(ts, COL_TILE)] * (1.0 - sup))
            return 0

        lax.fori_loop(0, num_tiles, tile_body, 0)
        return count + jnp.sum(alive).astype(jnp.int32)

    def block_body(b, count):
        return lax.cond(count < max_keep, lambda: process(b, count),
                        lambda: count)

    lax.fori_loop(0, num_blocks, block_body, jnp.int32(0))


def _batched_nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref,
                        alive, *, n: int, thresh: float, plus_one: bool,
                        suppress_eq: bool):
    """Many small NMS problems in one launch: instances live in LANES,
    boxes in SUBLANES ([N, G] layout), so the inherently sequential greedy
    scan runs once over N steps while every step's suppression is a single
    [N, G] VPU op vectorized across all G instances AND all later boxes.

    Used for the per-class detection NMS (batch x classes instances of ~300
    boxes): vmapping the single-instance kernel serializes into per-instance
    launches (~57 ms for 160 instances); this formulation does the same
    exact-greedy work in one pass.
    """
    e = 1.0 if plus_one else 0.0
    alive[:, :] = valid_ref[:, :]
    g = alive.shape[1]
    row_ids = lax.broadcasted_iota(jnp.int32, (n, g), 0)
    X1, Y1, X2, Y2 = x1_ref[:, :], y1_ref[:, :], x2_ref[:, :], y2_ref[:, :]
    AREA = (X2 - X1 + e) * (Y2 - Y1 + e)

    def over(iou):
        return (iou >= thresh) if suppress_eq else (iou > thresh)

    def refine(i, _):
        rx1 = x1_ref[pl.ds(i, 1), :]          # [1, G]
        ry1 = y1_ref[pl.ds(i, 1), :]
        rx2 = x2_ref[pl.ds(i, 1), :]
        ry2 = y2_ref[pl.ds(i, 1), :]
        iw = jnp.maximum(jnp.minimum(X2, rx2) - jnp.maximum(X1, rx1) + e, 0.0)
        ih = jnp.maximum(jnp.minimum(Y2, ry2) - jnp.maximum(Y1, ry1) + e, 0.0)
        inter = iw * ih
        r_area = (rx2 - rx1 + e) * (ry2 - ry1 + e)
        union = AREA + r_area - inter
        iou = jnp.where(union > 0.0, inter / jnp.where(union > 0.0, union,
                                                       1.0), 0.0)
        a_i = alive[pl.ds(i, 1), :]           # [1, G]
        sup = over(iou) & (row_ids > i) & (a_i > 0.0)
        alive[:, :] = alive[:, :] * (1.0 - sup.astype(jnp.float32))
        return 0

    lax.fori_loop(0, n, refine, 0)
    keep_ref[:, :] = alive[:, :]


@functools.partial(jax.jit, static_argnames=(
    "thresh", "plus_one", "suppress_eq", "interpret"))
def pallas_batched_nms_keep(boxes, valid, thresh, *, plus_one=False,
                            suppress_eq=False, interpret=None):
    """Exact greedy NMS over G independent score-sorted instances.

    boxes: [G, N, 4] f32 (each instance sorted by descending score);
    valid: [G, N] bool. Returns keep [G, N] bool with the same semantics as
    nms_keep_mask applied per instance.
    """
    g0, n0 = valid.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = -(-n0 // 8) * 8            # f32 sublane multiple
    # instances are independent, so the lane dimension tiles freely: one
    # native lane width per grid step keeps the 7 [N, GTILE] f32 buffers
    # (5 in + out + scratch) far under the 16 MB scoped-VMEM limit at any
    # realistic N (COCO batch 8 x 80 classes x 1000 boxes OOMs untiled)
    gtile = 128
    g = -(-g0 // gtile) * gtile
    b = jnp.pad(boxes.astype(jnp.float32), ((0, g - g0), (0, n - n0), (0, 0)))
    coords = jnp.transpose(b, (2, 1, 0))          # [4, N, G]
    valid_f = jnp.pad(valid.astype(jnp.float32),
                      ((0, g - g0), (0, n - n0))).T  # [N, G]

    kernel = functools.partial(
        _batched_nms_kernel, n=n, thresh=float(thresh), plus_one=plus_one,
        suppress_eq=suppress_eq)
    spec = pl.BlockSpec((n, gtile), lambda i: (0, i))
    keep = pl.pallas_call(
        kernel,
        grid=(g // gtile,),
        out_shape=jax.ShapeDtypeStruct((n, g), jnp.float32),
        in_specs=[spec] * 5,
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((n, gtile), jnp.float32)],
        interpret=interpret,
    )(coords[0], coords[1], coords[2], coords[3], valid_f)
    return keep.T[:g0, :n0] > 0.0


@functools.partial(jax.jit, static_argnames=(
    "thresh", "plus_one", "suppress_eq", "max_keep", "interpret"))
def pallas_nms_keep_mask(boxes, valid, thresh, *, plus_one=False,
                         suppress_eq=False, max_keep=None, interpret=None):
    """Greedy-NMS keep mask for boxes sorted by descending score.

    boxes: [N, 4] f32 (N padded to a multiple of COL_TILE by this wrapper);
    valid: [N] bool. Returns keep [N] bool with the same semantics as
    ops.nms.nms_keep_mask. ``max_keep`` enables early exit: only the first
    max_keep survivors (in order) are guaranteed finalized, later keep bits
    may be stale — callers that take the top max_keep survivors are
    unaffected.
    """
    n0 = boxes.shape[0]
    n = -(-n0 // COL_TILE) * COL_TILE
    if max_keep is None:
        max_keep = n
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pad = n - n0
    boxes_t = jnp.pad(boxes.astype(jnp.float32), ((0, pad), (0, 0))).T
    valid_f = jnp.pad(valid.astype(jnp.float32), (0, pad)).reshape(1, n)

    kernel = functools.partial(
        _nms_kernel, n=n, thresh=float(thresh), plus_one=plus_one,
        suppress_eq=suppress_eq, max_keep=int(max_keep))
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BLOCK, BLOCK), jnp.float32)],
        interpret=interpret,
    )(boxes_t, valid_f)
    return (keep[0, :n0] > 0.0)
