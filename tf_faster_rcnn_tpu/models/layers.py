"""Shared building blocks for the backbones.

Reproduces the two slim layer behaviors the reference depends on for
weight-parity:

* ``conv_same``: slim's resnet_utils.conv2d_same — for stride > 1, explicit
  symmetric-ish padding (total = kernel-1, beg = total//2) followed by a
  VALID conv, so padding is input-size-independent (the reference calls this
  out at lib/nets/resnet_v1.py:78-79). For stride 1 it is a plain SAME conv.
* ``FrozenBatchNorm``: the reference trains every BN layer frozen
  (is_training=False, trainable=False — resnet_v1.py:26-33,
  mobilenet_v1.py:177-184), i.e. BN is an affine transform using the
  pretrained moving statistics. Mean/var live in params alongside
  scale/bias; nothing is ever updated in-place (optimizer masks exclude all
  BN params), which keeps the train step a pure function.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ConvSame", "FrozenBatchNorm", "max_pool_same", "normal_init",
           "stem_init", "mask_valid", "shrink_valid"]


def normal_init(stddev: float, truncated: bool = False):
    if truncated:
        return nn.initializers.truncated_normal(stddev=stddev)
    return nn.initializers.normal(stddev=stddev)


def stem_init(pixel_std: float = 128.0):
    """He init rescaled for raw-pixel inputs — FROM-SCRATCH stems only.

    The input convention (reference lib/utils/blob.py:33-47) is
    mean-subtracted BGR pixels, magnitude O(100). A pretrained slim stem
    absorbs that scale — its first BN's moving variance is O(pixel^2)
    (resnet), or the import surgery folds a 2/255 factor into conv1
    (mobilenet_v1.py:266-278) — but a FROM-SCRATCH net under frozen
    identity-BN does not: plain He init propagates O(100) activations
    through every (positively-homogeneous) layer, the 0.01-std RPN/head
    initializers then emit logits/deltas of magnitude ~50-100, exp() in the
    box decode sits at the f32 overflow boundary, and head-weight updates
    are ~20x the weights' own scale per step — the res101 COCO-rehearsal
    NaN at iter 4 (experiments/logs/...rehearsal.2026-08-20_04-14-53.log).

    Dividing the FIRST conv's init by pixel_std starts the whole net in the
    O(1) activation regime a pretrained checkpoint would produce. Loading
    any checkpoint overwrites the init, so fine-tuning parity is untouched.
    """
    return nn.initializers.variance_scaling(
        2.0 / (pixel_std * pixel_std), "fan_in", "truncated_normal")


def same_padding(kernel: int, stride: int):
    """slim conv2d_same padding: input-size-independent explicit padding for
    stride > 1, plain SAME for stride 1."""
    if stride == 1:
        return "SAME"
    total = kernel - 1
    return [(total // 2, total - total // 2)] * 2


def ConvSame(features: int, kernel: int = 3, stride: int = 1,
             use_bias: bool = True, dtype=None,
             kernel_init: Callable = nn.initializers.variance_scaling(
                 2.0, "fan_in", "truncated_normal"),
             feature_group_count: int = 1, name: Optional[str] = None):
    """nn.Conv with slim conv2d_same padding semantics (NHWC, HWIO)."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=same_padding(kernel, stride),
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=kernel_init,
        feature_group_count=feature_group_count,
        name=name)


class FrozenBatchNorm(nn.Module):
    """Inference-mode batch norm with all statistics/affine params frozen.

    y = scale * (x - mean) / sqrt(var + eps) + bias. The four arrays sit in
    the params collection (so checkpoint converters can fill them from slim
    moving averages) and are excluded from every optimizer mask.
    """
    epsilon: float = 1e-5
    use_scale: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        else:
            scale = jnp.ones((c,), jnp.float32)
        # fold into a single multiply-add. The [C]-sized fold stays in f32;
        # the per-element affine runs in x's own dtype — upcasting the
        # activations to f32 here doubled the HBM bytes of every BN-adjacent
        # fusion under bf16 compute (measured ~80%-of-peak-bandwidth f32
        # [8000,7,7,2048] intermediates in the res101 RoI tail) for a
        # rounding difference far below bf16's own quantization.
        inv = scale / jnp.sqrt(var + self.epsilon)
        shift = bias - mean * inv
        y = x * inv.astype(x.dtype) + shift.astype(x.dtype)
        return y.astype(self.dtype or x.dtype)


def max_pool_same(x, window: int, stride: int):
    """slim max_pool2d(padding='SAME')."""
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding="SAME")


def mask_valid(x, valid_hw):
    """Zero every activation at cells beyond the per-image valid extent.

    x: [B, H, W, C] on a padded canvas; valid_hw: [B, 2] float cell counts
    at x's resolution. Returns x with cells (y >= vh or x >= vw) zeroed.

    This is the load-bearing trick behind exact static-canvas semantics:
    the reference computes each conv on the image's own (dynamic) extent,
    so its SAME/explicit padding supplies zeros AT THE IMAGE EDGE. On a
    padded canvas, content instead bleeds outward through every stacked
    conv (one cell per 3x3) and flows back into the valid region, making
    activations depend on how much margin the canvas has. Re-zeroing the
    margin after each layer restores the reference's boundary condition
    exactly, so the network output is bit-identical for ANY canvas that
    fits the image — which is what makes orientation-bucketed batching
    safe. The select fuses into the preceding elementwise op (BN/ReLU).

    Masking is only REQUIRED where margin garbage could cross into the
    valid region: before every spatially-mixing op (3x3 conv, pooling) and
    once on the map handed to the RPN/crop consumers. 1x1 convs, BN and
    residual adds keep garbage in the margin, so intermediate maps may
    legally carry unmasked margins — which is also why this is a select
    rather than a multiply: margins that grow through many unmasked units
    may overflow in low precision, and 0 * inf would inject NaN.
    """
    b, h, w, _ = x.shape
    my = jnp.arange(h, dtype=jnp.float32)[None, :] < valid_hw[:, :1]
    mx = jnp.arange(w, dtype=jnp.float32)[None, :] < valid_hw[:, 1:]
    m = my[:, :, None, None] & mx[:, None, :, None]
    return jnp.where(m, x, jnp.zeros((), x.dtype))


def shrink_valid(valid_hw, stride: int):
    """Valid extent after a stride-s SAME conv/pool: ceil(v / s) (the TF
    output-shape rule; ceil composes, so chained strides give ceil(v/16))."""
    if stride == 1:
        return valid_hw
    return jnp.ceil(valid_hw / float(stride))
