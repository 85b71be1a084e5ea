"""ResNet-v1 (50/101/152) backbone with the reference's detection layout.

Structure parity with /root/reference/lib/nets/resnet_v1.py:
* stem: conv2d_same(64, 7, /2) -> pad(1) -> 3x3/2 VALID max-pool (:80-86);
* head: blocks 1-3, with block3's stride-2 unit forced to stride 1 so conv4
  ends at stride 16 (:127-152 — slim places the block stride on the LAST
  unit of a block);
* tail: block4 (stride 1) applied to pooled RoI crops, then global spatial
  mean (:115-125);
* every BN frozen (:22-44), stem always frozen, first FIXED_BLOCKS blocks
  frozen (:88-113) — expressed via ``trainable_filter``.

Bottleneck unit = 1x1 reduce -> 3x3 (carries the unit stride, conv2d_same)
-> 1x1 expand, each +BN, relu after the residual add; identity shortcut is a
stride subsample, projection shortcut is a 1x1/stride conv+BN (slim
resnet_v1.bottleneck semantics).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tf_faster_rcnn_tpu.models.layers import (ConvSame, FrozenBatchNorm,
                                              mask_valid, shrink_valid,
                                              stem_init)

__all__ = ["ResNetV1Head", "ResNetV1Tail", "BLOCK_UNITS", "trainable_filter"]

# num_units per block for each depth (resnet_v1.py:127-152)
BLOCK_UNITS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
_BASE_DEPTHS = (64, 128, 256, 512)


class _ConvBN(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    relu: bool = True
    dtype: Optional[jnp.dtype] = None
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.variance_scaling(
                    2.0, "fan_in", "truncated_normal"))
        x = ConvSame(self.features, self.kernel, self.stride, use_bias=False,
                     kernel_init=init, dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


class Bottleneck(nn.Module):
    base_depth: int
    stride: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, valid_hw=None):
        """valid_hw: [B, 2] valid cell extents of x (padded canvas). The
        margin is re-zeroed only where it can cross into the valid region:
        before the spatial 3x3 (layers.mask_valid). The 1x1 convs, BN
        shifts and the residual add keep garbage inside the margin, so the
        unit's output margin is left dirty — the next unit's pre-3x3 mask
        (or the head's final mask) re-zeroes it."""
        depth_out = self.base_depth * 4
        depth_in = x.shape[-1]
        if depth_in == depth_out:
            # subsample: 1x1 max-pool with stride (slim resnet_utils.subsample)
            shortcut = x if self.stride == 1 else x[:, ::self.stride, ::self.stride, :]
        else:
            shortcut = _ConvBN(depth_out, 1, self.stride, relu=False,
                               dtype=self.dtype, name="shortcut")(x)
        r = _ConvBN(self.base_depth, 1, 1, dtype=self.dtype, name="conv1")(x)
        if valid_hw is not None:
            r = mask_valid(r, valid_hw)
        r = _ConvBN(self.base_depth, 3, self.stride, dtype=self.dtype,
                    name="conv2")(r)
        # zero-init the expand conv: every unit starts as identity, so a
        # FROM-SCRATCH net keeps unit activation scale (He-init residual
        # branches under frozen identity-BN otherwise double the variance at
        # every add — 2^33 by conv4 in res101 — and the bbox head's exp()
        # decode overflows on step 1). Checkpoint-initialized runs (the
        # reference's only supported mode) overwrite the init, so this is
        # from-scratch-only behavior: the frozen-BN gamma=1 cannot express
        # the standard zero-gamma trick, the conv kernel can.
        r = _ConvBN(depth_out, 1, 1, relu=False, dtype=self.dtype,
                    zero_init=True, name="conv3")(r)
        return nn.relu(shortcut + r)


class _Block(nn.Module):
    base_depth: int
    num_units: int
    stride: int  # applied on the LAST unit (slim resnet_v1_block)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, valid_hw=None):
        for u in range(self.num_units):
            s = self.stride if u == self.num_units - 1 else 1
            x = Bottleneck(self.base_depth, s, dtype=self.dtype,
                           name=f"unit_{u + 1}")(x, valid_hw)
            if valid_hw is not None:
                valid_hw = shrink_valid(valid_hw, s)
        return x


def space_to_depth_2x2(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with channel order (a, b, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def s2d_conv1_kernel(k7):
    """Exact transform of the stem kernel for the space-to-depth stem.

    conv2d_same(7x7, stride 2, pad 3/3) on x is identical to a 4x4 stride-1
    conv with padding ((2,1),(2,1)) on space_to_depth_2x2(x) with kernel
    K2[m, n, a*2c + b*c + ch, o] = K7[2(m-2)+a+3, 2(n-2)+b+3, ch, o]
    (zero where the source index falls outside the 7x7 support). This is the
    standard TPU trick for C_in=3 stems — conv1 alone ran at ~0.9 TF/s on
    v5e because 3 input channels cannot feed the MXU.
    """
    import numpy as np
    k7 = np.asarray(k7)
    c, o = k7.shape[2], k7.shape[3]
    k2 = np.zeros((4, 4, 4 * c, o), k7.dtype)
    for m in range(4):
        for n in range(4):
            for a in range(2):
                for bb in range(2):
                    dy = 2 * (m - 2) + a + 3
                    dx = 2 * (n - 2) + bb + 3
                    if 0 <= dy <= 6 and 0 <= dx <= 6:
                        k2[m, n, (a * 2 + bb) * c:(a * 2 + bb) * c + c, :] = \
                            k7[dy, dx]
    return k2


class ResNetV1Head(nn.Module):
    """Stem + blocks 1-3 -> stride-16, 1024-channel conv4 features.

    space_to_depth=True runs the mathematically-identical 4x4 stem on a
    2x2 space-to-depth input (kernel shape [4,4,12,64]; import via
    s2d_conv1_kernel). The caller supplies the input ALREADY transformed
    ([B, H/2, W/2, 4C], see data/blob.py space_to_depth) — doing the
    relayout on device costs more than the fast stem saves (measured
    5.8 ms vs 2.5 ms vs the 4.6 ms plain 7x7 stem, v5e batch-8 608x1024),
    while the host transform rides the image pool."""
    num_layers: int = 101
    dtype: Optional[jnp.dtype] = None
    space_to_depth: bool = False
    fixed_blocks: int = 0

    @nn.compact
    def __call__(self, x, valid_hw=None):
        """valid_hw: [B, 2] per-image PIXEL extents (im_info units); the
        margin is re-zeroed stage by stage so features match the reference's
        unpadded computation on any canvas (layers.mask_valid)."""
        units = BLOCK_UNITS[self.num_layers]
        if self.space_to_depth:
            assert x.shape[-1] == 12, (
                "space_to_depth head expects a host-transformed "
                f"[B, H/2, W/2, 12] input, got {x.shape}")
            x = nn.Conv(64, (4, 4), strides=(1, 1),
                        padding=((2, 1), (2, 1)), use_bias=False,
                        kernel_init=stem_init(), dtype=self.dtype,
                        name="conv1")(x)
        else:
            # stem_init: raw-pixel-scale inputs -> O(1) activations when no
            # checkpoint is loaded (frozen identity-BN cannot normalize);
            # any checkpoint load overwrites it (layers.stem_init)
            x = ConvSame(64, 7, 2, use_bias=False, kernel_init=stem_init(),
                         dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="conv1_bn")(x)
        x = nn.relu(x)
        if valid_hw is not None:
            valid_hw = shrink_valid(valid_hw, 2)  # conv1 output cells
            x = mask_valid(x, valid_hw)
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        if valid_hw is not None:
            valid_hw = shrink_valid(valid_hw, 2)
            x = mask_valid(x, valid_hw)
        # the freeze set is a strict prefix (stem always + first
        # fixed_blocks blocks, resnet_v1.py:88-113): a stop_gradient at the
        # boundary lets XLA drop the frozen prefix's backward convolutions
        # (the optimizer mask alone would compute-and-discard them)
        x = jax.lax.stop_gradient(x)
        # block1/2 stride 2, block3 stride 1 (conv4 at stride 16)
        strides = (2, 2, 1)
        for b in range(3):
            x = _Block(_BASE_DEPTHS[b], units[b], strides[b],
                       dtype=self.dtype, name=f"block{b + 1}")(x, valid_hw)
            if valid_hw is not None:
                valid_hw = shrink_valid(valid_hw, strides[b])
            if b + 1 <= self.fixed_blocks:
                x = jax.lax.stop_gradient(x)
        if valid_hw is not None:
            # the RPN 3x3 and the RoI crop consume this map directly — hand
            # them a clean margin (units leave theirs dirty, see Bottleneck)
            x = mask_valid(x, valid_hw)
        return x


class ResNetV1Tail(nn.Module):
    """block4 on pooled crops, then global mean -> [N, 2048]."""
    num_layers: int = 101
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, pooled):
        units = BLOCK_UNITS[self.num_layers]
        x = _Block(_BASE_DEPTHS[3], units[3], 1, dtype=self.dtype,
                   name="block4")(pooled)
        return jnp.mean(x, axis=(1, 2))


def trainable_filter(path: tuple, fixed_blocks: int) -> bool:
    """Reference freeze rules: BN frozen everywhere, stem frozen, first
    ``fixed_blocks`` blocks frozen (resnet_v1.py:88-113)."""
    p = "/".join(str(x) for x in path)
    if "/bn/" in p or p.endswith("_bn") or "_bn/" in p or "/bn" in p:
        return False
    if "conv1/" in p and "block" not in p:  # stem
        return False
    for b in range(1, fixed_blocks + 1):
        if f"block{b}/" in p:
            return False
    return True
