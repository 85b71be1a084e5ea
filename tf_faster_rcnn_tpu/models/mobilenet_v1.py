"""MobileNet-v1 backbone with the reference's detection modifications.

Structure parity with /root/reference/lib/nets/mobilenet_v1.py:
* the 14-layer _CONV_DEFS table with the 13th layer forced to stride 1 so
  the head ends at stride 16 (:62-79);
* head = layers 0-11, tail = layers 12-13 applied to pooled RoI crops then
  global mean (:214-250);
* depthwise convs use conv2d_same explicit padding for stride 2 (:21-49);
* relu6 activations, frozen BN (:175-204), depth multiplier with min_depth 8
  (:114), first FIXED_LAYERS layers frozen — via ``trainable_filter``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tf_faster_rcnn_tpu.models.layers import (ConvSame, FrozenBatchNorm,
                                              mask_valid, shrink_valid,
                                              stem_init)

__all__ = ["MobileNetV1Head", "MobileNetV1Tail", "CONV_DEFS", "trainable_filter"]

# (is_depthwise_separable, stride, depth); layer 12 stride forced to 1
CONV_DEFS = [
    (False, 2, 32),
    (True, 1, 64),
    (True, 2, 128),
    (True, 1, 128),
    (True, 2, 256),
    (True, 1, 256),
    (True, 2, 512),
    (True, 1, 512),
    (True, 1, 512),
    (True, 1, 512),
    (True, 1, 512),
    (True, 1, 512),
    (True, 1, 1024),
    (True, 1, 1024),
]


def _depth(d: int, multiplier: float, min_depth: int = 8) -> int:
    return max(int(d * multiplier), min_depth)


class _SepConv(nn.Module):
    """3x3 depthwise (+BN+relu6) then 1x1 pointwise (+BN+relu6)."""
    depth: int
    stride: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        x = ConvSame(c_in, 3, self.stride, use_bias=False,
                     feature_group_count=c_in, dtype=self.dtype,
                     name="depthwise")(x)
        x = FrozenBatchNorm(epsilon=0.001, dtype=self.dtype,
                            name="depthwise_bn")(x)
        x = jnp.minimum(nn.relu(x), 6.0)
        # He init, like ConvSame's default: under from-scratch identity-BN
        # nothing restores the variance a relu sheds, and flax's default
        # lecun gain loses x0.5 per pointwise — (1/sqrt(2))^13 ~= 0.01
        # backbone-output std, which collapses the 0.01-std heads to an
        # all-background equilibrium (measured on the v5e mobile rehearsal:
        # AP 0.0004 with train losses plateaued at the bg fixed point).
        # Checkpoint loads overwrite it, so fine-tune parity is untouched.
        x = nn.Conv(self.depth, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        2.0, "fan_in", "truncated_normal"),
                    name="pointwise")(x)
        x = FrozenBatchNorm(epsilon=0.001, dtype=self.dtype,
                            name="pointwise_bn")(x)
        return jnp.minimum(nn.relu(x), 6.0)


class _Layers(nn.Module):
    start: int
    stop: int
    depth_multiplier: float = 1.0
    dtype: Optional[jnp.dtype] = None
    stop_grad_after: int = -1  # layer index; the frozen set is a prefix

    @nn.compact
    def __call__(self, x, valid_hw=None):
        """valid_hw: [B, 2] valid cell extents of x — the margin (nonzero
        after each BN shift) is re-zeroed after every layer so the depthwise
        3x3s see the reference's own boundary zeros (layers.mask_valid)."""
        for i in range(self.start, self.stop):
            sep, stride, depth = CONV_DEFS[i]
            d = _depth(depth, self.depth_multiplier)
            name = f"conv2d_{i}"
            if sep:
                x = _SepConv(d, stride, dtype=self.dtype, name=name)(x)
            else:
                # conv2d_0: from-scratch init absorbs the raw-pixel scale —
                # the analog of the import surgery folding 2/255 into conv1
                # (reference mobilenet_v1.py:266-278); checkpoint loads
                # overwrite it (layers.stem_init)
                kw = {"kernel_init": stem_init()} if i == 0 else {}
                x = ConvSame(d, 3, stride, use_bias=False, dtype=self.dtype,
                             name=name, **kw)(x)
                x = FrozenBatchNorm(epsilon=0.001, dtype=self.dtype,
                                    name=name + "_bn")(x)
                x = jnp.minimum(nn.relu(x), 6.0)
            if valid_hw is not None:
                valid_hw = shrink_valid(valid_hw, stride)
                x = mask_valid(x, valid_hw)
            if i == self.stop_grad_after:
                # frozen prefix (MOBILENET.FIXED_LAYERS): prune its backward
                # pass instead of compute-and-discard via the optimizer mask
                x = jax.lax.stop_gradient(x)
        return x


class MobileNetV1Head(nn.Module):
    """Layers 0-11 -> stride-16, 512*m-channel features."""
    depth_multiplier: float = 1.0
    dtype: Optional[jnp.dtype] = None
    fixed_layers: int = 0

    @nn.compact
    def __call__(self, x, valid_hw=None):
        """valid_hw: [B, 2] per-image pixel extents (im_info units)."""
        return _Layers(0, 12, self.depth_multiplier, dtype=self.dtype,
                       stop_grad_after=self.fixed_layers - 1,
                       name="base")(x, valid_hw)


class MobileNetV1Tail(nn.Module):
    """Layers 12-13 on pooled crops, then global mean."""
    depth_multiplier: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, pooled):
        x = _Layers(12, 14, self.depth_multiplier, dtype=self.dtype,
                    name="base")(pooled)
        return jnp.mean(x, axis=(1, 2))


def trainable_filter(path: tuple, fixed_layers: int) -> bool:
    """BN frozen everywhere; layers [0, fixed_layers) frozen."""
    p = "/".join(str(x) for x in path)
    if "_bn/" in p or "/depthwise_bn" in p or "/pointwise_bn" in p:
        return False
    for i in range(fixed_layers):
        if f"conv2d_{i}/" in p or p.endswith(f"conv2d_{i}"):
            return False
    return True
