"""VGG16 backbone (head conv1_1..conv5_3, tail fc6/fc7).

Structure parity with the reference (/root/reference/lib/nets/vgg16.py:26-60):
13 3x3 SAME convs with 4 2x2 SAME max-pools (stride 16 at conv5_3), tail is
flatten + fc6/fc7 (4096) with 0.5 dropout in training. conv1 and conv2 are
always frozen (vgg16.py:28-32); freezing is expressed through the optimizer
mask returned by ``trainable_filter`` rather than by graph surgery.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["VGG16Head", "VGG16Tail", "trainable_filter"]

_CFG = [(2, 64, "conv1"), (2, 128, "conv2"), (3, 256, "conv3"),
        (3, 512, "conv4"), (3, 512, "conv5")]


def _head_conv_init(block: int, rep: int):
    """FROM-SCRATCH init for head conv (block, rep): flax's default lecun —
    deliberately NOT the stem_init/He treatment resnet and mobilenet need.

    vgg16 is the one backbone whose from-scratch activation scale is healthy
    at the defaults: the mean-subtracted-pixel input is O(100) and the 13
    post-relu lecun convs each shed ~x(1/sqrt 2) variance, so the two cancel
    ((1/sqrt 2)^13 ~= 1/90) — measured conv5_3 std 0.78 on toy scenes, well
    inside the init-scale gate. resnet needs stem_init because its zero-init
    residual units PRESERVE the stem's O(100) scale to the heads (the round-3
    rehearsal NaN); mobilenet needs He pointwise gains because its 27-layer
    relu6 stack decays far past the input scale (the AP-0.0004 collapse).
    vgg16 has neither pathology, and round 4's uniform treatment measurably
    regressed it: stem_init (+He convs) makes features input-scale-invariant
    at a similar magnitude (std 0.55), but the flattened per-layer
    weight/activation profile saturates the cls head to exact-0 CE within 5
    toy steps, after which one resampled hard proposal costs CE ~7.7
    (trailing toy loss 3.28-4.14 vs 1.06 at the defaults —
    tests/test_recipe_scaling.py's overfit gate caught it). Checkpoint loads
    overwrite init either way, so fine-tune parity is untouched."""
    del block, rep
    return nn.initializers.lecun_normal()


def _tail_fc_init():
    """FROM-SCRATCH init for fc6/fc7: flax default (lecun), same story as
    _head_conv_init. The two post-relu lecun Denses shed ~x0.25 variance
    (ADVICE r4 flagged this as potential residual collapse), but measured
    head-input std is 0.33 — comfortably O(1) — and raising them to He both
    doubles the L2 floor on the 119M tail params (+0.6 constant in the toy's
    total loss) and accelerates the cls-head saturation above (trailing toy
    loss 4.14 vs 1.06)."""
    return nn.initializers.lecun_normal()


class VGG16Head(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, valid_hw=None):
        """valid_hw: [B, 2] per-image pixel extents on the padded canvas;
        the margin is re-zeroed after every conv (layers.mask_valid) so the
        output is exactly what the reference computes on the unpadded
        image, independent of canvas size."""
        from tf_faster_rcnn_tpu.models.layers import mask_valid, shrink_valid
        for i, (reps, width, name) in enumerate(_CFG):
            for r in range(reps):
                x = nn.Conv(width, (3, 3), padding="SAME", dtype=self.dtype,
                            kernel_init=_head_conv_init(i, r),
                            name=f"{name}_{r + 1}")(x)
                x = nn.relu(x)
                if valid_hw is not None:
                    x = mask_valid(x, valid_hw)
            if i < len(_CFG) - 1:  # no pool after conv5
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
                if valid_hw is not None:
                    valid_hw = shrink_valid(valid_hw, 2)
                    x = mask_valid(x, valid_hw)
            if name == "conv2":
                # conv1/conv2 are always frozen; stopping the gradient here
                # lets XLA prune their (highest-resolution, most expensive)
                # backward convolutions entirely — the optimizer mask alone
                # would compute those grads and discard them
                x = jax.lax.stop_gradient(x)
        return x


class VGG16Tail(nn.Module):
    deterministic: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, pooled):
        # pooled: [N, 7, 7, 512] -> flatten in (h, w, c) order, matching
        # slim.flatten so the slim fc6 [7,7,512,4096] kernel reshapes in
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc6",
                             kernel_init=_tail_fc_init())(x))
        x = nn.Dropout(0.5, deterministic=self.deterministic)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc7",
                             kernel_init=_tail_fc_init())(x))
        x = nn.Dropout(0.5, deterministic=self.deterministic)(x)
        return x


def trainable_filter(path: tuple) -> bool:
    """True if the param at this path trains (conv1/conv2 frozen)."""
    p = "/".join(str(x) for x in path)
    return not ("conv1_" in p or "conv2_" in p)
