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


class VGG16Head(nn.Module):
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, valid_hw=None):
        """valid_hw: [B, 2] per-image pixel extents on the padded canvas;
        the margin is re-zeroed after every conv (layers.mask_valid) so the
        output is exactly what the reference computes on the unpadded
        image, independent of canvas size."""
        from tf_faster_rcnn_tpu.models.layers import mask_valid, shrink_valid
        from tf_faster_rcnn_tpu.models.layers import stem_init
        for i, (reps, width, name) in enumerate(_CFG):
            for r in range(reps):
                # conv1_1 init absorbs the raw-pixel input scale so a
                # FROM-SCRATCH net starts at O(1) activations; the rest use
                # relu-corrected He gain — with no BN to re-normalize, the
                # default lecun gain sheds x0.5 variance per post-relu conv
                # ((1/sqrt 2)^12 ~= 0.01 head-output std, the collapse
                # flavor measured on mobilenet). Checkpoint loads overwrite
                # both (layers.stem_init).
                kinit = (stem_init() if i == 0 and r == 0
                         else nn.initializers.variance_scaling(
                             2.0, "fan_in", "truncated_normal"))
                x = nn.Conv(width, (3, 3), padding="SAME", dtype=self.dtype,
                            kernel_init=kinit, name=f"{name}_{r + 1}")(x)
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
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc6")(x))
        x = nn.Dropout(0.5, deterministic=self.deterministic)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc7")(x))
        x = nn.Dropout(0.5, deterministic=self.deterministic)(x)
        return x


def trainable_filter(path: tuple) -> bool:
    """True if the param at this path trains (conv1/conv2 frozen)."""
    p = "/".join(str(x) for x in path)
    return not ("conv1_" in p or "conv2_" in p)
