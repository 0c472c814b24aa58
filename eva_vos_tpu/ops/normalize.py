"""ImageNet normalization used by every CNN input in the pipeline.

Parity target: ``datasets/range_transform.py`` in the reference.
Images are channel-last ([..., H, W, 3]) throughout this framework.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


def im_normalize(img):
    """[..., 3] float image in [0, 1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=img.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=img.dtype)
    return (img - mean) / std


def im_denormalize(img):
    """Inverse of :func:`im_normalize` (reference's ``inv_im_trans``)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=img.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=img.dtype)
    return img * std + mean
