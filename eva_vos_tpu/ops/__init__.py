from .padding import compute_pad, pad_hw, unpad_hw, pad_divide_by
from .aggregate import aggregate_wbg, aggregate_sbg, aggregate_wbg_channel
from .normalize import IMAGENET_MEAN, IMAGENET_STD, im_normalize, im_denormalize
from .masks import all_to_onehot, masks_to_boxes
from .memory_attention import (
    memory_readout,
    resolve_strategy,
    memory_affinity_topk,
    memory_affinity_topk_gauss,
    full_softmax_affinity,
)

__all__ = [
    "compute_pad",
    "pad_hw",
    "unpad_hw",
    "pad_divide_by",
    "aggregate_wbg",
    "aggregate_sbg",
    "aggregate_wbg_channel",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "im_normalize",
    "im_denormalize",
    "all_to_onehot",
    "masks_to_boxes",
    "memory_readout",
    "resolve_strategy",
    "memory_affinity_topk",
    "memory_affinity_topk_gauss",
    "full_softmax_affinity",
]
