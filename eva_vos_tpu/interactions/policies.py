"""Frame-selection policies.

Behavior parity targets: ``interactions/policies.py`` in the reference —
QNet farthest-point selection in quality-feature space, random selection,
pretrained-encoder farthest-point, and the oracle one-step lookahead.

TPU notes: feature extraction over all T frames is one batched jit call;
the farthest-point search itself is a tiny jitted kernel whose interacted
set is padded to a fixed length so each video traces once.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bicubic, resize_nearest
from .eval import Session, eval_session_metric


@partial(jax.jit, static_argnames=())
def _min_dist_argmax(features, interacted_idx):
    """features [T, D]; interacted_idx [P] (padded with repeats).

    Returns argmax_t min_p ||f_t - f_p||; first max wins on ties, like the
    reference's strict-> scan.
    """
    inter = features[interacted_idx]                        # [P, D]
    d2 = jnp.sum((features[:, None, :] - inter[None]) ** 2, axis=-1)
    min_d = jnp.sqrt(jnp.min(d2, axis=1))
    return jnp.argmax(min_d)


def farthest_point_selection(features: np.ndarray, interacted_frames) -> int:
    """Pick the frame whose feature is farthest (min-L2) from every
    interacted frame's feature."""
    t = features.shape[0]
    idx = np.asarray(list(interacted_frames), dtype=np.int32)
    padded = np.full((t,), idx[0], dtype=np.int32)
    padded[: len(idx)] = idx[:t]
    return int(_min_dist_argmax(jnp.asarray(features), jnp.asarray(padded)))


def frames_to_224(images01: np.ndarray) -> jnp.ndarray:
    """[T, H, W, 3] in [0,1] (float) or [0,255] (uint8) -> normalized
    bicubic 224x224 (QNet input).  uint8 uploads 1 byte/px and scales on
    device."""
    from ..ops.normalize import im_normalize

    x = jnp.asarray(images01)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    x = im_normalize(x.astype(jnp.float32))
    return resize_bicubic(x, (224, 224), h_axis=1, w_axis=2)


def masks_to_224_3ch(masks: np.ndarray) -> jnp.ndarray:
    """[T, H, W] 0/1 -> [T, 224, 224, 3] nearest-resized."""
    m = resize_nearest(jnp.asarray(masks, jnp.float32), (224, 224),
                       h_axis=1, w_axis=2)
    return jnp.repeat(m[..., None], 3, axis=-1)


def qnet_frame_selection(qnet_extract, frames224, gen_masks, interacted_frames):
    """QNet feature farthest-point selection (``policies.py:40-60``).

    qnet_extract: jitted fn (imgs [T,224,224,3], masks [T,224,224,3]) -> [T, D]
    frames224: precomputed normalized 224 frames for the video
    gen_masks: [T, H, W] current generated masks (0/1 float)
    """
    masks224 = masks_to_224_3ch(gen_masks)
    features = np.asarray(qnet_extract(frames224, masks224))
    return farthest_point_selection(features, interacted_frames)


def rand_frame_selection(num_frames: int, interacted_frames, rng) -> int:
    """Uniform choice among frames not yet interacted."""
    avail = sorted(set(range(num_frames)) - set(int(i) for i in interacted_frames))
    return int(rng.choice(avail))


def l2_frame_selection(encoder_features: np.ndarray, interacted_frames) -> int:
    """Farthest-point on pretrained-encoder features (``get_frame_l2``)."""
    return farthest_point_selection(encoder_features, interacted_frames)


def upper_bound_frame_selection(session: Session, metric: str = "j") -> int:
    """Oracle one-step lookahead: try annotating every candidate frame and
    keep the one with the best resulting mean quality (``policies.py:91-118``).

    The reference deep-copies the whole stateful processor per candidate;
    here the propagation state is an immutable pytree so lookahead is just
    calling ``interact`` on the same state without keeping the result.
    Ties keep the *last* best frame, matching the reference's ``>=``.
    """
    best_metric = -np.inf
    best_frame = -1
    prev = set(session.frames_list)
    for f in range(session.num_frames):
        if f in prev:
            continue
        look = session.clone()
        look.frame_interaction_type[f] = 1
        look.frames_list.append(f)
        look.interact(look.gt_mask(f), f)
        mu, *_ = eval_session_metric(look, metric)
        if mu >= best_metric:
            best_metric = mu
            best_frame = f
    return best_frame
