"""Pretrained-encoder feature extractors for the l2_mask baseline.

Behavior parity targets: ``feature_extractors/{resnet,vit,dino}.py`` in the
reference — ResNet layer4 features, ViT cls-token features, DINOv2 cls
features — each paired with its eval transform (resize-256 -> center-crop
224 -> ImageNet normalize).

Checkpoints: torchvision/torch.hub weights are not redistributable offline;
``build_feature_extractor`` loads a converted checkpoint from the weights
root when present (``feature_extractors/<name>.pth``), otherwise (with
``allow_random``) random-initializes — selection quality then degrades to
roughly random, but every pipeline keeps running.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from .resnet import ResNetTrunk
from .vit import ViTEncoder
from ..ops.resize import resize_bilinear, resize_bicubic
from ..ops.normalize import im_normalize
from ..utils.paths import DataPaths

VIT_CONFIGS = {
    "vit_base": dict(patch_size=16, dim=768, depth=12, num_heads=12),
    "vit_large": dict(patch_size=16, dim=1024, depth=24, num_heads=16),
    "dino_small": dict(patch_size=14, dim=384, depth=12, num_heads=6),
    "dino_base": dict(patch_size=14, dim=768, depth=12, num_heads=12),
    "dino_large": dict(patch_size=14, dim=1024, depth=24, num_heads=16),
    "dino_giant": dict(patch_size=14, dim=1536, depth=40, num_heads=24),
}


def eval_transform(images01: np.ndarray, out: int = 224,
                   method: str = "bilinear") -> jnp.ndarray:
    """[T, H, W, 3] in [0,1] -> resize short side 256 -> center crop ->
    ImageNet normalize (the torchvision eval transform)."""
    t, h, w, _ = images01.shape
    scale = 256.0 / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resize = resize_bicubic if method == "bicubic" else resize_bilinear
    x = jnp.asarray(images01)
    if x.dtype == jnp.uint8:  # 1 byte/px upload, scale on device
        x = x.astype(jnp.float32) / 255.0
    x = resize(x.astype(jnp.float32), (nh, nw), h_axis=1, w_axis=2)
    top = (nh - out) // 2
    left = (nw - out) // 2
    x = x[:, top:top + out, left:left + out]
    return im_normalize(x)


def _load_variables(name: str, init_fn, allow_random: bool, convert_fn=None):
    """Load converted weights for extractor ``name``.

    Accepts either ``<name>.npz`` (flat 'a/b/c'-keyed trees) or a raw torch
    ``<name>.pth`` checkpoint pushed through ``convert_fn``
    (``utils.weight_convert.convert_tv_resnet / convert_tv_vit /
    convert_dinov2``).  Random-init fallbacks are recorded loudly in
    ``utils.load_report`` so experiment CSVs carry a RANDOM_WEIGHTS marker.
    """
    from ..utils import load_report

    root = Path(DataPaths.weights_root()) / "feature_extractors"
    npz_path = root / f"{name}.npz"
    pth_path = root / f"{name}.pth"
    if npz_path.exists():
        flat = dict(np.load(npz_path))
        # flat 'a/b/c' keys -> nested tree
        tree: dict = {}
        for k, v in flat.items():
            node = tree
            parts = k.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(v)
        load_report.record(f"encoder/{name}", False)
        return {"params": tree.get("params", tree)}
    if pth_path.exists() and convert_fn is not None:
        from ..utils.weight_convert import load_torch_state_dict

        variables = convert_fn(load_torch_state_dict(pth_path))
        load_report.record(f"encoder/{name}", False)
        return jax.tree.map(jnp.asarray, variables)
    if not allow_random:
        raise FileNotFoundError(
            f"feature extractor weights {npz_path} (or .pth) not found; "
            f"pass allow_random=True")
    load_report.record(f"encoder/{name}", True)
    return init_fn()


def build_feature_extractor(name: str, allow_random: bool = False,
                            dtype=jnp.float32):
    """Returns ``extract(images01 [T, H, W, 3]) -> np [T, D]``."""
    from ..utils.weight_convert import (convert_tv_resnet, convert_tv_vit,
                                        convert_dinov2)

    if name.startswith("resnet"):
        trunk = ResNetTrunk(arch=name, num_stages=4, dtype=dtype)

        def init_fn():
            return trunk.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 224, 224, 3), dtype))

        variables = _load_variables(
            name, init_fn, allow_random,
            convert_fn=lambda sd: convert_tv_resnet(sd, arch=name))

        @jax.jit
        def fwd(x):
            feats = trunk.apply(variables, x)
            return feats[-1].reshape(x.shape[0], -1)  # layer4, flattened

        method = "bilinear"
    elif name.startswith(("vit", "dino")):
        key = name if name in VIT_CONFIGS else {
            "vit_b_16": "vit_base", "vit_l_16": "vit_large",
            "dino": "dino_large"}.get(name)
        if key is None:
            raise AttributeError(f"{name} is invalid!")
        cfg = VIT_CONFIGS[key]
        layerscale = key.startswith("dino")
        vit = ViTEncoder(img_size=224, dtype=dtype, layerscale=layerscale,
                         **cfg)

        def init_fn():
            return vit.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), dtype))

        if layerscale:
            def convert_fn(sd):
                return convert_dinov2(sd, depth=cfg["depth"],
                                      heads=cfg["num_heads"])
        else:
            def convert_fn(sd):
                return convert_tv_vit(sd, depth=cfg["depth"],
                                      heads=cfg["num_heads"])

        variables = _load_variables(key, init_fn, allow_random, convert_fn)

        @jax.jit
        def fwd(x):
            cls, _ = vit.apply(variables, x)
            return cls

        method = "bicubic"
    else:
        raise AttributeError(f"{name} is invalid!")

    def extract(images01):
        x = eval_transform(np.asarray(images01), method=method)
        return np.asarray(fwd(x.astype(dtype)), np.float32)

    return extract
