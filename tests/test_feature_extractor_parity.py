"""Feature-extractor weight converters vs the imported reference extractor
classes (``feature_extractors/{resnet,vit,dino}.py``) with random weights.

The torch oracles come from the torchvision-compatible stub (ResNet, ViT)
and a local DINOv2-architecture module (patched in place of torch.hub);
state dicts go through ``utils.weight_convert.convert_tv_resnet /
convert_tv_vit / convert_dinov2`` into the flax trunks used by
``models.feature_extractors.build_feature_extractor``.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

import torchvision_stub

torchvision_stub.install()
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from eva_vos_tpu.models.resnet import ResNetTrunk
from eva_vos_tpu.models.vit import ViTEncoder
from eva_vos_tpu.utils.weight_convert import (convert_tv_resnet,
                                              convert_tv_vit, convert_dinov2)

IMG = 224


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(1234)


def test_resnet_extractor_parity(rng_mod):
    if not Path("/root/reference").exists():
        pytest.skip("no reference")
    from feature_extractors.resnet import ResnetFeatureExtractor

    torch.manual_seed(0)
    ref = ResnetFeatureExtractor(arch="resnet18")
    ref.model.eval()
    x = rng_mod.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    ref.extract_features(_nchw(x))
    ref_feats = ref.features.numpy()            # layer4 hook [B, 512, 7, 7]

    variables = jax.tree.map(
        jnp.asarray, convert_tv_resnet(_sd(ref.model), arch="resnet18"))
    trunk = ResNetTrunk(arch="resnet18", num_stages=4)
    feats = trunk.apply(variables, jnp.asarray(x))
    got = np.asarray(feats[-1]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref_feats, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_vit_extractor_parity(rng_mod):
    if not Path("/root/reference").exists():
        pytest.skip("no reference")
    from feature_extractors.vit import ViTFeatureExtractor

    torch.manual_seed(1)
    ref = ViTFeatureExtractor(arch="base")
    # random pos-embed/cls need nonzero values for a meaningful test
    with torch.no_grad():
        ref.model.class_token.normal_(0, 0.02)
    ref.model.eval()
    x = rng_mod.standard_normal((2, IMG, IMG, 3)).astype(np.float32) * 0.1
    ref_cls = ref.extract_features(_nchw(x)).numpy()   # encoder-ln cls token

    variables = jax.tree.map(
        jnp.asarray, convert_tv_vit(_sd(ref.model), depth=12, heads=12))
    vit = ViTEncoder(patch_size=16, dim=768, depth=12, num_heads=12,
                     img_size=IMG)
    cls, _ = vit.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(cls), ref_cls,
                               rtol=1e-3, atol=1e-3)


class _DinoBlock(tnn.Module):
    """DINOv2 block: pre-LN attention/MLP with LayerScale residuals."""

    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, 3 * dim)
        self.attn.proj = tnn.Linear(dim, dim)
        self.ls1 = tnn.Module()
        self.ls1.gamma = tnn.Parameter(torch.full((dim,), 1e-5))
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, 4 * dim)
        self.mlp.fc2 = tnn.Linear(4 * dim, dim)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, h, d // h)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        y = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        y = self.attn.proj(y.transpose(1, 2).reshape(b, n, d))
        x = x + self.ls1.gamma * y
        y = self.mlp.fc2(torch.nn.functional.gelu(
            self.mlp.fc1(self.norm2(x))))
        return x + self.ls2.gamma * y


class _DinoViT(tnn.Module):
    """Minimal DINOv2 architecture (patch-14 ViT + LayerScale); forward
    returns the normalized cls token like the torch.hub models."""

    def __init__(self, dim=384, depth=2, heads=6, patch=14, img=IMG):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        n = (img // patch) ** 2 + 1
        self.pos_embed = tnn.Parameter(torch.randn(1, n, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [_DinoBlock(dim, heads) for _ in range(depth)])
        for blk in self.blocks:
            blk.ls2 = tnn.Module()
            blk.ls2.gamma = tnn.Parameter(torch.full((dim,), 1e-5))
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


def test_dino_extractor_parity(rng_mod, monkeypatch):
    if not Path("/root/reference").exists():
        pytest.skip("no reference")
    import feature_extractors.dino as ref_dino

    torch.manual_seed(2)
    model = _DinoViT(dim=384, depth=2, heads=6)
    monkeypatch.setattr(ref_dino.torch.hub, "load",
                        lambda *a, **kw: model)
    ref = ref_dino.DINOFeatureExtractor(arch="small")
    ref.model.eval()
    x = rng_mod.standard_normal((2, IMG, IMG, 3)).astype(np.float32) * 0.1
    ref_cls = ref.extract_features(_nchw(x)).numpy()

    variables = jax.tree.map(
        jnp.asarray, convert_dinov2(_sd(model), depth=2, heads=6))
    vit = ViTEncoder(patch_size=14, dim=384, depth=2, num_heads=6,
                     img_size=IMG, layerscale=True)
    cls, _ = vit.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(cls), ref_cls,
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_build_extractor_loads_converted_pth(rng_mod, tmp_path, monkeypatch):
    """End-to-end: a torch .pth in the weights root loads through the
    converter; the load report records a non-random load."""
    from eva_vos_tpu.models.feature_extractors import build_feature_extractor
    from eva_vos_tpu.utils import load_report

    torch.manual_seed(3)
    model = torchvision_stub.resnet18()
    wdir = tmp_path / "feature_extractors"
    wdir.mkdir(parents=True)
    torch.save(model.state_dict(), wdir / "resnet18.pth")
    monkeypatch.setenv("EVAVOS_WEIGHTS_ROOT", str(tmp_path))

    load_report.reset()
    extract = build_feature_extractor("resnet18")
    feats = extract(rng_mod.uniform(size=(1, 64, 96, 3)).astype(np.float32))
    assert feats.shape[0] == 1 and np.isfinite(feats).all()
    assert load_report.weights_marker() == "converted"

    load_report.reset()
    build_feature_extractor("resnet50", allow_random=True)
    assert load_report.weights_marker() == "RANDOM_WEIGHTS"
