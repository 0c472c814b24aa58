"""Minimal torchvision-compatible stand-in for parity tests.

The reference imports ``torchvision.models`` resnets (and ViT names) but
this image has no torchvision.  This module implements the standard
torchvision ResNet (v1.5: stride on the Bottleneck's 3x3) with
state-dict keys identical to torchvision's (`conv1`, `bn1`,
`layerX.Y.convZ/bnZ`, `layerX.Y.downsample.0/1`, `fc`), registers itself
as ``sys.modules['torchvision']`` and exposes the handful of names the
reference touches.  Weights enums are accepted and ignored — parity tests
convert whatever random init comes out.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn


def conv3x3(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)


def conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = conv3x3(inplanes, planes, stride)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = conv3x3(planes, planes)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = conv1x1(inplanes, planes)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = conv3x3(planes, planes, stride)  # v1.5: stride here
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = conv1x1(planes, planes * self.expansion)
        self.bn3 = nn.BatchNorm2d(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                conv1x1(self.inplanes, planes * block.expansion, stride),
                nn.BatchNorm2d(planes * block.expansion))
        mods = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        mods += [block(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*mods)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet18(weights=None, **kw):
    return ResNet(BasicBlock, [2, 2, 2, 2])


def resnet50(weights=None, **kw):
    return ResNet(Bottleneck, [3, 4, 6, 3])


def resnet101(weights=None, **kw):
    return ResNet(Bottleneck, [3, 4, 23, 3])


class _MLPBlock(nn.Sequential):
    def __init__(self, dim, hidden):
        super().__init__(nn.Linear(dim, hidden), nn.GELU(), nn.Dropout(0.0),
                         nn.Linear(hidden, dim), nn.Dropout(0.0))


class _EncoderBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.ln_1 = nn.LayerNorm(dim, eps=1e-6)
        self.self_attention = nn.MultiheadAttention(dim, heads,
                                                    batch_first=True)
        self.ln_2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _MLPBlock(dim, 4 * dim)

    def forward(self, x):
        y = self.ln_1(x)
        y, _ = self.self_attention(y, y, y, need_weights=False)
        x = x + y
        return x + self.mlp(self.ln_2(x))


class _Encoder(nn.Module):
    def __init__(self, seq_len, dim, depth, heads):
        super().__init__()
        from collections import OrderedDict

        self.pos_embedding = nn.Parameter(torch.randn(1, seq_len, dim) * 0.02)
        # state-dict name compat: torchvision names them encoder_layer_{i}
        self.layers = nn.Sequential(OrderedDict(
            (f"encoder_layer_{i}", _EncoderBlock(dim, heads))
            for i in range(depth)))
        self.ln = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        return self.ln(self.layers(x + self.pos_embedding))


class VisionTransformer(nn.Module):
    """torchvision-compatible ViT: identical state-dict keys and forward
    semantics (cls token, pos embed, pre-LN blocks, final encoder LN)."""

    def __init__(self, patch=16, dim=768, depth=12, heads=12, img=224,
                 num_classes=1000):
        super().__init__()
        self.patch_size = patch
        self.conv_proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.class_token = nn.Parameter(torch.zeros(1, 1, dim))
        seq_len = (img // patch) ** 2 + 1
        self.encoder = _Encoder(seq_len, dim, depth, heads)
        self.heads = nn.Sequential()
        self.heads.add_module("head", nn.Linear(dim, num_classes))

    def forward(self, x):
        b = x.shape[0]
        x = self.conv_proj(x)                       # [B, D, g, g]
        x = x.flatten(2).transpose(1, 2)            # [B, N, D]
        cls = self.class_token.expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1)
        x = self.encoder(x)
        return self.heads(x[:, 0])


def vit_b_16(weights=None, **kw):
    return VisionTransformer(patch=16, dim=768, depth=12, heads=12)


def vit_l_16(weights=None, **kw):
    return VisionTransformer(patch=16, dim=1024, depth=24, heads=16)


class _Weights:
    def transforms(self):
        return None


class _WeightsEnum:
    DEFAULT = _Weights()


def _vit_unavailable(*a, **kw):
    raise NotImplementedError("ViT stub: arch not needed by parity tests")


def install():
    """Register the stub as torchvision in sys.modules (idempotent)."""
    if "torchvision" in sys.modules and getattr(
            sys.modules["torchvision"], "_EVAVOS_STUB", False):
        return sys.modules["torchvision"]

    tv = types.ModuleType("torchvision")
    tv._EVAVOS_STUB = True
    models = types.ModuleType("torchvision.models")
    for name, fn in [("resnet18", resnet18), ("resnet50", resnet50),
                     ("resnet101", resnet101)]:
        setattr(models, name, fn)
    for name in ["ResNet18_Weights", "ResNet50_Weights", "ResNet101_Weights",
                 "ViT_B_16_Weights", "ViT_B_32_Weights", "ViT_L_16_Weights",
                 "ViT_L_32_Weights"]:
        setattr(models, name, _WeightsEnum)
    models.vit_b_16 = vit_b_16
    models.vit_l_16 = vit_l_16
    for name in ["vit_b_32", "vit_l_32"]:
        setattr(models, name, _vit_unavailable)

    transforms = types.ModuleType("torchvision.transforms")
    transforms.InterpolationMode = types.SimpleNamespace(
        BICUBIC="bicubic", BILINEAR="bilinear", NEAREST="nearest")

    class _Compose:
        """Functional Compose: applies callables; passes through the legacy
        tuple placeholders some parity tests construct."""

        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for fn in self.fns:
                if callable(fn):
                    x = fn(x)
            return x

        def __iter__(self):
            return iter(self.fns)

    class _Resize:
        """Functional Resize over the LAST TWO axes of a torch tensor,
        delegating to this framework's jax resize kernels so both stacks
        of the policy-parity harness share identical resampling (the real
        torchvision is not installed in this image)."""

        def __init__(self, size, interpolation="bilinear", antialias=None,
                     **kw):
            self.size = (size, size) if isinstance(size, int) else tuple(size)
            self.interpolation = getattr(interpolation, "value",
                                         interpolation)

        def __call__(self, x):
            import torch
            import numpy as np
            from eva_vos_tpu.ops.resize import (resize_bicubic,
                                                resize_bilinear,
                                                resize_nearest)

            arr = x.detach().cpu().numpy() if hasattr(x, "detach") \
                else np.asarray(x)
            fn = {"bicubic": resize_bicubic, "bilinear": resize_bilinear,
                  "nearest": resize_nearest}[self.interpolation]
            out = np.asarray(fn(arr.astype(np.float32), self.size,
                                h_axis=-2, w_axis=-1))
            return torch.from_numpy(out)

    class _Normalize:
        def __init__(self, mean, std, **kw):
            self.mean = mean
            self.std = std

        def __call__(self, x):
            import torch

            mean = torch.as_tensor(self.mean, dtype=x.dtype)
            std = torch.as_tensor(self.std, dtype=x.dtype)
            return (x - mean[:, None, None]) / std[:, None, None]

    transforms.Compose = _Compose
    transforms.Resize = _Resize
    transforms.Normalize = _Normalize
    for cls in ["CenterCrop", "ToTensor"]:
        setattr(transforms, cls, lambda *a, _c=cls, **kw: (_c, a, kw))

    ops = types.ModuleType("torchvision.ops")

    def masks_to_boxes(masks):
        """[N, H, W] bool -> [N, 4] (x0, y0, x1, y1) float, matching
        torchvision.ops.masks_to_boxes."""
        import torch

        out = torch.zeros((masks.shape[0], 4), dtype=torch.float32)
        for i, m in enumerate(masks):
            ys, xs = torch.where(m != 0)
            out[i] = torch.tensor([xs.min(), ys.min(), xs.max(), ys.max()],
                                  dtype=torch.float32)
        return out

    ops.masks_to_boxes = masks_to_boxes

    tv.models = models
    tv.transforms = transforms
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.ops"] = ops
    return tv
