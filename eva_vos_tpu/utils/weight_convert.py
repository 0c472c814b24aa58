"""Torch-checkpoint -> flax-variables conversion.

Loads the reference's released weights (``stcn.pth``, ``fusion.pth``,
``qnet.pth``, ``rl_agent/model.pth``, ``sam.pth`` — see the reference's
``download_weights.py``) into this framework's parameter trees.

Layout rules:
* Conv2d        OIHW -> HWIO
* Linear        [out, in] -> [in, out]
* ConvTranspose [in, out, kh, kw] -> HWIO with spatially flipped taps
  (torch's transposed conv correlates with the flipped kernel relative to
  flax's ``ConvTranspose``; validated numerically in tests)
* BatchNorm     weight/bias -> scale/bias; running stats -> batch_stats
* LayerNorm     weight/bias -> scale/bias

Conversion is template-driven: we walk the flax variables of a freshly
initialized module and pull the matching torch tensor, so missing keys or
shape mismatches fail loudly.
"""

from __future__ import annotations

import numpy as np


def _np(t):
    """torch tensor / ndarray -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def linear_kernel(w) -> np.ndarray:
    return _np(w).T


def conv_transpose_kernel(w) -> np.ndarray:
    """torch [in, out, kh, kw] -> flax ConvTranspose [kh, kw, in, out],
    flipping the spatial taps (validated in tests/test_weight_convert.py)."""
    w = _np(w).transpose(2, 3, 0, 1)
    return w[::-1, ::-1].copy()


class Converter:
    """Accumulates assignments into (params, batch_stats) dicts.

    When ``template`` is given (and the state dict is None), the converter
    runs in SYNTHESIS mode: it fabricates a random torch state dict with the
    inverse-transformed shapes implied by the template — the test suite uses
    this to prove the mapping covers the whole tree with consistent shapes.
    """

    def __init__(self, torch_sd=None, template=None, seed: int = 0):
        self.synth = torch_sd is None
        self.sd = {} if self.synth else dict(torch_sd)
        self.template = template
        self._rng = np.random.default_rng(seed)
        self.params: dict = {}
        self.stats: dict = {}
        self.used: set = set()

    def _template_leaf(self, collection, path):
        node = self.template[collection]
        for p in path:
            node = node[p]
        return np.asarray(node)

    def _ensure(self, key: str, shape):
        if self.synth and key not in self.sd:
            self.sd[key] = self._rng.standard_normal(shape).astype(np.float32)

    def _fetch(self, key: str):
        if key not in self.sd:
            raise KeyError(f"torch checkpoint is missing '{key}'")
        self.used.add(key)
        return self.sd[key]

    def _assign(self, tree: dict, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.ascontiguousarray(value)

    def conv(self, flax_path, torch_prefix, bias=True):
        if self.synth:
            kh, kw, cin, cout = self._template_leaf(
                "params", (*flax_path, "kernel")).shape
            self._ensure(f"{torch_prefix}.weight", (cout, cin, kh, kw))
            if bias:
                self._ensure(f"{torch_prefix}.bias", (cout,))
        self._assign(self.params, (*flax_path, "kernel"),
                     conv_kernel(self._fetch(f"{torch_prefix}.weight")))
        if bias:
            self._assign(self.params, (*flax_path, "bias"),
                         _np(self._fetch(f"{torch_prefix}.bias")))

    def conv_transpose(self, flax_path, torch_prefix, bias=True):
        if self.synth:
            kh, kw, cin, cout = self._template_leaf(
                "params", (*flax_path, "kernel")).shape
            self._ensure(f"{torch_prefix}.weight", (cin, cout, kh, kw))
            if bias:
                self._ensure(f"{torch_prefix}.bias", (cout,))
        self._assign(self.params, (*flax_path, "kernel"),
                     conv_transpose_kernel(self._fetch(f"{torch_prefix}.weight")))
        if bias:
            self._assign(self.params, (*flax_path, "bias"),
                         _np(self._fetch(f"{torch_prefix}.bias")))

    def linear(self, flax_path, torch_prefix, bias=True):
        if self.synth:
            cin, cout = self._template_leaf(
                "params", (*flax_path, "kernel")).shape
            self._ensure(f"{torch_prefix}.weight", (cout, cin))
            if bias:
                self._ensure(f"{torch_prefix}.bias", (cout,))
        self._assign(self.params, (*flax_path, "kernel"),
                     linear_kernel(self._fetch(f"{torch_prefix}.weight")))
        if bias:
            self._assign(self.params, (*flax_path, "bias"),
                         _np(self._fetch(f"{torch_prefix}.bias")))

    def raw(self, flax_path, torch_key, transform=None):
        if self.synth and transform is None:
            self._ensure(torch_key,
                         self._template_leaf("params", flax_path).shape)
        v = _np(self._fetch(torch_key))
        if transform is not None:
            v = transform(v)
        self._assign(self.params, flax_path, v)

    def batchnorm(self, flax_path, torch_prefix):
        if self.synth:
            c = self._template_leaf("params", (*flax_path, "scale")).shape
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                self._ensure(f"{torch_prefix}.{suffix}", c)
        self._assign(self.params, (*flax_path, "scale"),
                     _np(self._fetch(f"{torch_prefix}.weight")))
        self._assign(self.params, (*flax_path, "bias"),
                     _np(self._fetch(f"{torch_prefix}.bias")))
        self._assign(self.stats, (*flax_path, "mean"),
                     _np(self._fetch(f"{torch_prefix}.running_mean")))
        self._assign(self.stats, (*flax_path, "var"),
                     _np(self._fetch(f"{torch_prefix}.running_var")))

    def layernorm(self, flax_path, torch_prefix):
        if self.synth:
            c = self._template_leaf("params", (*flax_path, "scale")).shape
            self._ensure(f"{torch_prefix}.weight", c)
            self._ensure(f"{torch_prefix}.bias", c)
        self._assign(self.params, (*flax_path, "scale"),
                     _np(self._fetch(f"{torch_prefix}.weight")))
        self._assign(self.params, (*flax_path, "bias"),
                     _np(self._fetch(f"{torch_prefix}.bias")))

    def mha(self, flax_path, heads, qkv_w, qkv_b, out_w, out_b):
        """Packed torch attention (in_proj / fused qkv [3D, D] + out proj)
        -> flax ``nn.MultiHeadDotProductAttention`` params
        (query/key/value kernels [D, H, Dh], out kernel [H, Dh, D])."""
        if self.synth:
            d, h, dh = self._template_leaf(
                "params", (*flax_path, "query", "kernel")).shape
            self._ensure(qkv_w, (3 * d, d))
            self._ensure(qkv_b, (3 * d,))
            self._ensure(out_w, (d, d))
            self._ensure(out_b, (d,))
        w = _np(self._fetch(qkv_w))       # [3D, D]
        b = _np(self._fetch(qkv_b))       # [3D]
        d = w.shape[1]
        dh = d // heads
        for i, name in enumerate(("query", "key", "value")):
            wi = w[i * d:(i + 1) * d]     # torch [out, in]
            self._assign(self.params, (*flax_path, name, "kernel"),
                         wi.T.reshape(d, heads, dh))
            self._assign(self.params, (*flax_path, name, "bias"),
                         b[i * d:(i + 1) * d].reshape(heads, dh))
        wo = _np(self._fetch(out_w))      # [D, D], y = x @ wo.T
        self._assign(self.params, (*flax_path, "out", "kernel"),
                     wo.T.reshape(heads, dh, d))
        self._assign(self.params, (*flax_path, "out", "bias"),
                     _np(self._fetch(out_b)))

    def variables(self):
        out = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        return out


class InverseConverter(Converter):
    """flax variables -> torch state dict, through the SAME mapping walks.

    Every layout rule in :class:`Converter` is applied in reverse; calling
    e.g. ``_walk_stcn(InverseConverter(variables))`` produces a state dict
    the reference's torch modules load directly.  Used by the bench's
    production-geometry quality check: fit the flax net, export to torch,
    run both stacks on identical (non-degenerate) weights.
    """

    def __init__(self, variables):
        super().__init__(torch_sd={}, template=variables)
        self.synth = False

    def _leaf(self, collection, path):
        node = self.template[collection]
        for p in path:
            node = node[p]
        return np.asarray(node, np.float32)

    def conv(self, flax_path, torch_prefix, bias=True):
        k = self._leaf("params", (*flax_path, "kernel"))
        self.sd[f"{torch_prefix}.weight"] = k.transpose(3, 2, 0, 1).copy()
        if bias:
            self.sd[f"{torch_prefix}.bias"] = self._leaf(
                "params", (*flax_path, "bias"))

    def conv_transpose(self, flax_path, torch_prefix, bias=True):
        k = self._leaf("params", (*flax_path, "kernel"))
        self.sd[f"{torch_prefix}.weight"] = (
            k[::-1, ::-1].transpose(2, 3, 0, 1).copy())
        if bias:
            self.sd[f"{torch_prefix}.bias"] = self._leaf(
                "params", (*flax_path, "bias"))

    def linear(self, flax_path, torch_prefix, bias=True):
        k = self._leaf("params", (*flax_path, "kernel"))
        self.sd[f"{torch_prefix}.weight"] = k.T.copy()
        if bias:
            self.sd[f"{torch_prefix}.bias"] = self._leaf(
                "params", (*flax_path, "bias"))

    def raw(self, flax_path, torch_key, transform=None):
        if transform is not None:
            raise NotImplementedError(
                f"inverse of transformed raw assign for {torch_key}")
        self.sd[torch_key] = self._leaf("params", flax_path)

    def batchnorm(self, flax_path, torch_prefix):
        self.sd[f"{torch_prefix}.weight"] = self._leaf(
            "params", (*flax_path, "scale"))
        self.sd[f"{torch_prefix}.bias"] = self._leaf(
            "params", (*flax_path, "bias"))
        self.sd[f"{torch_prefix}.running_mean"] = self._leaf(
            "batch_stats", (*flax_path, "mean"))
        self.sd[f"{torch_prefix}.running_var"] = self._leaf(
            "batch_stats", (*flax_path, "var"))
        self.sd[f"{torch_prefix}.num_batches_tracked"] = np.asarray(
            0, np.int64)

    def layernorm(self, flax_path, torch_prefix):
        self.sd[f"{torch_prefix}.weight"] = self._leaf(
            "params", (*flax_path, "scale"))
        self.sd[f"{torch_prefix}.bias"] = self._leaf(
            "params", (*flax_path, "bias"))

    def state_dict(self):
        return dict(self.sd)


def _exists(cv: Converter, flax_path, torch_key) -> bool:
    """Does this optional submodule exist?  Template-driven whenever a flax
    template is available (synthesis and inverse modes); otherwise by torch
    key presence."""
    if cv.template is not None:
        node = cv.template["params"]
        try:
            for part in flax_path:
                node = node[part]
            return True
        except (KeyError, TypeError):
            return False
    return torch_key in cv.sd


# ---------------------------------------------------------------------------
# ResNet trunks
# ---------------------------------------------------------------------------

_TV_LAYERS = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3),
              "resnet101": (3, 4, 23, 3)}
_BOTTLENECK = {"resnet50", "resnet101"}


def convert_resnet_trunk(cv: Converter, flax_prefix, torch_prefix, arch,
                         num_stages, conv_bias, stage_names=None):
    """stage_names: torch attribute names per stage (the reference's
    KeyEncoder calls layer1 'res2'); defaults to layer1..layerN."""
    layers = _TV_LAYERS[arch]
    bottleneck = arch in _BOTTLENECK
    stage_names = stage_names or [f"layer{s + 1}" for s in range(num_stages)]

    cv.conv((*flax_prefix, "conv1"), f"{torch_prefix}.conv1", bias=conv_bias)
    cv.batchnorm((*flax_prefix, "bn1", "bn"), f"{torch_prefix}.bn1")

    for s in range(num_stages):
        for b in range(layers[s]):
            fb = (*flax_prefix, f"layer{s + 1}_{b}")
            tb = f"{torch_prefix}.{stage_names[s]}.{b}"
            n_convs = 3 if bottleneck else 2
            for ci in range(1, n_convs + 1):
                cv.conv((*fb, f"conv{ci}"), f"{tb}.conv{ci}", bias=conv_bias)
                cv.batchnorm((*fb, f"bn{ci}", "bn"), f"{tb}.bn{ci}")
            if _exists(cv, (*fb, "downsample_conv"), f"{tb}.downsample.0.weight"):
                cv.conv((*fb, "downsample_conv"), f"{tb}.downsample.0",
                        bias=conv_bias)
                cv.batchnorm((*fb, "downsample_bn", "bn"), f"{tb}.downsample.1")


def _convert_resblock(cv, flax_prefix, torch_prefix, has_downsample=None):
    cv.conv((*flax_prefix, "conv1"), f"{torch_prefix}.conv1")
    cv.conv((*flax_prefix, "conv2"), f"{torch_prefix}.conv2")
    if has_downsample is None:
        has_downsample = _exists(cv, (*flax_prefix, "downsample"),
                                 f"{torch_prefix}.downsample.weight")
    if has_downsample:
        cv.conv((*flax_prefix, "downsample"), f"{torch_prefix}.downsample")


def _convert_cbam(cv, flax_prefix, torch_prefix):
    cv.linear((*flax_prefix, "channel_gate", "mlp_1"),
              f"{torch_prefix}.ChannelGate.mlp.1")
    cv.linear((*flax_prefix, "channel_gate", "mlp_2"),
              f"{torch_prefix}.ChannelGate.mlp.3")
    cv.conv((*flax_prefix, "spatial_gate", "spatial"),
            f"{torch_prefix}.SpatialGate.spatial.conv")


def _convert_fuser(cv, flax_prefix, torch_prefix):
    _convert_resblock(cv, (*flax_prefix, "block1"), f"{torch_prefix}.block1",
                      has_downsample=True)
    _convert_cbam(cv, (*flax_prefix, "attention"), f"{torch_prefix}.attention")
    _convert_resblock(cv, (*flax_prefix, "block2"), f"{torch_prefix}.block2",
                      has_downsample=False)


def _walk_stcn(cv: Converter, key_arch="resnet50", value_arch="resnet18"):
    convert_resnet_trunk(cv, ("key_encoder", "trunk"), "key_encoder",
                         key_arch, 3, conv_bias=False,
                         stage_names=["res2", "layer2", "layer3"])
    convert_resnet_trunk(cv, ("value_encoder", "trunk"), "value_encoder",
                         value_arch, 3, conv_bias=True)
    _convert_fuser(cv, ("value_encoder", "fuser"), "value_encoder.fuser")
    cv.conv(("key_proj", "key_proj"), "key_proj.key_proj")
    cv.conv(("key_comp",), "key_comp")

    _convert_resblock(cv, ("decoder", "compress"), "decoder.compress",
                      has_downsample=True)
    for up in ("up_16_8", "up_8_4"):
        cv.conv(("decoder", up, "skip_conv"), f"decoder.{up}.skip_conv")
        _convert_resblock(cv, ("decoder", up, "out_conv"),
                          f"decoder.{up}.out_conv")
    cv.conv(("decoder", "pred"), "decoder.pred")


def _walk_fusion(cv: Converter):
    cv.conv(("conv1",), "conv1.0")
    cv.conv(("conv2_0",), "conv2.0")
    cv.conv(("conv2_1",), "conv2.2")
    cv.conv(("conv3_0",), "conv3.0")
    cv.conv(("conv3_1",), "conv3.2")
    cv.conv(("final_conv",), "final_conv")


def convert_stcn(torch_sd, template=None) -> dict:
    """stcn.pth -> PropagationNetwork variables."""
    cv = Converter(torch_sd, template=template)
    _walk_stcn(cv)
    return cv.variables()


def invert_stcn(variables, key_arch="resnet50", value_arch="resnet18") -> dict:
    """PropagationNetwork variables -> reference-layout torch state dict."""
    cv = InverseConverter(variables)
    _walk_stcn(cv, key_arch=key_arch, value_arch=value_arch)
    return cv.state_dict()


def convert_fusion(torch_sd, template=None) -> dict:
    """fusion.pth -> FusionNet variables."""
    cv = Converter(torch_sd, template=template)
    _walk_fusion(cv)
    return cv.variables()


def invert_fusion(variables) -> dict:
    """FusionNet variables -> reference-layout torch state dict."""
    cv = InverseConverter(variables)
    _walk_fusion(cv)
    return cv.state_dict()


def convert_cnn_branch(cv: Converter, flax_prefix, torch_prefix, arch):
    num_stages = 3 if arch == "small" else 4
    tv_arch = "resnet50" if arch == "small" else arch
    convert_resnet_trunk(cv, (*flax_prefix, "trunk"), torch_prefix, tv_arch,
                         num_stages, conv_bias=False)


def convert_qnet(torch_sd, arch="resnet18", template=None) -> dict:
    """qnet.pth -> QualityNet variables."""
    cv = Converter(torch_sd, template=template)
    convert_cnn_branch(cv, ("rgb_branch",), "rgb_branch", arch)
    convert_cnn_branch(cv, ("mask_branch",), "mask_branch", arch)
    cv.linear(("out_layer",), "out_layer")
    return cv.variables()


def convert_actor_critic(torch_sd, arch="resnet18", template=None) -> dict:
    """rl_agent/model.pth -> ActorCritic variables."""
    cv = Converter(torch_sd, template=template)
    convert_cnn_branch(cv, ("mask_branch",), "mask_branch", arch)
    cv.linear(("embed_proj",), "embed_branch.2")
    cv.linear(("policy",), "policy")
    cv.linear(("value",), "value")
    if _exists(cv, ("cost_proj",), "cost_branch.0.weight"):
        cv.linear(("cost_proj",), "cost_branch.0")
    return cv.variables()


# ---------------------------------------------------------------------------
# Feature extractors (torchvision ResNet / torchvision ViT / DINOv2)
# ---------------------------------------------------------------------------

def convert_tv_resnet(torch_sd, arch="resnet18", template=None) -> dict:
    """torchvision resnetXX state dict -> ``ResNetTrunk(num_stages=4)``
    variables (reference ``feature_extractors/resnet.py:5-40``; the
    extractor hooks layer4, so fc/avgpool weights are ignored)."""
    sd = None if torch_sd is None else {
        f"m.{k}": v for k, v in torch_sd.items()}
    cv = Converter(sd, template=template)
    convert_resnet_trunk(cv, (), "m", arch, 4, conv_bias=False)
    return cv.variables()


def convert_tv_vit(torch_sd, depth=12, heads=12, template=None) -> dict:
    """torchvision vit_b/l_16 state dict -> ``ViTEncoder`` variables
    (reference ``feature_extractors/vit.py:7-37``: encoder output hook,
    cls token; classification head ignored)."""
    cv = Converter(torch_sd, template=template)
    cv.conv(("patch_embed",), "conv_proj")
    cv.raw(("cls_token",), "class_token")
    cv.raw(("pos_embed",), "encoder.pos_embedding")
    for i in range(depth):
        fb = (f"block_{i}",)
        tb = f"encoder.layers.encoder_layer_{i}"
        cv.layernorm((*fb, "norm1"), f"{tb}.ln_1")
        cv.mha((*fb, "attn"), heads,
               f"{tb}.self_attention.in_proj_weight",
               f"{tb}.self_attention.in_proj_bias",
               f"{tb}.self_attention.out_proj.weight",
               f"{tb}.self_attention.out_proj.bias")
        cv.layernorm((*fb, "norm2"), f"{tb}.ln_2")
        cv.linear((*fb, "mlp_lin1"), f"{tb}.mlp.0")
        cv.linear((*fb, "mlp_lin2"), f"{tb}.mlp.3")
    cv.layernorm(("norm",), "encoder.ln")
    return cv.variables()


def convert_dinov2(torch_sd, depth=24, heads=16, template=None) -> dict:
    """DINOv2 (facebookresearch/dinov2 torch.hub) state dict ->
    ``ViTEncoder(layerscale=True)`` variables (reference
    ``feature_extractors/dino.py:6-37``: model(X) returns the normalized
    cls token)."""
    cv = Converter(torch_sd, template=template)
    cv.conv(("patch_embed",), "patch_embed.proj")
    cv.raw(("cls_token",), "cls_token")
    cv.raw(("pos_embed",), "pos_embed")
    for i in range(depth):
        fb = (f"block_{i}",)
        tb = f"blocks.{i}"
        cv.layernorm((*fb, "norm1"), f"{tb}.norm1")
        cv.mha((*fb, "attn"), heads,
               f"{tb}.attn.qkv.weight", f"{tb}.attn.qkv.bias",
               f"{tb}.attn.proj.weight", f"{tb}.attn.proj.bias")
        cv.raw((*fb, "gamma1"), f"{tb}.ls1.gamma")
        cv.layernorm((*fb, "norm2"), f"{tb}.norm2")
        cv.linear((*fb, "mlp_lin1"), f"{tb}.mlp.fc1")
        cv.linear((*fb, "mlp_lin2"), f"{tb}.mlp.fc2")
        cv.raw((*fb, "gamma2"), f"{tb}.ls2.gamma")
    cv.layernorm(("norm",), "norm")
    return cv.variables()


# ---------------------------------------------------------------------------
# SAM
# ---------------------------------------------------------------------------

def infer_sam_dims(torch_sd) -> dict:
    """(depth, decoder_depth, num_mask_tokens) from an official
    segment-anything checkpoint's keys — lets ``convert_sam`` handle
    vit_b/l/h (or test-sized) checkpoints without being told the preset."""
    def max_block(prefix):
        idx = [int(k[len(prefix):].split(".")[0]) for k in torch_sd
               if k.startswith(prefix)]
        return max(idx) + 1 if idx else 0

    return {
        "depth": max_block("image_encoder.blocks."),
        "decoder_depth": max_block("mask_decoder.transformer.layers."),
        "num_mask_tokens":
            np.asarray(torch_sd["mask_decoder.mask_tokens.weight"]).shape[0],
    }


def convert_sam(torch_sd, depth=32, decoder_depth=2, num_mask_tokens=4, template=None) -> dict:
    """sam.pth (official vit_h/l/b checkpoint) -> Sam variables."""
    cv = Converter(torch_sd, template=template)
    _convert_sam_into(cv, depth, decoder_depth, num_mask_tokens)
    return cv.variables()


def synthesize_sam_checkpoint(template, depth, decoder_depth=2,
                              num_mask_tokens=4, seed=0):
    """Fabricate an official-layout segment-anything state dict matching a
    flax template (tests / download_weights --check without egress)."""
    cv = Converter(None, template=template, seed=seed)
    _convert_sam_into(cv, depth, decoder_depth, num_mask_tokens)
    return dict(cv.sd)


def _convert_sam_into(cv: Converter, depth, decoder_depth, num_mask_tokens):

    enc = ("image_encoder",)
    cv.conv((*enc, "patch_embed"), "image_encoder.patch_embed.proj")
    if _exists(cv, (*enc, "pos_embed"), "image_encoder.pos_embed"):
        cv.raw((*enc, "pos_embed"), "image_encoder.pos_embed")
    for i in range(depth):
        fb = (*enc, f"block_{i}")
        tb = f"image_encoder.blocks.{i}"
        cv.layernorm((*fb, "norm1"), f"{tb}.norm1")
        cv.layernorm((*fb, "norm2"), f"{tb}.norm2")
        cv.linear((*fb, "attn", "qkv"), f"{tb}.attn.qkv")
        cv.linear((*fb, "attn", "proj"), f"{tb}.attn.proj")
        cv.raw((*fb, "attn", "rel_pos_h"), f"{tb}.attn.rel_pos_h")
        cv.raw((*fb, "attn", "rel_pos_w"), f"{tb}.attn.rel_pos_w")
        cv.linear((*fb, "mlp", "lin1"), f"{tb}.mlp.lin1")
        cv.linear((*fb, "mlp", "lin2"), f"{tb}.mlp.lin2")
    cv.conv((*enc, "neck_conv1"), "image_encoder.neck.0", bias=False)
    cv.layernorm((*enc, "neck_ln1"), "image_encoder.neck.1")
    cv.conv((*enc, "neck_conv2"), "image_encoder.neck.2", bias=False)
    cv.layernorm((*enc, "neck_ln2"), "image_encoder.neck.3")

    pe = ("prompt_encoder",)
    cv.raw((*pe, "pe_layer", "positional_encoding_gaussian_matrix"),
           "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix")
    if cv.synth:
        c = cv._template_leaf("params", (*pe, "point_embeddings")).shape[1]
        for i in range(4):
            cv._ensure(f"prompt_encoder.point_embeddings.{i}.weight", (1, c))
    point_embs = np.stack([
        _np(cv._fetch(f"prompt_encoder.point_embeddings.{i}.weight"))[0]
        for i in range(4)])
    cv._assign(cv.params, (*pe, "point_embeddings"), point_embs)
    cv.raw((*pe, "not_a_point_embed"),
           "prompt_encoder.not_a_point_embed.weight")
    cv.raw((*pe, "no_mask_embed"), "prompt_encoder.no_mask_embed.weight")
    cv.conv((*pe, "mask_conv1"), "prompt_encoder.mask_downscaling.0")
    cv.layernorm((*pe, "mask_ln1"), "prompt_encoder.mask_downscaling.1")
    cv.conv((*pe, "mask_conv2"), "prompt_encoder.mask_downscaling.3")
    cv.layernorm((*pe, "mask_ln2"), "prompt_encoder.mask_downscaling.4")
    cv.conv((*pe, "mask_conv3"), "prompt_encoder.mask_downscaling.6")

    md = ("mask_decoder",)
    cv.raw((*md, "iou_token"), "mask_decoder.iou_token.weight")
    cv.raw((*md, "mask_tokens"), "mask_decoder.mask_tokens.weight")
    tr = (*md, "transformer")
    for i in range(decoder_depth):
        fb = (*tr, f"layer_{i}")
        tb = f"mask_decoder.transformer.layers.{i}"
        for attn in ("self_attn", "cross_attn_token_to_image",
                     "cross_attn_image_to_token"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                cv.linear((*fb, attn, proj), f"{tb}.{attn}.{proj}")
        for norm in ("norm1", "norm2", "norm3", "norm4"):
            cv.layernorm((*fb, norm), f"{tb}.{norm}")
        cv.linear((*fb, "mlp_lin1"), f"{tb}.mlp.lin1")
        cv.linear((*fb, "mlp_lin2"), f"{tb}.mlp.lin2")
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        cv.linear((*tr, "final_attn_token_to_image", proj),
                  f"mask_decoder.transformer.final_attn_token_to_image.{proj}")
    cv.layernorm((*tr, "norm_final_attn"),
                 "mask_decoder.transformer.norm_final_attn")

    cv.conv_transpose((*md, "upscale_conv1"), "mask_decoder.output_upscaling.0")
    cv.layernorm((*md, "upscale_ln"), "mask_decoder.output_upscaling.1")
    cv.conv_transpose((*md, "upscale_conv2"), "mask_decoder.output_upscaling.3")
    for i in range(num_mask_tokens):
        for j in range(3):
            cv.linear((*md, f"output_hypernetworks_mlps_{i}", f"layers_{j}"),
                      f"mask_decoder.output_hypernetworks_mlps.{i}.layers.{j}")
    for j in range(3):
        cv.linear((*md, "iou_prediction_head", f"layers_{j}"),
                  f"mask_decoder.iou_prediction_head.layers.{j}")


def load_torch_state_dict(path):
    """Load a .pth state dict without importing torch at module level."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _np(v) for k, v in sd.items()}


def check_tree_matches(template_vars, converted_vars, collection="params"):
    """Verify the converted tree has exactly the template's structure and
    leaf shapes; returns a list of problems (empty = OK)."""
    import jax

    problems = []

    t_flat = {
        jax.tree_util.keystr(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(
            template_vars.get(collection, {}))[0]}
    c_flat = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(
            converted_vars.get(collection, {}))[0]}

    for k, shape in t_flat.items():
        if k not in c_flat:
            problems.append(f"missing {collection}{k}")
        elif tuple(c_flat[k]) != tuple(shape):
            problems.append(
                f"shape mismatch {collection}{k}: template {shape}, "
                f"converted {c_flat[k]}")
    for k in c_flat:
        if k not in t_flat:
            problems.append(f"unexpected {collection}{k}")
    return problems
