"""Forward parity through the weight converter, against small torch oracles.

These build minimal torch modules with the same wiring as the blocks the
reference composes (pre-activation ResBlock, CBAM gates, the fusion CNN,
a biased-conv BasicBlock with BatchNorm), push their state dicts through
``eva_vos_tpu.utils.weight_convert``, and require the flax modules to
reproduce the torch outputs on random inputs.  This is the offline stand-in
for checkpoint activation-parity tests (SURVEY.md §4.3) — once real
checkpoints exist, the same converter paths load them.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

from eva_vos_tpu.models.layers import ResBlock, CBAM, FeatureFusionBlock
from eva_vos_tpu.models.fusion import FusionNet
from eva_vos_tpu.models.resnet import BasicBlock
from eva_vos_tpu.utils.weight_convert import Converter, convert_fusion


def to_nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def from_flax(y):
    return np.asarray(y)


class TestResBlockParity:
    def test_with_downsample(self, rng):
        # torch oracle: r = conv2(relu(conv1(relu(x)))); skip = conv_d(x)
        c_in, c_out = 6, 10
        conv1 = tnn.Conv2d(c_in, c_out, 3, padding=1)
        conv2 = tnn.Conv2d(c_out, c_out, 3, padding=1)
        down = tnn.Conv2d(c_in, c_out, 3, padding=1)
        x = rng.standard_normal((1, 8, 8, c_in)).astype(np.float32)
        with torch.no_grad():
            xt = to_nchw(x)
            ref = (down(xt) + conv2(tF.relu(conv1(tF.relu(xt)))))
            ref = ref.numpy().transpose(0, 2, 3, 1)

        cv = Converter({f"{n}.{p}": t.detach().numpy()
                        for n, m in [("conv1", conv1), ("conv2", conv2),
                                     ("downsample", down)]
                        for p, t in m.state_dict().items()})
        cv.conv(("conv1",), "conv1")
        cv.conv(("conv2",), "conv2")
        cv.conv(("downsample",), "downsample")
        out = ResBlock(c_out).apply({"params": cv.params}, jnp.asarray(x))
        np.testing.assert_allclose(from_flax(out), ref, rtol=1e-4, atol=1e-5)


class TestCBAMParity:
    def test_channel_and_spatial_gates(self, rng):
        c = 16
        mlp1 = tnn.Linear(c, c // 4)
        mlp2 = tnn.Linear(c // 4, c)
        spatial = tnn.Conv2d(2, 1, 7, padding=3)
        x = rng.standard_normal((1, 6, 6, c)).astype(np.float32)

        with torch.no_grad():
            xt = to_nchw(x)
            avg = xt.mean(dim=(2, 3))
            mx = xt.amax(dim=(2, 3))
            att = mlp2(tF.relu(mlp1(avg))) + mlp2(tF.relu(mlp1(mx)))
            y = xt * torch.sigmoid(att)[:, :, None, None]
            pooled = torch.cat([y.amax(1, keepdim=True),
                                y.mean(1, keepdim=True)], 1)
            ref = y * torch.sigmoid(spatial(pooled))
            ref = ref.numpy().transpose(0, 2, 3, 1)

        cv = Converter({})
        cv.sd = {
            "g.mlp.1.weight": mlp1.weight.detach().numpy(),
            "g.mlp.1.bias": mlp1.bias.detach().numpy(),
            "g.mlp.3.weight": mlp2.weight.detach().numpy(),
            "g.mlp.3.bias": mlp2.bias.detach().numpy(),
            "g.spatial.conv.weight": spatial.weight.detach().numpy(),
            "g.spatial.conv.bias": spatial.bias.detach().numpy(),
        }
        cv.linear(("channel_gate", "mlp_1"), "g.mlp.1")
        cv.linear(("channel_gate", "mlp_2"), "g.mlp.3")
        cv.conv(("spatial_gate", "spatial"), "g.spatial.conv")

        out = CBAM(c, reduction_ratio=4).apply({"params": cv.params},
                                               jnp.asarray(x))
        np.testing.assert_allclose(from_flax(out), ref, rtol=1e-4, atol=1e-5)


class TestBasicBlockParity:
    def test_biased_convs_with_bn_eval(self, rng):
        """mod_resnet-style BasicBlock (biased convs) in eval mode."""
        c_in, c_out = 4, 8
        conv1 = tnn.Conv2d(c_in, c_out, 3, padding=1, stride=2)
        bn1 = tnn.BatchNorm2d(c_out).eval()
        conv2 = tnn.Conv2d(c_out, c_out, 3, padding=1)
        bn2 = tnn.BatchNorm2d(c_out).eval()
        dconv = tnn.Conv2d(c_in, c_out, 1, stride=2)
        dbn = tnn.BatchNorm2d(c_out).eval()
        for bn in (bn1, bn2, dbn):
            bn.running_mean.normal_()
            bn.running_var.uniform_(0.5, 2.0)

        x = rng.standard_normal((1, 10, 10, c_in)).astype(np.float32)
        with torch.no_grad():
            xt = to_nchw(x)
            out = tF.relu(bn1(conv1(xt)))
            out = bn2(conv2(out))
            ref = tF.relu(out + dbn(dconv(xt))).numpy().transpose(0, 2, 3, 1)

        sd = {}
        for name, mod in [("conv1", conv1), ("bn1", bn1), ("conv2", conv2),
                          ("bn2", bn2), ("downsample.0", dconv),
                          ("downsample.1", dbn)]:
            for p, t in mod.state_dict().items():
                if "num_batches" in p:
                    continue
                sd[f"b.{name}.{p}"] = t.detach().numpy()
        cv = Converter(sd)
        cv.conv(("conv1",), "b.conv1")
        cv.batchnorm(("bn1", "bn"), "b.bn1")
        cv.conv(("conv2",), "b.conv2")
        cv.batchnorm(("bn2", "bn"), "b.bn2")
        cv.conv(("downsample_conv",), "b.downsample.0")
        cv.batchnorm(("downsample_bn", "bn"), "b.downsample.1")

        blk = BasicBlock(planes=c_out, stride=2, has_downsample=True,
                         conv_bias=True)
        out = blk.apply({"params": cv.params, "batch_stats": cv.stats},
                        jnp.asarray(x))
        np.testing.assert_allclose(from_flax(out), ref, rtol=1e-4, atol=1e-4)


class TestFusionNetParity:
    def test_full_forward(self, rng):
        """The 9-channel fusion CNN against a torch oracle with the
        reference's exact wiring (conv1 -> two residual stages -> final)."""
        tconv1 = tnn.Conv2d(9, 32, 3, padding=1)
        tconv2a = tnn.Conv2d(32, 32, 3, padding=1)
        tconv2b = tnn.Conv2d(32, 32, 3, padding=1)
        tconv3a = tnn.Conv2d(32, 32, 3, padding=1)
        tconv3b = tnn.Conv2d(32, 32, 3, padding=1)
        tfinal = tnn.Conv2d(32, 1, 3, padding=1)

        h, w = 12, 16
        im = rng.standard_normal((h, w, 3)).astype(np.float32)
        seg1 = rng.uniform(size=(h, w)).astype(np.float32)
        seg2 = rng.uniform(size=(h, w)).astype(np.float32)
        attn = rng.standard_normal((h, w, 2)).astype(np.float32)
        tvec = np.asarray([0.25, 0.75], np.float32)

        with torch.no_grad():
            t_in = torch.cat([
                to_nchw(im[None]),
                torch.from_numpy(seg1)[None, None],
                torch.from_numpy(seg2)[None, None],
                to_nchw(attn[None]),
                torch.from_numpy(np.broadcast_to(
                    tvec[:, None, None], (2, h, w)).copy())[None],
            ], 1)
            xt = tF.relu(tconv1(t_in))
            r = tconv2b(tF.relu(tconv2a(xt)))
            xt = tF.relu(xt + r)
            r = tconv3b(tF.relu(tconv3a(xt)))
            xt = tF.relu(xt + r)
            ref = tfinal(xt).numpy()[0, 0]

        sd = {}
        for name, mod in [("conv1.0", tconv1), ("conv2.0", tconv2a),
                          ("conv2.2", tconv2b), ("conv3.0", tconv3a),
                          ("conv3.2", tconv3b), ("final_conv", tfinal)]:
            for p, t in mod.state_dict().items():
                sd[f"{name}.{p}"] = t.detach().numpy()
        variables = convert_fusion(sd)
        variables = {"params": variables["params"]}

        out = FusionNet().apply(variables, jnp.asarray(im),
                                jnp.asarray(seg1), jnp.asarray(seg2),
                                jnp.asarray(attn), jnp.asarray(tvec))
        np.testing.assert_allclose(from_flax(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
class TestDeepQualityPath:
    """bench.deep_quality end-to-end at tiny geometry: brief fit, inverse
    export to the reference torch nets, matched episode, J&F deltas
    (VERDICT r2 #2's machinery, CPU-sized)."""

    def test_fit_invert_episode(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import bench
        import jax
        import jax.numpy as jnp
        from eva_vos_tpu.models import PropagationNetwork, FusionNet
        from eva_vos_tpu.engine import InferenceEngine
        from eva_vos_tpu.engine.propagation import (EngineConfig,
                                                    prepare_video)
        from eva_vos_tpu.data import synthetic_video

        t, h, w = 6, 48, 64
        top_k = 8
        fitted = bench.fit_stcn_briefly(steps=8, t=4, h=48, w=48)
        f_fuse = FusionNet(dtype=jnp.float32)
        fuse_vars = f_fuse.init(
            jax.random.PRNGKey(1), jnp.zeros((h, w, 3)), jnp.zeros((h, w)),
            jnp.zeros((h, w)), jnp.zeros((h, w, 2)), jnp.zeros((2,)))
        fuse_np = jax.tree.map(np.asarray, fuse_vars)

        stcn = PropagationNetwork(top_k=top_k, dtype=jnp.float32)
        sp = jax.tree.map(jnp.asarray, fitted)
        engine = InferenceEngine(
            stcn, FusionNet(dtype=jnp.float32), sp,
            jax.tree.map(jnp.asarray, fuse_np),
            EngineConfig(mem_freq=5, top_k=top_k, max_interactions=4,
                         feature_chunk=2))
        images, gt = synthetic_video(t, h, w, num_objects=1, seed=0)
        padded, pad = prepare_video(images, dtype=jnp.float32)
        feats = engine.precompute_features(padded)

        out = bench.deep_quality(engine, feats, images, gt, pad, fitted,
                                 fuse_np, interactions=(0, None, 2),
                                 top_k=top_k)
        assert out, "deep_quality returned empty (torch/reference missing?)"
        assert "j_and_f_delta" in out
        # matched weights through both stacks: tiny episode must agree
        assert abs(out["j_and_f_delta"]) < 0.05, out
        assert out["mask_agreement_prod"] > 0.95, out
