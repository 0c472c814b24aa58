"""Shape/sanity tests for the Flax model zoo (tiny inputs, random init)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eva_vos_tpu.models import PropagationNetwork, FusionNet, QualityNet, ActorCritic
from eva_vos_tpu.models.resnet import ResNetTrunk, feature_dims


H, W = 48, 64  # multiple of 16


@pytest.fixture(scope="module")
def stcn():
    """Tiny STCN (resnet18 trunks) with initialized params."""
    net = PropagationNetwork(key_arch="resnet18", value_arch="resnet18")
    frame = jnp.zeros((H, W, 3))
    masks = jnp.zeros((2, H, W))
    params = net.init(jax.random.PRNGKey(0), frame, masks, method="init_all")
    return net, params


class TestResNet:
    def test_resnet18_stage_shapes(self):
        trunk = ResNetTrunk(arch="resnet18", num_stages=4)
        x = jnp.zeros((1, 64, 64, 3))
        params = trunk.init(jax.random.PRNGKey(0), x)
        feats = trunk.apply(params, x)
        assert [f.shape for f in feats] == [
            (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]

    def test_resnet50_dims(self):
        assert feature_dims("resnet50", 3) == [256, 512, 1024]
        assert feature_dims("resnet18", 4) == [64, 128, 256, 512]

    def test_batchnorm_train_mode_mutates_stats(self):
        trunk = ResNetTrunk(arch="resnet18", num_stages=1)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                        jnp.float32)
        variables = trunk.init(jax.random.PRNGKey(0), x)
        _, mutated = trunk.apply(variables, x, True, mutable=["batch_stats"])
        before = variables["batch_stats"]["bn1"]["bn"]["mean"]
        after = mutated["batch_stats"]["bn1"]["bn"]["mean"]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestSTCN:
    def test_encode_key_shapes(self, stcn):
        net, params = stcn
        feats = net.apply(params, jnp.zeros((2, H, W, 3)), method="encode_key")
        assert feats.k16.shape == (2, H // 16, W // 16, 64)
        assert feats.f16_thin.shape == (2, H // 16, W // 16, 512)
        assert feats.f16.shape == (2, H // 16, W // 16, 256)  # resnet18 trunk
        assert feats.f8.shape == (2, H // 8, W // 8, 128)
        assert feats.f4.shape == (2, H // 4, W // 4, 64)

    def test_precomputed_skips_identity(self, stcn, rng):
        """decode(f8, f4) == decode(skip8, skip4, skips_precomputed=True):
        the engine's hoisted skip convs are the same math."""
        net, params = stcn
        frame = jnp.asarray(rng.standard_normal((H, W, 3)), jnp.float32)
        feats = net.apply(params, frame[None], method="encode_key")
        ro = jnp.asarray(rng.standard_normal(
            (1, H // 16, W // 16, net.value_dim)), jnp.float32)
        ref = net.apply(params, ro, feats.f16_thin[0], feats.f8[0],
                        feats.f4[0], method="decode_with_readout")
        s8, s4 = net.apply(params, feats.f8, feats.f4,
                           method="encode_skips")
        hoisted = net.apply(params, ro, feats.f16_thin[0], s8[0], s4[0],
                            skips_precomputed=True,
                            method="decode_with_readout")
        np.testing.assert_allclose(np.asarray(hoisted), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_encode_value_multiobject_others(self, stcn):
        net, params = stcn
        frame = jnp.zeros((H, W, 3))
        kf16 = jnp.zeros((H // 16, W // 16, 256))
        masks = jnp.asarray(np.random.default_rng(0).uniform(size=(3, H, W)),
                            jnp.float32)
        v = net.apply(params, frame, kf16, masks, method="encode_value")
        assert v.shape == (3, H // 16, W // 16, 512)

    def test_decode_shapes_and_range(self, stcn):
        net, params = stcn
        h16, w16 = H // 16, W // 16
        readout = jnp.zeros((2, h16, w16, 512))
        qv = jnp.zeros((h16, w16, 512))
        f8 = jnp.zeros((H // 8, W // 8, 128))
        f4 = jnp.zeros((H // 4, W // 4, 64))
        prob = net.apply(params, readout, qv, f8, f4, method="decode_with_readout")
        assert prob.shape == (2, H, W)
        p = np.asarray(prob)
        assert (p >= 0).all() and (p <= 1).all()

    def test_get_attention(self, stcn):
        net, params = stcn
        h16, w16 = H // 16, W // 16
        mk = jnp.asarray(np.random.default_rng(1).standard_normal((h16, w16, 64)),
                         jnp.float32)
        qk = jnp.asarray(np.random.default_rng(2).standard_normal((h16, w16, 64)),
                         jnp.float32)
        pos = jnp.zeros((1, H, W)).at[:, :10, :10].set(1.0)
        neg = jnp.zeros((1, H, W))
        attn = net.apply(params, mk, pos, neg, qk, method="get_attention")
        assert attn.shape == (1, H, W, 2)
        a = np.asarray(attn)
        # positive map integrates mass from the pos mask; negative map is 0
        assert a[..., 0].max() > 0
        np.testing.assert_allclose(a[..., 1], 0.0, atol=1e-6)


class TestFusionNet:
    def test_forward(self):
        net = FusionNet()
        im = jnp.zeros((H, W, 3))
        seg = jnp.zeros((H, W))
        attn = jnp.zeros((H, W, 2))
        time = jnp.asarray([0.3, 0.7])
        params = net.init(jax.random.PRNGKey(0), im, seg, seg, attn, time)
        out = net.apply(params, im, seg, seg, attn, time)
        assert out.shape == (H, W)

    def test_batched(self):
        net = FusionNet()
        im = jnp.zeros((4, H, W, 3))
        seg = jnp.zeros((4, H, W))
        attn = jnp.zeros((4, H, W, 2))
        time = jnp.zeros((4, 2))
        params = net.init(jax.random.PRNGKey(0), im, seg, seg, attn, time)
        assert net.apply(params, im, seg, seg, attn, time).shape == (4, H, W)

    @pytest.mark.parametrize("s", [2, 4])
    def test_packed_execution_matches_module(self, rng, s):
        """The space-to-depth fast path is the same sum re-associated
        (s=2: 128-ch convs at 1/4 area; s=4: 512-ch at 1/16)."""
        from eva_vos_tpu.models.fusion import fusion_apply_packed

        net = FusionNet()
        im = jnp.asarray(rng.standard_normal((3, H, W, 3)), jnp.float32)
        s1 = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
        s2 = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
        attn = jnp.asarray(rng.standard_normal((3, H, W, 2)), jnp.float32)
        time = jnp.asarray(rng.uniform(size=(3, 2)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), im[0], s1[0], s2[0],
                          attn[0], time[0])
        ref = net.apply(params, im, s1, s2, attn, time)
        packed = fusion_apply_packed(params, im, s1, s2, attn, time, s=s)
        assert packed.shape == ref.shape
        np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        # unbatched call (the engine vmaps over objects)
        ref1 = net.apply(params, im[0], s1[0], s2[0], attn[0], time[0])
        packed1 = fusion_apply_packed(params, im[0], s1[0], s2[0], attn[0],
                                      time[0], s=s)
        np.testing.assert_allclose(np.asarray(packed1), np.asarray(ref1),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_phase_gemm_matches_module(self, rng):
        """The phase-GEMM fast path (nine tight dense blocks, the unpacked
        conv's exact MAC count) equals the module numerically."""
        from eva_vos_tpu.models.fusion import fusion_apply_phase_gemm

        net = FusionNet()
        im = jnp.asarray(rng.standard_normal((3, H, W, 3)), jnp.float32)
        s1 = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
        s2 = jnp.asarray(rng.uniform(size=(3, H, W)), jnp.float32)
        attn = jnp.asarray(rng.standard_normal((3, H, W, 2)), jnp.float32)
        time = jnp.asarray(rng.uniform(size=(3, 2)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), im[0], s1[0], s2[0],
                          attn[0], time[0])
        ref = net.apply(params, im, s1, s2, attn, time)
        got = fusion_apply_phase_gemm(params, im, s1, s2, attn, time)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        ref1 = net.apply(params, im[0], s1[0], s2[0], attn[0], time[0])
        got1 = fusion_apply_phase_gemm(params, im[0], s1[0], s2[0], attn[0],
                                       time[0])
        np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                                   rtol=1e-5, atol=1e-5)


class TestQNet:
    def test_logits_and_features(self):
        net = QualityNet(arch="resnet18", n_labels=20)
        x = jnp.zeros((2, 64, 64, 3))
        params = net.init(jax.random.PRNGKey(0), x, x)
        logits = net.apply(params, x, x)
        assert logits.shape == (2, 20)
        feats = net.apply(params, x, x, method="extract_features")
        assert feats.shape == (2, 1024)  # cat of two 512-d branches

    def test_add_merge(self):
        net = QualityNet(arch="resnet18", merge_strategy="add")
        x = jnp.zeros((1, 64, 64, 3))
        params = net.init(jax.random.PRNGKey(0), x, x)
        feats = net.apply(params, x, x, method="extract_features")
        assert feats.shape == (1, 512)

    def test_attn_merge(self):
        net = QualityNet(arch="resnet18", merge_strategy="attn")
        x = jnp.zeros((2, 64, 64, 3))
        params = net.init(jax.random.PRNGKey(0), x, x)
        logits = net.apply(params, x, x)
        assert logits.shape == (2, 20)
        feats = net.apply(params, x, x, method="extract_features")
        assert feats.shape == (2, 512)

    def test_dropout_requires_rng_in_train(self):
        net = QualityNet(arch="resnet18")
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)),
                        jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), x, x)
        out, _ = net.apply(variables, x, x, True,
                           rngs={"dropout": jax.random.PRNGKey(1)},
                           mutable=["batch_stats"])
        assert out.shape == (2, 20)


class TestActorCritic:
    def test_policy_value(self):
        net = ActorCritic(out_dim=2, arch="resnet18")
        emb = jnp.zeros((3, 64, 64, 256))
        mask = jnp.zeros((3, 64, 64, 3))
        params = net.init(jax.random.PRNGKey(0), emb, mask)
        p, v = net.apply(params, emb, mask)
        assert p.shape == (3, 2) and v.shape == (3, 1)

    @pytest.mark.slow
    def test_vit_mask_branch(self):
        net = ActorCritic(out_dim=2, arch="vit_b_32")
        emb = jnp.zeros((1, 64, 64, 256))
        mask = jnp.zeros((1, 224, 224, 3))
        params = net.init(jax.random.PRNGKey(0), emb, mask)
        p, v = net.apply(params, emb, mask)
        assert p.shape == (1, 2) and v.shape == (1, 1)

    def test_with_cost_branch(self):
        net = ActorCritic(out_dim=3, arch="resnet18", use_cost=True)
        emb = jnp.zeros((1, 64, 64, 256))
        mask = jnp.zeros((1, 64, 64, 3))
        cost = jnp.zeros((1, 1))
        params = net.init(jax.random.PRNGKey(0), emb, mask, cost)
        p, v = net.apply(params, emb, mask, cost)
        assert p.shape == (1, 3) and v.shape == (1, 1)
