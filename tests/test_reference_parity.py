"""Full-network parity against the IMPORTED reference code.

Round-1 parity evidence was block-level torch oracles rebuilt inside the
tests; this module imports the actual reference sources from
/root/reference (prop_net.py:140-210, fusion_net.py:8-50,
inference_core.py:126-259, models/qnet.py:6-92, models/rl_agent.py:6-56),
random-inits them on CPU, pushes the state dicts through
``utils.weight_convert``, and requires:

(a) per-method forward parity (encode_key / encode_value /
    segment_with_query / get_attention / FusionNet / QNet / ActorCritic)
(b) a full multi-interaction InferenceCore episode whose probability
    volume matches InferenceEngine within fp tolerance.

This is the "matched quality" evidence for the perf north star: identical
weights -> identical masks, so J&F parity follows from (b).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from reference_import import import_reference_mivos, import_reference_models

from eva_vos_tpu.models import PropagationNetwork, FusionNet
from eva_vos_tpu.models.qnet import QualityNet
from eva_vos_tpu.models.rl_agent import ActorCritic
from eva_vos_tpu.engine import InferenceEngine
from eva_vos_tpu.engine.propagation import EngineConfig, pad_mask
from eva_vos_tpu.ops import memory_readout
from eva_vos_tpu.utils.weight_convert import (convert_stcn, convert_fusion,
                                              convert_qnet,
                                              convert_actor_critic)

H, W = 48, 64
H16, W16 = H // 16, W // 16
HW = H16 * W16
TOP_K = 8


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _nchw(x):  # [..., H, W, C] numpy -> torch [..., C, H, W]
    return torch.from_numpy(np.moveaxis(x, -1, -3).copy())


@pytest.fixture(scope="module")
def ref_mivos():
    return import_reference_mivos()


@pytest.fixture(scope="module")
def stcn_pair(ref_mivos):
    """(torch PropagationNetwork.eval(), flax module, converted variables)."""
    prop_net, _, _, _ = ref_mivos
    torch.manual_seed(0)
    tnet = prop_net.PropagationNetwork(top_k=TOP_K).eval()
    fnet = PropagationNetwork(top_k=TOP_K)
    variables = jax.tree.map(jnp.asarray, convert_stcn(_sd(tnet)))
    return tnet, fnet, variables


@pytest.fixture(scope="module")
def key_feats(stcn_pair, rng_mod):
    """Shared encode_key outputs for two frames (torch + flax)."""
    tnet, fnet, variables = stcn_pair
    frames = rng_mod.standard_normal((2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = [tnet.encode_key(_nchw(frames[i : i + 1])) for i in range(2)]
    f_out = fnet.apply(variables, jnp.asarray(frames), method="encode_key")
    return frames, t_out, f_out


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(29102910)


class TestSTCNMethodParity:
    def test_encode_key(self, key_feats):
        _, t_out, f_out = key_feats
        names = ["k16", "f16_thin", "f16", "f8", "f4"]
        for i in range(2):
            for j, name in enumerate(names):
                ref = t_out[i][j].numpy()[0].transpose(1, 2, 0)
                got = np.asarray(getattr(f_out, name)[i])
                np.testing.assert_allclose(
                    got, ref, rtol=1e-3, atol=1e-4,
                    err_msg=f"encode_key[{name}] frame {i}")

    @pytest.mark.parametrize("k_obj", [1, 2])
    def test_encode_value(self, stcn_pair, key_feats, rng_mod, k_obj):
        tnet, fnet, variables = stcn_pair
        frames, t_out, f_out = key_feats
        masks = (rng_mod.uniform(size=(k_obj, H, W)) > 0.6).astype(np.float32)
        with torch.no_grad():
            ref = tnet.encode_value(
                _nchw(frames[0:1]), t_out[0][2],
                torch.from_numpy(masks)[:, None])  # [K, 512, 1, h, w]
        got = fnet.apply(variables, jnp.asarray(frames[0]), f_out.f16[0],
                         jnp.asarray(masks), method="encode_value")
        ref_np = ref.numpy()[:, :, 0].transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), ref_np,
                                   rtol=1e-3, atol=1e-4)

    def test_segment_with_query(self, stcn_pair, key_feats, rng_mod):
        """Memory read (top-k softmax) + decode, 2-frame memory."""
        tnet, fnet, variables = stcn_pair
        frames, t_out, f_out = key_feats
        k_obj = 1
        masks = (rng_mod.uniform(size=(k_obj, H, W)) > 0.6).astype(np.float32)

        with torch.no_grad():
            v0 = tnet.encode_value(_nchw(frames[0:1]), t_out[0][2],
                                   torch.from_numpy(masks)[:, None])
            v1 = tnet.encode_value(_nchw(frames[1:2]), t_out[1][2],
                                   torch.from_numpy(masks)[:, None])
            mk16 = torch.stack([t_out[0][0], t_out[1][0]], 2)  # [1,CK,2,h,w]
            mv16 = torch.cat([v0, v1], 2)                      # [K,CV,2,h,w]
            k16_q, thin_q, _, f8_q, f4_q = t_out[1]
            ref = tnet.segment_with_query(mk16, mv16, f8_q, f4_q,
                                          k16_q, thin_q)       # [K,1,H,W]

        ck = f_out.k16.shape[-1]
        mk = jnp.concatenate([f_out.k16[0].reshape(HW, ck),
                              f_out.k16[1].reshape(HW, ck)], 0)
        val0 = fnet.apply(variables, jnp.asarray(frames[0]), f_out.f16[0],
                          jnp.asarray(masks), method="encode_value")
        val1 = fnet.apply(variables, jnp.asarray(frames[1]), f_out.f16[1],
                          jnp.asarray(masks), method="encode_value")
        cv = val0.shape[-1]
        mv = jnp.concatenate([val0.reshape(k_obj, HW, cv),
                              val1.reshape(k_obj, HW, cv)], 1)
        qk = f_out.k16[1].reshape(HW, ck)
        readout = memory_readout(mk, qk, mv, top_k=TOP_K)
        readout = readout.reshape(k_obj, H16, W16, cv)
        got = fnet.apply(variables, readout, f_out.f16_thin[1], f_out.f8[1],
                         f_out.f4[1], method="decode_with_readout")
        np.testing.assert_allclose(np.asarray(got), ref.numpy()[:, 0],
                                   rtol=1e-3, atol=1e-4)

    def test_get_attention(self, stcn_pair, key_feats, rng_mod):
        tnet, fnet, variables = stcn_pair
        frames, t_out, f_out = key_feats
        k_obj = 2
        pos = rng_mod.uniform(size=(k_obj, H, W)).astype(np.float32)
        neg = rng_mod.uniform(size=(k_obj, H, W)).astype(np.float32)
        with torch.no_grad():
            mk16 = t_out[0][0].unsqueeze(2)    # [1, CK, 1, h, w]
            ref = tnet.get_attention(
                mk16, torch.from_numpy(pos)[:, None],
                torch.from_numpy(neg)[:, None], t_out[1][0])  # [K,2,H,W]
        got = fnet.apply(variables, f_out.k16[0], jnp.asarray(pos),
                         jnp.asarray(neg), f_out.k16[1],
                         method="get_attention")               # [K,H,W,2]
        ref_np = ref.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), ref_np,
                                   rtol=1e-3, atol=1e-4)


class TestFusionNetParity:
    def test_forward(self, ref_mivos, rng_mod):
        _, ref_fusion, _, _ = ref_mivos
        torch.manual_seed(1)
        tnet = ref_fusion.FusionNet().eval()
        fnet = FusionNet()
        variables = jax.tree.map(jnp.asarray, convert_fusion(_sd(tnet)))

        im = rng_mod.standard_normal((H, W, 3)).astype(np.float32)
        seg1 = rng_mod.uniform(size=(H, W)).astype(np.float32)
        seg2 = rng_mod.uniform(size=(H, W)).astype(np.float32)
        attn = rng_mod.standard_normal((H, W, 2)).astype(np.float32)
        dist = np.asarray([0.3, 0.7], np.float32)
        with torch.no_grad():
            ref = tnet(_nchw(im[None]), torch.from_numpy(seg1)[None, None],
                       torch.from_numpy(seg2)[None, None],
                       _nchw(attn[None]), torch.from_numpy(dist)[None])
        got = fnet.apply(variables, jnp.asarray(im), jnp.asarray(seg1),
                         jnp.asarray(seg2), jnp.asarray(attn),
                         jnp.asarray(dist))
        np.testing.assert_allclose(np.asarray(got), ref.numpy()[0, 0],
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parity_ci
class TestEpisodeParity:
    """8-frame InferenceCore episode vs InferenceEngine — the 'matched
    quality' proof: identical weights, three interactions (forward-only,
    backward, fused in-between), identical probability volumes."""

    @pytest.mark.parametrize("block_frames", [True, False])
    def test_episode(self, ref_mivos, stcn_pair, rng_mod, block_frames):
        prop_net, ref_fusion, inference_core, _ = ref_mivos
        tnet, fnet, variables = stcn_pair
        torch.manual_seed(1)
        t_fuse = ref_fusion.FusionNet().eval()
        f_fuse = FusionNet()
        fuse_vars = jax.tree.map(jnp.asarray, convert_fusion(_sd(t_fuse)))

        t_frames = 8
        frames = rng_mod.standard_normal((t_frames, H, W, 3)).astype(np.float32)
        gt = (rng_mod.uniform(size=(t_frames, H, W)) > 0.6).astype(np.float32)

        # reference: images [1, T, 3, H, W], interact masks [K, 1, H, W]
        images_t = _nchw(frames)[None]
        core = inference_core.InferenceCore(
            tnet, t_fuse, images_t, num_objects=1, device="cpu")

        cfg = EngineConfig(mem_freq=5, top_k=TOP_K, max_interactions=4,
                           feature_chunk=2, block_frames=block_frames)
        engine = InferenceEngine(fnet, f_fuse, variables, fuse_vars, cfg)
        feats = engine.precompute_features(jnp.asarray(frames))
        state = engine.init_state(feats, 1)

        interacted = []
        for idx in (0, t_frames - 1, 3):
            m = gt[idx][None]  # [1, H, W]
            with torch.no_grad():
                core.interact(torch.from_numpy(m)[:, None], idx)
            state = engine.interact(state, feats,
                                    pad_mask(m, (0, 0, 0, 0)), idx)
            interacted.append(idx)

            ref_prob = core.prob.numpy()[:, :, 0]       # [K+1, T, H, W]
            got_prob = np.asarray(state.prob)
            # object channels must match everywhere; the bg channel only on
            # non-interacted frames (the reference broadcast-writes the
            # object mask into bg at the interacted frame,
            # inference_core.py:225; we store 1 - max(mask))
            np.testing.assert_allclose(
                got_prob[1:], ref_prob[1:], rtol=1e-3, atol=1e-3,
                err_msg=f"object prob mismatch after frame {idx}")
            rest = [t for t in range(t_frames) if t not in interacted]
            np.testing.assert_allclose(
                got_prob[0, rest], ref_prob[0, rest], rtol=1e-3, atol=1e-3,
                err_msg=f"bg prob mismatch after frame {idx}")

        # final hard masks agree on non-interacted frames
        ref_masks = core.np_masks
        got_masks = engine.masks_from_prob(state.prob, (0, 0, 0, 0))
        rest = [t for t in range(t_frames) if t not in interacted]
        agree = (ref_masks[rest] == got_masks[rest]).mean()
        assert agree > 0.999, f"hard-mask agreement {agree}"


class TestDecisionModelParity:
    def test_qnet(self, rng_mod):
        ref_qnet, _ = import_reference_models()
        torch.manual_seed(2)
        tnet = ref_qnet.QualityNet(merge_strategy="cat", arch="resnet18",
                                   n_labels=20).eval()
        fnet = QualityNet(merge_strategy="cat", arch="resnet18", n_labels=20)
        variables = jax.tree.map(jnp.asarray, convert_qnet(_sd(tnet)))

        x_rgb = rng_mod.standard_normal((2, 224, 224, 3)).astype(np.float32)
        x_mask = rng_mod.standard_normal((2, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            ref = tnet(_nchw(x_rgb), _nchw(x_mask))
        got = fnet.apply(variables, jnp.asarray(x_rgb), jnp.asarray(x_mask))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                                   rtol=1e-3, atol=1e-3)

    def test_actor_critic(self, rng_mod):
        _, ref_rl = import_reference_models()
        torch.manual_seed(3)
        tnet = ref_rl.ActorCritic(out_dim=3, arch="resnet18").eval()
        fnet = ActorCritic(out_dim=3, arch="resnet18")
        variables = jax.tree.map(jnp.asarray, convert_actor_critic(_sd(tnet)))

        x_img = rng_mod.standard_normal((2, 64, 64, 256)).astype(np.float32)
        x_mask = rng_mod.standard_normal((2, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            ref_p, ref_v = tnet(_nchw(x_img), _nchw(x_mask))
        got_p, got_v = fnet.apply(variables, jnp.asarray(x_img),
                                  jnp.asarray(x_mask))
        np.testing.assert_allclose(np.asarray(got_p), ref_p.numpy(),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got_v), ref_v.numpy(),
                                   rtol=1e-3, atol=1e-3)
