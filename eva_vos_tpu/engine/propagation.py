"""Functional STCN propagation engine (the reference's ``InferenceCore``).

Behavior parity target: ``mivos/inference_core.py`` — interact with a frame,
propagate forward and backward to the nearest previously-interacted frames,
admit a new memory entry every ``mem_freq`` frames, and fuse with the prior
prediction when propagating *between* two interacted frames.

TPU-first redesign
------------------
* The engine is **functional**: a :class:`PropagationState` pytree goes in,
  a new one comes out.  ``interact`` is a single jitted computation; the
  frame index, pass boundaries and memory-bank fill counts are *traced*
  scalars, so one compilation serves every round of every video with the
  same (T, K, H, W).
* Per-frame backbone features are **precomputed once per video**
  (``encode_key`` over all frames, chunked `lax.map`), replacing the
  reference's LRU key buffer (``inference_core.py:94-124``) — on TPU the
  whole feature pyramid for a 104-frame 480p video fits comfortably in HBM.
* The memory bank is a **fixed-size token-major buffer**
  (``[Mmax, hw, C]``): slots ``[0, certain_count)`` hold "certain" memories
  (one per interaction, persistent), slots beyond hold the current pass's
  transient memories.  A single ``front`` pointer marks validity; the
  affinity kernel masks invalid tokens to -inf.  No reallocation, no
  retracing as the bank grows.
* The frame loops are ``lax.fori_loop`` with traced bounds
  (``idx+1 .. closest_ti``), exactly the ranges the reference walks — no
  wasted compute on frames outside the pass.
* Probabilities accumulate in fp32; backbone compute dtype is configurable
  (bf16 on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.padding import compute_pad, pad_hw, unpad_hw
from ..ops.aggregate import aggregate_wbg
from ..ops.memory_attention import memory_readout
from ..models.stcn import STCNFeatures


class VideoFeatures(NamedTuple):
    """Per-video precomputed tensors (padded resolution).

    ``f8``/``f4`` hold the decoder's per-frame skip_conv OUTPUTS (same
    shapes as the raw trunk features) — those convs are readout-independent
    so they run once per video here instead of once per decode
    (``PropagationNetwork.encode_skips``; decodes pass
    ``skips_precomputed=True``)."""

    images: jnp.ndarray     # [T, nh, nw, 3] normalized frames
    k16: jnp.ndarray        # [T, hw, CK] key tokens
    f16_thin: jnp.ndarray   # [T, h, w, 512]
    f16: jnp.ndarray        # [T, h, w, 1024]
    f8: jnp.ndarray         # [T, h8, w8, 512] decoder up_16_8 skip output
    f4: jnp.ndarray         # [T, h4, w4, 256] decoder up_8_4 skip output


class PropagationState(NamedTuple):
    prob: jnp.ndarray           # [K+1, T, nh, nw] fp32
    bank_k: jnp.ndarray         # [Mmax, hw, CK]
    bank_v: jnp.ndarray         # [K, Mmax, hw, CV] (object-major:
    #                               reshaping to [K, Mmax*hw, CV] is free)
    certain_count: jnp.ndarray  # int32 — slots < certain_count are permanent
    interacted: jnp.ndarray     # [T] bool


class EngineConfig(NamedTuple):
    mem_freq: int = 5
    top_k: int = 50
    max_interactions: int = 64
    feature_chunk: int = 4      # frames per encode_key step during precompute
    readout_strategy: str = "auto"  # 'auto' = 'pallas_fused' when the
    #   streaming kernels compile on this backend, else 'scatter' (MXU
    #   densify); 'gather' row-gathers (slow on TPU); 'sharded' = memory
    #   bank sharded over a device mesh (pass mesh= to the engine) with
    #   exact all-gather/psum top-k readout. See ops.memory_attention and
    #   parallel.sharded_attention.
    block_frames: bool = True   # batch the mem_freq frames between memory
    #                             admissions (bank is constant there, so
    #                             their segmentations are independent —
    #                             bit-identical results, 1/mem_freq the
    #                             sequential steps, mem_freq x conv batch)
    fusion_packed: str = "auto"  # 'auto'/'on'/'x4'/'gemm'/'off': run FusionNet in
    #   a space-to-depth layout (models.fusion.fusion_apply_packed) —
    #   numerically equivalent, faster on TPU where the 32-channel convs
    #   starve the MXU ('on' = 2x2 -> 128-ch convs, 'x4' = 4x4 -> 512-ch);
    #   'auto' resolves to $EVAVOS_FUSION_PACK (default 'on') off-CPU
    kernels: object = None       # kernels.config.KernelConfig carrying the
    #   pallas selection/readout knobs as jit-cache-correct static values;
    #   None -> KernelConfig.from_env() snapshotted ONCE at engine
    #   construction (env knobs are construction-time, not call-time)


class InferenceEngine:
    """Host-side orchestrator owning jitted propagation functions.

    Parameters
    ----------
    stcn: a bound-able ``PropagationNetwork`` module
    fusion: a ``FusionNet`` module, or None to disable fusion entirely —
        passes between two interacted frames then keep the fresh
        prediction instead of blending with the prior one (the reference
        always fuses there, ``inference_core.py:193-207``)
    stcn_params / fusion_params: flax variable collections
    config: engine knobs
    """

    def __init__(self, stcn, fusion, stcn_params, fusion_params,
                 config: EngineConfig = EngineConfig(), mesh=None,
                 mesh_axis: str = "data"):
        self.stcn = stcn
        self.fusion = fusion
        self.stcn_params = stcn_params
        self.fusion_params = fusion_params
        from ..ops.memory_attention import resolve_strategy

        config = config._replace(
            readout_strategy=resolve_strategy(config.readout_strategy))
        if config.fusion_packed == "auto":
            import os

            packed = os.environ.get("EVAVOS_FUSION_PACK", "on")
            config = config._replace(
                fusion_packed=packed if jax.default_backend() != "cpu"
                else "off")
        if config.kernels is None:
            from ..kernels.config import KernelConfig

            config = config._replace(kernels=KernelConfig.from_env())
        self.config = config
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        if config.readout_strategy == "sharded" and mesh is None:
            raise ValueError("readout_strategy='sharded' needs a mesh")

        self._precompute_jit = jax.jit(self._precompute, static_argnames=("chunk",))
        self._interact_jit = jax.jit(self._interact)
        # host-side mirror of certain_count keyed by the state's device
        # array identity: the capacity guard in interact() would otherwise
        # block on a device->host scalar fetch EVERY round (~ms over a
        # tunneled TPU — a measurable slice of the fixed per-round cost).
        # Entries die with their arrays via weakref.finalize, so recycled
        # id()s can't alias; states not produced by this engine (checkpoint
        # loads, manual _replace) miss the cache and pay one sync.
        self._cc_cache: dict = {}
        # donating variant for linear sessions: the state's prob volume +
        # memory bank are ~340 MB at 480p/60f, and without donation every
        # round copies them input->output.  Lookahead policies (frame
        # upper-bound) re-interact from ONE saved state many times, so
        # donation is opt-in via interact(..., donate=True).
        self._interact_jit_donated = jax.jit(self._interact,
                                             donate_argnums=(0,))

    def _readout(self, mk, qk, mv, top_k, valid_tokens):
        if self.config.readout_strategy == "sharded":
            from ..parallel.sharded_attention import sharded_memory_readout

            return sharded_memory_readout(
                mk, qk, mv, top_k=top_k, mesh=self.mesh,
                axis=self.mesh_axis, valid_tokens=valid_tokens)
        return memory_readout(mk, qk, mv, top_k=top_k,
                              valid_tokens=valid_tokens,
                              strategy=self.config.readout_strategy,
                              kernel_cfg=self.config.kernels)

    # ------------------------------------------------------------------
    # feature precompute
    # ------------------------------------------------------------------
    def _encode_key(self, frames):
        feats: STCNFeatures = self.stcn.apply(
            self.stcn_params, frames, method="encode_key"
        )
        return feats

    def _precompute(self, images, chunk: int):
        t = images.shape[0]
        pad_t = (-t) % chunk
        padded = jnp.pad(images, ((0, pad_t), (0, 0), (0, 0), (0, 0)))
        batched = padded.reshape(-1, chunk, *images.shape[1:])

        feats = jax.lax.map(self._encode_key, batched)
        feats = jax.tree.map(
            lambda x: x.reshape(-1, *x.shape[2:])[:t], feats
        )
        k16 = feats.k16.reshape(t, -1, feats.k16.shape[-1])  # token-major keys
        # hoist the decoder's per-frame skip convs out of the decode loop
        skip8, skip4 = self.stcn.apply(self.stcn_params, feats.f8, feats.f4,
                                       method="encode_skips")
        return VideoFeatures(
            images=images,
            k16=k16,
            f16_thin=feats.f16_thin,
            f16=feats.f16,
            f8=skip8,
            f4=skip4,
        )

    def precompute_features(self, images) -> VideoFeatures:
        """images [T, nh, nw, 3] (padded, normalized) -> VideoFeatures."""
        return self._precompute_jit(images, chunk=self.config.feature_chunk)

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------
    def init_state(self, feats: VideoFeatures, num_objects: int) -> PropagationState:
        t, hw, ck = feats.k16.shape
        nh, nw = feats.images.shape[1:3]
        cfg = self.config
        n_transient = max(0, (t - 2)) // cfg.mem_freq + 1
        mmax = cfg.max_interactions + n_transient
        cv = getattr(self.stcn, "value_dim", 512)
        prob = jnp.zeros((num_objects + 1, t, nh, nw), dtype=jnp.float32)
        prob = prob.at[0].set(1e-7)
        dtype = feats.k16.dtype
        sharded = cfg.readout_strategy == "sharded"
        if sharded:
            # the slot axis shards contiguously across the mesh (and the
            # flattened token axis mmax * hw follows)
            n_shards = self.mesh.shape[self.mesh_axis]
            mmax += (-mmax) % n_shards
        bank_k = jnp.zeros((mmax, hw, ck), dtype=dtype)
        bank_v = jnp.zeros((num_objects, mmax, hw, cv), dtype=dtype)
        if sharded:
            from jax.sharding import NamedSharding, PartitionSpec as P

            bank_k = jax.device_put(
                bank_k, NamedSharding(self.mesh, P(self.mesh_axis)))
            bank_v = jax.device_put(
                bank_v, NamedSharding(self.mesh, P(None, self.mesh_axis)))
        state = PropagationState(
            prob=prob,
            bank_k=bank_k,
            bank_v=bank_v,
            certain_count=jnp.asarray(0, jnp.int32),
            interacted=jnp.zeros((t,), dtype=bool),
        )
        self._remember_cc(state.certain_count, 0)
        return state

    def _remember_cc(self, cc_array, value: int) -> None:
        import weakref

        key = id(cc_array)
        self._cc_cache[key] = value
        weakref.finalize(cc_array, self._cc_cache.pop, key, None)

    # ------------------------------------------------------------------
    # the jitted interaction step
    # ------------------------------------------------------------------
    def _segment_frame(self, feats: VideoFeatures, bank_k, bank_v, front, ti):
        """Top-k memory read + decode for frame ``ti`` -> [K, nh, nw] probs."""
        cfg = self.config
        mmax, hw, ck = bank_k.shape
        k_obj = bank_v.shape[0]
        cv = bank_v.shape[-1]

        qk = feats.k16[ti]                       # [hw, CK]
        mk = bank_k.reshape(mmax * hw, ck)
        mv = bank_v.reshape(k_obj, mmax * hw, cv)  # layout makes this free

        top_k = min(cfg.top_k, mmax * hw)
        readout = self._readout(mk, qk, mv, top_k, front * hw)  # [K, hw, CV]

        h16, w16 = feats.f16_thin.shape[1:3]
        readout = readout.reshape(k_obj, h16, w16, cv)
        prob = self.stcn.apply(
            self.stcn_params,
            readout, feats.f16_thin[ti], feats.f8[ti], feats.f4[ti],
            skips_precomputed=True, method="decode_with_readout",
        )  # [K, nh, nw]
        return prob

    def _encode_value(self, feats: VideoFeatures, ti, masks):
        """masks [K, nh, nw] -> value tokens [K, hw, CV]."""
        value = self.stcn.apply(
            self.stcn_params,
            feats.images[ti], feats.f16[ti], masks,
            method="encode_value",
        )  # [K, h, w, CV]
        k = value.shape[0]
        return value.reshape(k, -1, value.shape[-1])

    def _fuse_frame(self, feats, prob_prev, prob_curr, attn, tc, tr, ti):
        """FusionNet blend of prior and current prediction for frame ti.

        prob_prev/prob_curr: [K+1, nh, nw]; attn: [K, nh, nw, 2].
        Follows ``inference_core.py:193-207``: per-object fused weight ->
        aggregate_wbg.
        """
        denom = jnp.abs(tc - tr).astype(jnp.float32)
        nc = jnp.abs(tc - ti).astype(jnp.float32) / denom
        nr = jnp.abs(tr - ti).astype(jnp.float32) / denom
        dist = jnp.stack([nc, nr])  # [2]

        k = attn.shape[0]
        im = feats.images[ti]
        dtype = im.dtype

        if self.config.fusion_packed in ("on", "x4"):
            from ..models.fusion import fusion_apply_packed

            s = 4 if self.config.fusion_packed == "x4" else 2

            def apply_fusion(*args):
                return fusion_apply_packed(self.fusion_params, *args, s=s)
        elif self.config.fusion_packed == "gemm":
            from ..models.fusion import fusion_apply_phase_gemm

            def apply_fusion(*args):
                return fusion_apply_phase_gemm(self.fusion_params, *args)
        else:
            def apply_fusion(*args):
                return self.fusion.apply(self.fusion_params, *args)

        def fuse_one(prev_k, curr_k, attn_k):
            logit = apply_fusion(
                im, prev_k.astype(dtype), curr_k.astype(dtype), attn_k,
                dist.astype(dtype),
            )
            return jax.nn.sigmoid(logit.astype(jnp.float32))

        fused = jax.vmap(fuse_one)(prob_prev[1:], prob_curr[1:], attn)  # [K, nh, nw]
        return aggregate_wbg(fused, keep_bg=True)

    def _do_pass(self, feats, state: PropagationState, key_k16, pos_diff,
                 neg_diff, idx, closest_ti, forward: bool):
        """One directional propagation pass; returns updated (prob, bank)."""
        cfg = self.config
        t = feats.k16.shape[0]
        prob, bank_k, bank_v = state.prob, state.bank_k, state.bank_v
        cc = state.certain_count

        needs_fusion = jnp.logical_and(closest_ti != t, closest_ti != -1)
        h16, w16 = feats.f16_thin.shape[1:3]

        def body(i, carry):
            prob, bank_k, bank_v, front, last_ti = carry
            ti = jnp.where(forward, idx + 1 + i, idx - 1 - i)

            out = self._segment_frame(feats, bank_k, bank_v, front, ti)
            out = aggregate_wbg(out.astype(jnp.float32), keep_bg=True)  # [K+1, nh, nw]

            end = jnp.where(forward, closest_ti - 1, closest_ti + 1)
            do_store = jnp.logical_and(ti != end,
                                       jnp.abs(ti - last_ti) >= cfg.mem_freq)

            def store(args):
                bank_k, bank_v, front, last_ti = args
                val = self._encode_value(feats, ti, out[1:].astype(bank_v.dtype))
                bank_k = jax.lax.dynamic_update_index_in_dim(
                    bank_k, feats.k16[ti], front, 0)
                bank_v = jax.lax.dynamic_update_slice_in_dim(
                    bank_v, val[:, None], front, 1)
                return bank_k, bank_v, front + 1, ti

            bank_k, bank_v, front, last_ti = jax.lax.cond(
                do_store, store, lambda a: a, (bank_k, bank_v, front, last_ti))

            prev = jax.lax.dynamic_index_in_dim(prob, ti, axis=1, keepdims=False)

            def fused(_):
                attn = self.stcn.apply(
                    self.stcn_params,
                    key_k16, pos_diff, neg_diff,
                    feats.k16[ti].reshape(h16, w16, -1),
                    method="get_attention",
                )  # [K, nh, nw, 2]
                return self._fuse_frame(feats, prev, out, attn,
                                        closest_ti, idx, ti)

            # static python branch: lax.cond traces BOTH sides, so the fused
            # branch must not exist at all when no fusion net is configured
            if self.fusion is None:
                new_prob_ti = out
            else:
                new_prob_ti = jax.lax.cond(needs_fusion, fused,
                                           lambda _: out, None)
            prob = jax.lax.dynamic_update_index_in_dim(prob, new_prob_ti, ti, 1)
            return prob, bank_k, bank_v, front, last_ti

        n_steps = jnp.where(forward, closest_ti - idx - 1, idx - closest_ti - 1)
        n_steps = jnp.maximum(n_steps, 0)
        prob, bank_k, bank_v, _, _ = jax.lax.fori_loop(
            0, n_steps, body, (prob, bank_k, bank_v, cc, idx)
        )
        return state._replace(prob=prob, bank_k=bank_k, bank_v=bank_v)

    # ------------------------------------------------------------------
    # block-parallel pass: the TPU-first restructuring of do_pass.
    # ------------------------------------------------------------------
    def _segment_frames_batched(self, feats, bank_k, bank_v, front, tis):
        """Batched segmentation of ``B`` frames against one (frozen) bank.

        tis [B] frame indices (pre-clamped).  Returns [B, K, nh, nw] probs.
        """
        cfg = self.config
        mmax, hw, ck = bank_k.shape
        k_obj = bank_v.shape[0]
        cv = bank_v.shape[-1]
        b = tis.shape[0]

        qk = feats.k16[tis].reshape(b * hw, ck)       # one big query set
        mk = bank_k.reshape(mmax * hw, ck)
        mv = bank_v.reshape(k_obj, mmax * hw, cv)  # layout makes this free

        top_k = min(cfg.top_k, mmax * hw)
        readout = self._readout(mk, qk, mv, top_k, front * hw)  # [K, B*hw, CV]

        h16, w16 = feats.f16_thin.shape[1:3]
        readout = readout.reshape(k_obj, b, h16, w16, cv).transpose(1, 0, 2, 3, 4)

        def decode_one(ro, thin, f8, f4):
            return self.stcn.apply(self.stcn_params, ro, thin, f8, f4,
                                   skips_precomputed=True,
                                   method="decode_with_readout")

        return jax.vmap(decode_one)(
            readout, feats.f16_thin[tis], feats.f8[tis], feats.f4[tis])

    def _fuse_frames_batched(self, feats, prev, curr, key_k16, pos_diff,
                             neg_diff, tc, tr, tis):
        """Batched fusion: prev/curr [B, K+1, nh, nw] -> fused [B, K+1, ...]."""
        h16, w16 = feats.f16_thin.shape[1:3]
        b = tis.shape[0]

        def attn_one(ti):
            return self.stcn.apply(
                self.stcn_params, key_k16, pos_diff, neg_diff,
                feats.k16[ti].reshape(h16, w16, -1), method="get_attention")

        attn = jax.vmap(attn_one)(tis)  # [B, K, nh, nw, 2]

        def fuse_one(ti, prev_f, curr_f, attn_f):
            return self._fuse_frame(feats, prev_f, curr_f, attn_f, tc, tr, ti)

        return jax.vmap(fuse_one)(tis, prev, curr, attn)

    def _do_pass_blocked(self, feats, state: PropagationState, key_k16,
                         pos_diff, neg_diff, idx, closest_ti, forward: bool):
        """Block-parallel pass: frames between memory admissions share a
        frozen bank, so each ``mem_freq``-sized block is segmented in one
        batched step.  Produces the same results as the sequential pass
        (``inference_core.py:126-191``): within a block the bank is frozen
        exactly as in the per-frame walk, admissions happen at
        ``last_ti + mem_freq``, never at the pass's end frame."""
        cfg = self.config
        bsz = cfg.mem_freq
        t = feats.k16.shape[0]
        prob, bank_k, bank_v = state.prob, state.bank_k, state.bank_v
        cc = state.certain_count

        needs_fusion = jnp.logical_and(closest_ti != t, closest_ti != -1)
        n_steps = jnp.where(forward, closest_ti - idx - 1, idx - closest_ti - 1)
        n_steps = jnp.maximum(n_steps, 0)
        # full blocks run the batched body; the remainder (n_steps % bsz)
        # runs single-frame steps — a padded block costs the same as a full
        # one, which dominated short late-session rounds (r3_batch2:
        # 3-frame rounds paid two full 5-frame blocks)
        n_blocks = n_steps // bsz
        end = jnp.where(forward, closest_ti - 1, closest_ti + 1)

        def body(bi, carry):
            prob, bank_k, bank_v, front = carry
            offs = jnp.arange(bsz)
            steps = bi * bsz + offs                       # 0-based step ids
            tis = jnp.where(forward, idx + 1 + steps, idx - 1 - steps)
            active = steps < n_steps
            tis_safe = jnp.clip(jnp.where(active, tis, idx), 0, t - 1)

            out = self._segment_frames_batched(feats, bank_k, bank_v, front,
                                               tis_safe)
            out = jax.vmap(lambda p: aggregate_wbg(p.astype(jnp.float32),
                                                   keep_bg=True))(out)

            # memory admission: only the block's last frame is mem_freq away
            # from the previous admission; never admit the end frame.
            do_store = jnp.logical_and(active[bsz - 1], tis[bsz - 1] != end)

            def store(args):
                bank_k, bank_v, front = args
                ti_s = tis_safe[bsz - 1]
                val = self._encode_value(
                    feats, ti_s, out[bsz - 1, 1:].astype(bank_v.dtype))
                bank_k = jax.lax.dynamic_update_index_in_dim(
                    bank_k, feats.k16[ti_s], front, 0)
                bank_v = jax.lax.dynamic_update_slice_in_dim(
                    bank_v, val[:, None], front, 1)
                return bank_k, bank_v, front + 1

            bank_k, bank_v, front = jax.lax.cond(
                do_store, store, lambda a: a, (bank_k, bank_v, front))

            prev = jnp.moveaxis(prob[:, tis_safe], 1, 0)  # [B, K+1, nh, nw]

            # static python branch: both lax.cond sides trace, so skip the
            # fused side entirely when no fusion net is configured
            if self.fusion is None:
                new_cols = out
            else:
                new_cols = jax.lax.cond(
                    needs_fusion,
                    lambda _: self._fuse_frames_batched(
                        feats, prev, out, key_k16, pos_diff, neg_diff,
                        closest_ti, idx, tis_safe),
                    lambda _: out, None)

            for j in range(bsz):
                cur = jax.lax.dynamic_index_in_dim(prob, tis_safe[j], axis=1,
                                                   keepdims=False)
                val = jnp.where(active[j], new_cols[j], cur)
                prob = jax.lax.dynamic_update_index_in_dim(
                    prob, val, tis_safe[j], 1)
            return prob, bank_k, bank_v, front

        prob, bank_k, bank_v, front = jax.lax.fori_loop(
            0, n_blocks, body, (prob, bank_k, bank_v, cc))

        # single-frame tail: the (n_steps % bsz) frames after the last full
        # block.  They never admit memory (admissions happen only at full
        # mem_freq boundaries, handled by the block body above), so the
        # bank is frozen here — results are bit-equal to the padded-block
        # formulation, at 1/bsz the compute for 1-frame tails.
        h16, w16 = feats.f16_thin.shape[1:3]

        def tail_body(i, prob):
            ti = jnp.where(forward, idx + 1 + i, idx - 1 - i)
            ti = jnp.clip(ti, 0, t - 1)
            out = self._segment_frame(feats, bank_k, bank_v, front, ti)
            out = aggregate_wbg(out.astype(jnp.float32), keep_bg=True)

            prev = jax.lax.dynamic_index_in_dim(prob, ti, axis=1,
                                                keepdims=False)

            def fused(_):
                attn = self.stcn.apply(
                    self.stcn_params, key_k16, pos_diff, neg_diff,
                    feats.k16[ti].reshape(h16, w16, -1),
                    method="get_attention")
                return self._fuse_frame(feats, prev, out, attn,
                                        closest_ti, idx, ti)

            if self.fusion is None:
                new_prob_ti = out
            else:
                new_prob_ti = jax.lax.cond(needs_fusion, fused,
                                           lambda _: out, None)
            return jax.lax.dynamic_update_index_in_dim(
                prob, new_prob_ti, ti, 1)

        prob = jax.lax.fori_loop(n_blocks * bsz, n_steps, tail_body, prob)
        return state._replace(prob=prob, bank_k=bank_k, bank_v=bank_v)

    def _interact(self, state: PropagationState, feats: VideoFeatures,
                  mask, idx):
        """mask [K, nh, nw] float one-hot object masks; idx traced int."""
        t = feats.k16.shape[0]
        h16, w16 = feats.f16_thin.shape[1:3]

        arange = jnp.arange(t)
        interacted = state.interacted
        fwd_closest = jnp.min(jnp.where(interacted & (arange > idx), arange, t))
        bwd_closest = jnp.max(jnp.where(interacted & (arange < idx), arange, -1))
        interacted = interacted.at[idx].set(True)

        # mask diffs vs the pre-update probability (``inference_core.py:222-224``)
        prev_obj = jax.lax.dynamic_index_in_dim(
            state.prob[1:], idx, axis=1, keepdims=False)  # [K, nh, nw]
        diff = mask.astype(jnp.float32) - prev_obj
        pos_diff = jnp.clip(diff, 0.0, 1.0)
        neg_diff = jnp.clip(-diff, 0.0, 1.0)

        # write the interacted frame's probability: bg = 1 - max_k(mask)
        new_col = jnp.concatenate(
            [1.0 - jnp.max(mask, axis=0, keepdims=True), mask.astype(jnp.float32)], 0)
        prob = jax.lax.dynamic_update_index_in_dim(state.prob, new_col, idx, 1)

        # certain memory for this interaction
        key_tokens = feats.k16[idx]
        val_tokens = self._encode_value(feats, idx, mask.astype(feats.k16.dtype))
        cc = state.certain_count
        bank_k = jax.lax.dynamic_update_index_in_dim(state.bank_k, key_tokens, cc, 0)
        bank_v = jax.lax.dynamic_update_slice_in_dim(
            state.bank_v, val_tokens[:, None], cc, 1)

        state = PropagationState(
            prob=prob, bank_k=bank_k, bank_v=bank_v,
            certain_count=cc + 1, interacted=interacted,
        )

        key_k16 = key_tokens.reshape(h16, w16, -1)
        do_pass = (self._do_pass_blocked
                   if self.config.block_frames and self.config.mem_freq > 1
                   else self._do_pass)
        state = do_pass(feats, state, key_k16, pos_diff, neg_diff,
                        idx, fwd_closest, forward=True)
        state = do_pass(feats, state, key_k16, pos_diff, neg_diff,
                        idx, bwd_closest, forward=False)
        return state

    def interact(self, state: PropagationState, feats: VideoFeatures,
                 mask, idx, donate: bool = False) -> PropagationState:
        """Public entry: mask [K, nh, nw] (padded res), idx int.

        ``donate=True`` donates the input state's buffers to the output
        (no ~340 MB prob/bank copy per round) — use it for linear
        annotation sessions where the previous state is dead after the
        call; the input state must not be reused afterwards (lookahead
        policies keep the default non-donating path).
        """
        # host-side capacity check: the bank reserves max_interactions
        # certain slots; past that, dynamic_update would silently clamp into
        # the transient region and corrupt results (ADVICE r1).  The count
        # comes from a host-side mirror keyed by array identity — a device
        # scalar fetch here would serialize every round on a device->host
        # round-trip (milliseconds over a tunneled TPU); states this engine
        # didn't produce miss the cache and pay the one-off sync.
        cc = self._cc_cache.get(id(state.certain_count))
        if cc is None:
            cc = int(state.certain_count)
        if cc >= self.config.max_interactions:
            raise ValueError(
                f"memory bank certain-slot capacity exhausted: "
                f"{cc} interactions recorded, "
                f"EngineConfig.max_interactions={self.config.max_interactions}"
                f" — raise max_interactions when creating the engine")
        fn = self._interact_jit_donated if donate else self._interact_jit
        out = fn(state, feats, mask, jnp.asarray(idx, jnp.int32))
        self._remember_cc(out.certain_count, cc + 1)
        return out

    # ------------------------------------------------------------------
    # host-side helpers
    # ------------------------------------------------------------------
    @staticmethod
    def masks_from_prob(prob, pad) -> np.ndarray:
        """prob [K+1, T, nh, nw] -> argmax object-id masks [T, H, W] uint8."""
        unp = unpad_hw(prob, pad)
        # cast on device: the per-round host transfer is then 1 byte/px
        # (uint8) instead of the argmax's 4-byte ints
        ids = jnp.argmax(unp, axis=0).astype(jnp.uint8)  # [T, H, W]
        return np.asarray(ids)


def prepare_video(images_01: np.ndarray, dtype=jnp.float32):
    """Host helper: [T, H, W, 3] in [0,1] (float) or [0,255] (uint8)
    -> (padded normalized jnp, pad).

    Normalization + pad-to-16, the device-side part of the reference's
    dataloader transform.  uint8 input transfers 1 byte/px and is scaled
    to [0,1] on device — prefer it for full videos (a 60-frame 480p video
    is 59 MB as uint8 vs 236 MB as fp32; host->device bandwidth is the
    per-video setup cost of an interactive session).
    """
    from ..ops.normalize import im_normalize

    t, h, w, _ = images_01.shape
    pad = compute_pad(h, w, 16)
    if np.asarray(images_01).dtype == np.uint8:
        x = jnp.asarray(images_01).astype(dtype) / 255.0
    else:
        x = jnp.asarray(images_01, dtype=dtype)
    x = im_normalize(x)
    x = pad_hw(x, pad, h_axis=1, w_axis=2)
    return x, pad


def pad_mask(mask: np.ndarray, pad) -> jnp.ndarray:
    """[K, H, W] -> [K, nh, nw] zero-padded."""
    return pad_hw(jnp.asarray(mask, jnp.float32), pad, h_axis=-2, w_axis=-1)
