"""r5: in-loop phase attribution of the HEADLINE interact at HEAD.

The phase models from r3/r4 (r3_phase_mfu, r4_sel_attrib) predict a
fresh-bank T=60 interact around 230-260 fps, but the bench measures
175-186 — ~90 ms/interact is unattributed.  Either the isolated phase
numbers don't transfer into the fori_loop, or there is loop glue
(prob-volume updates, bank DUS, pass orchestration) nobody has measured.
This script measures, at bench geometry (T=60, 480p, K=1, bf16,
mem_freq=5, top_k=50, max_interactions=60):

  headline_ms       full interact from fresh state (bench protocol)
  seg_block@fill F  _segment_frames_batched (fused sel+readout + decode,
                    5 frames) on the REAL banks a headline pass produces,
                    chained, for F in {1, 4, 8, 13}
  selro@fill F      the fused selection+readout call alone (same buffers)
  sel@fill F        the selection kernel alone
  encode_value      one admission (chained)
  glue_block        the loop body's non-phase ops: aggregate_wbg over the
                    block + prev gather + 5 prob DUS writes + bank DUS
  model_ms          sum over the 11 blocks + 4 tails + glue vs headline_ms

All timings: chained data dependencies + ONE device_get at the end
(honest under axon tunnel sync semantics, r4_sync_probe).
Writes experiments/r5_headline_attrib.json.
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
os.environ.setdefault("EVAVOS_JAX_CACHE", "/root/repo/.jax_compile_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["EVAVOS_JAX_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from eva_vos_tpu.models import PropagationNetwork, FusionNet
from eva_vos_tpu.engine import InferenceEngine
from eva_vos_tpu.engine.propagation import EngineConfig, prepare_video, pad_mask
from eva_vos_tpu.data import synthetic_video
from eva_vos_tpu.ops.aggregate import aggregate_wbg

OUT = Path(__file__).with_suffix(".json")
res = {}
T, H, W = 60, 480, 854
DTYPE = jnp.bfloat16


def chain_time(fn, x0, iters=20, label=None):
    """fn: x -> x-shaped output; chained so the device serializes."""
    x = fn(x0)
    jax.block_until_ready(x)
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.device_get(np.asarray(jax.tree.leaves(x)[0]).ravel()[:1])
    ms = (time.perf_counter() - t0) / iters * 1e3
    if label:
        res[label] = round(ms, 3)
        print(label, res[label], flush=True)
    return ms


def main():
    stcn = PropagationNetwork(key_arch="resnet50", value_arch="resnet18",
                              top_k=50, dtype=DTYPE)
    fusion = FusionNet(dtype=DTYPE)
    ph, pw = H + (-H) % 16, W + (-W) % 16
    sp = stcn.init(jax.random.PRNGKey(0), jnp.zeros((ph, pw, 3), DTYPE),
                   jnp.zeros((1, ph, pw), DTYPE), method="init_all")
    fp = fusion.init(jax.random.PRNGKey(1), jnp.zeros((ph, pw, 3), DTYPE),
                     jnp.zeros((ph, pw), DTYPE), jnp.zeros((ph, pw), DTYPE),
                     jnp.zeros((ph, pw, 2), DTYPE), jnp.zeros((2,), DTYPE))
    cfg = EngineConfig(mem_freq=5, top_k=50, max_interactions=60,
                       feature_chunk=2)
    engine = InferenceEngine(stcn, fusion, sp, fp, cfg)
    print(f"readout: {engine.config.readout_strategy}", flush=True)

    images, masks = synthetic_video(T, H, W, num_objects=1, seed=0)
    padded, pad = prepare_video(images, dtype=DTYPE)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)
    state0 = engine.init_state(feats, 1)
    m0 = pad_mask(masks[:1, 0].astype(np.float32), pad).astype(jnp.float32)

    # ---- headline (bench protocol: non-donated, repeat from state0) ----
    t0 = time.perf_counter()
    out = engine.interact(state0, feats, m0, 0)
    jax.block_until_ready(out.prob)
    print(f"interact compile {time.perf_counter() - t0:.1f}s", flush=True)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = engine.interact(state0, feats, m0, 0)
        jax.block_until_ready(out.prob)
    jax.device_get(out.certain_count)
    headline_ms = (time.perf_counter() - t0) / iters * 1e3
    res["headline_ms"] = round(headline_ms, 1)
    res["headline_fps"] = round((T - 1) / (headline_ms / 1e3), 2)
    print(f"headline {res['headline_ms']} ms = {res['headline_fps']} fps",
          flush=True)

    # final state's bank: fill 13 (1 interaction + 12 admissions at T=60)
    final = out
    fill_final = int(jax.device_get(final.certain_count))
    # certain_count counts interactions only; bank front after the pass is
    # interactions + admissions — recover from interact's internals: the
    # headline pass admits every 5th frame: (T-2)//5 slots
    res["bank_note"] = ("fill counts below are bank-front slots "
                        "(interactions + admissions)")

    mmax, hw, ck = final.bank_k.shape
    h16, w16 = feats.f16_thin.shape[1:3]
    cv = final.bank_v.shape[-1]

    # ---- per-fill phases on the real bank ----
    tis0 = jnp.arange(1, 6, dtype=jnp.int32)
    for fill in (1, 4, 8, 13):
        front = jnp.asarray(fill, jnp.int32)
        bank_k, bank_v = final.bank_k, final.bank_v

        def seg(x, _front=front):
            c = (jnp.min(x[0]).astype(jnp.int32) * 0)
            return engine._segment_frames_batched(
                feats, bank_k, bank_v, _front, tis0 + c)

        sb = jax.jit(seg)
        x0 = sb(jnp.zeros((5, 1, ph, pw), DTYPE))
        chain_time(sb, x0, label=f"seg_block_ms_fill{fill}")

        mk = bank_k.reshape(mmax * hw, ck)
        mv = bank_v.reshape(1, mmax * hw, cv)
        qk0 = feats.k16[tis0].reshape(5 * hw, ck)

        def selro(x, _front=front):
            c = (jnp.min(x) * 0).astype(DTYPE)
            return engine._readout(mk, qk0 + c, mv, 50, _front * hw)

        sr = jax.jit(selro)
        x0 = sr(jnp.zeros((1, 5 * hw, cv), DTYPE))
        chain_time(sr, x0, label=f"selro_ms_fill{fill}")

        from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk

        def sel(x, _front=front):
            c = (jnp.min(x) * 0).astype(DTYPE)
            w, i = pallas_memory_topk(
                mk, qk0 + c, 50, _front * hw, block_q=512,
                block_m=min(1024, mmax * hw), method="tournament")
            return w

        sl = jax.jit(sel)
        x0 = sl(jnp.zeros((5 * hw, 50), jnp.float32))
        chain_time(sl, x0, label=f"sel_ms_fill{fill}")

    # ---- encode_value (one admission) ----
    def ev(x):
        c = (jnp.min(x) * 0).astype(DTYPE)
        return engine._encode_value(feats, jnp.asarray(3, jnp.int32),
                                    jnp.zeros((1, ph, pw), DTYPE) + c)

    evj = jax.jit(ev)
    x0 = evj(jnp.zeros((1, hw, cv), DTYPE))
    chain_time(evj, x0, label="encode_value_ms")

    # ---- loop glue: aggregate + prev gather + prob DUS + bank DUS ----
    prob0 = state0.prob

    def glue(prob):
        outp = jnp.ones((5, 1, h16 * 16, w16 * 16), jnp.float32) \
            * (1.0 + 0.0 * prob[0, 0, 0, 0])
        outp = jax.vmap(lambda p: aggregate_wbg(p, keep_bg=True))(outp)
        tis = tis0
        prev = jnp.moveaxis(prob[:, tis], 1, 0)
        for j in range(5):
            cur = jax.lax.dynamic_index_in_dim(prob, tis[j], axis=1,
                                               keepdims=False)
            val = jnp.where(True, outp[j] + 0.0 * prev[j][..., :1, :1], cur)
            prob = jax.lax.dynamic_update_index_in_dim(prob, val, tis[j], 1)
        return prob

    gj = jax.jit(glue)
    chain_time(gj, prob0, label="glue_block_ms")

    # ---- model vs measured ----
    # headline pass: 11 full blocks (fills ~1..12) + 4 tail frames at 13
    fills = list(range(1, 12))

    def interp(name, f):
        pts = [(1, res[f"{name}_fill1"]), (4, res[f"{name}_fill4"]),
               (8, res[f"{name}_fill8"]), (13, res[f"{name}_fill13"])]
        for (a, va), (b, vb) in zip(pts, pts[1:]):
            if a <= f <= b:
                return va + (vb - va) * (f - a) / (b - a)
        return pts[-1][1]

    model = sum(interp("seg_block_ms", f) for f in fills)
    model += 11 * res["encode_value_ms"]          # ~1 admission per block
    model += 4 * res["seg_block_ms_fill13"] / 5   # tail frames approx
    model += 11 * res["glue_block_ms"]
    res["model_ms_blocks_tails_glue"] = round(model, 1)
    res["unattributed_ms"] = round(headline_ms - model, 1)
    OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
