"""Real-bank attention probe: measure selection + readout strategies on
banks produced by REAL engine interactions (not synthetic clustered/random
key draws — the r3_batch2 sweep showed those two regimes differ 4x, and
which one real banks resemble decides the readout design).

For each fill level the probe snapshots the engine's bank mid-session and
times, at the production blocked-B=5 query geometry:
  - pallas tournament selection alone
  - pallas fused selection+readout (production default)
  - XLA 'scatter' readout (dense scatter + MXU matmul)
  - XLA 'gather' readout (row gather + weighted sum — fill-independent)
  - id spread: fraction of live (value-block, query-tile) pairs, the
    quantity that drives the index-scatter readout's one-hot build cost

Writes experiments/r3_realbank.json.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/evavos_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

OUT = Path(__file__).parent / "r3_realbank.json"


def save(key, value):
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data[key] = value
    OUT.write_text(json.dumps(data, indent=2))
    print(f"[saved] {key}: {json.dumps(value)[:160]}", flush=True)


def timed(fn, *args, iters=20):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from eva_vos_tpu.models import PropagationNetwork, FusionNet
    from eva_vos_tpu.engine import InferenceEngine
    from eva_vos_tpu.engine.propagation import (EngineConfig, prepare_video,
                                                pad_mask)
    from eva_vos_tpu.data import synthetic_video
    from eva_vos_tpu.kernels.memory_topk import pallas_memory_topk
    from eva_vos_tpu.kernels.memory_readout import pallas_fused_readout
    from eva_vos_tpu.ops.memory_attention import memory_readout

    t, h, w = 60, 480, 854
    dtype = jnp.bfloat16
    ph, pw = h + (-h) % 16, w + (-w) % 16
    stcn = PropagationNetwork(dtype=dtype)
    fusion = FusionNet(dtype=dtype)
    sp = stcn.init(jax.random.PRNGKey(0), jnp.zeros((ph, pw, 3), dtype),
                   jnp.zeros((1, ph, pw), dtype), method="init_all")
    fp = fusion.init(jax.random.PRNGKey(1), jnp.zeros((ph, pw, 3), dtype),
                     jnp.zeros((ph, pw), dtype), jnp.zeros((ph, pw), dtype),
                     jnp.zeros((ph, pw, 2), dtype), jnp.zeros((2,), dtype))
    engine = InferenceEngine(stcn, fusion, sp, fp,
                             EngineConfig(max_interactions=60,
                                          feature_chunk=2))
    images, masks = synthetic_video(t, h, w, 1, seed=0)
    padded, pad = prepare_video(images, dtype=dtype)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)
    state = engine.init_state(feats, 1)

    # interactive session like the bench: banks at increasing fills
    order = [0, t - 1] + list(range(2, t - 1, 2))
    top_k = engine.config.top_k
    hw = feats.k16.shape[1]
    checkpoints = {}
    for r, idx in enumerate(order):
        m = pad_mask(masks[:, idx].astype(np.float32), pad)
        state = engine.interact(state, feats, m, idx)
        # bank fill = certain (interactions) + transient admissions; track
        # the live token count the engine passes to the kernels
        fill_tokens = None
        # the engine's front pointer equals certain_count; transients are
        # appended by passes — live prefix is certain_count here per the
        # engine's bank layout (certain first)
        if r + 1 in (8, 15, 29):
            checkpoints[r + 1] = (state.bank_k, state.bank_v,
                                  int(state.certain_count))
    jax.block_until_ready(state.prob)
    checkpoints[len(order)] = (state.bank_k, state.bank_v,
                               int(state.certain_count))

    tis = np.array([25, 26, 27, 28, 29])
    qk = jnp.reshape(feats.k16[jnp.asarray(tis)], (5 * hw, -1))

    for nrounds, (bank_k, bank_v, cc) in sorted(checkpoints.items()):
        mmax = bank_k.shape[0]
        ck = bank_k.shape[-1]
        cv = bank_v.shape[-1]
        mk = bank_k.reshape(mmax * hw, ck)
        mv = bank_v.reshape(1, mmax * hw, cv)
        valid = jnp.asarray(cc * hw, jnp.int32)
        row = {"certain_slots": cc, "valid_tokens": int(valid)}

        def sel(q, v):
            return pallas_memory_topk(mk, q, top_k, v, block_q=512,
                                      block_m=1024, method="tournament")

        row["sel_tour_ms"] = round(timed(sel, qk, valid) * 1e3, 3)

        def fused(q, v):
            return pallas_fused_readout(mk, q, mv, top_k, v)

        row["fused_pallas_ms"] = round(timed(fused, qk, valid) * 1e3, 3)

        for strat in ("scatter", "gather", "pallas"):
            def f(q, v, s=strat):
                return memory_readout(mk, q, mv, top_k=top_k,
                                      valid_tokens=v, strategy=s)
            try:
                row[f"{strat}_total_ms"] = round(timed(f, qk, valid) * 1e3, 3)
            except Exception as e:
                row[f"{strat}_total_ms"] = f"{type(e).__name__}"[:60]

        # id spread: live (1024-token value block, 512-query tile) pairs
        _, idx_sel = sel(qk, valid)
        ids = np.asarray(idx_sel)          # [N, top_k]
        n_tiles = (ids.shape[0] + 511) // 512
        blocks = ids // 1024
        live = set()
        for ti in range(n_tiles):
            tile_blocks = np.unique(blocks[ti * 512:(ti + 1) * 512])
            live.update((int(b), ti) for b in tile_blocks)
        n_value_blocks = int(np.ceil(int(valid) / 1024))
        row["live_pair_frac"] = round(
            len(live) / max(1, n_value_blocks * n_tiles), 4)
        row["ids_per_live_block_tile"] = round(
            ids.size / max(1, len(live)), 1)
        save(f"rounds_{nrounds}", row)


if __name__ == "__main__":
    main()
