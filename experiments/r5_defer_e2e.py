"""r5: re-measure deferred merges (defer_s) WITH the window-end
``buffered`` gate (ADVICE r4 med #2, landed in ec67d8a) — the r4 sweep
that demoted defer to 0 ran every window's (defer_s*rounds*g + k)-row
extraction even when all blocks tau-skipped, which is exactly the warm
interactive regime where deferral should win (r4_sel_attrib: defer8
kernel 15.9 ms vs 27.4 at fill 72, but r4_defer_timing end-to-end 54.7
vs 27.2).

Steps (run individually; each writes into experiments/r5_defer_e2e.json):
  banks — one 60-round engine session at 480p/T=60, snapshot REAL banks
          at cc 13/40/72 slots to /tmp/r5_bank_<cc>.npz + a 5-frame query
          block (synthetic clustered draws misrepresent production:
          r3_realbank live_pair_frac=1.0)
  sweep — selection kernel + fused readout ms on the saved real banks,
          defer in {0, 8, 16}, exactness vs the XLA oracle
  e2e   — 10-round honest window-timed interactive sessions (bench's
          _window_session) with KernelConfig(tour_defer=0/8): the number
          that decides the production default.

Usage: python experiments/r5_defer_e2e.py [banks] [sweep] [e2e]
"""
import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("EVAVOS_JAX_CACHE", "/tmp/evavos_xla_cache")

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["EVAVOS_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

OUT = Path(__file__).parent / "r5_defer_e2e.json"
BANK = "/tmp/r5_bank_{}.npz"
FILLS = (13, 40, 72)


def save(key, value):
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data[key] = value
    OUT.write_text(json.dumps(data, indent=1))
    print(f"[saved] {key}: {json.dumps(value)[:200]}", flush=True)


def build_engine(kcfg=None, max_interactions=80):
    from eva_vos_tpu.models import PropagationNetwork, FusionNet
    from eva_vos_tpu.engine import InferenceEngine
    from eva_vos_tpu.engine.propagation import EngineConfig

    h, w = 480, 854
    dtype = jnp.bfloat16
    ph, pw = h + (-h) % 16, w + (-w) % 16
    stcn = PropagationNetwork(dtype=dtype)
    fusion = FusionNet(dtype=dtype)
    sp = stcn.init(jax.random.PRNGKey(0), jnp.zeros((ph, pw, 3), dtype),
                   jnp.zeros((1, ph, pw), dtype), method="init_all")
    fp = fusion.init(jax.random.PRNGKey(1), jnp.zeros((ph, pw, 3), dtype),
                     jnp.zeros((ph, pw), dtype), jnp.zeros((ph, pw), dtype),
                     jnp.zeros((ph, pw, 2), dtype), jnp.zeros((2,), dtype))
    return InferenceEngine(
        stcn, fusion, sp, fp,
        EngineConfig(max_interactions=max_interactions, feature_chunk=2,
                     kernels=kcfg))


def session_feats(engine, t=60, h=480, w=854, seed=0):
    from eva_vos_tpu.engine.propagation import prepare_video
    from eva_vos_tpu.data import synthetic_video

    images, masks = synthetic_video(t, h, w, 1, seed=seed)
    padded, pad = prepare_video(images, dtype=jnp.bfloat16)
    feats = engine.precompute_features(padded)
    jax.block_until_ready(feats.k16)
    return feats, masks, pad


def part_banks():
    from eva_vos_tpu.engine.propagation import pad_mask

    t = 60
    engine = build_engine()
    feats, masks, pad = session_feats(engine, t)
    state = engine.init_state(feats, 1)
    # farthest-point order like the bench session, 60 rounds
    order = [0, t - 1]
    while len(order) < 60:
        s = sorted(order)
        gaps = [(s[i + 1] - s[i], s[i]) for i in range(len(s) - 1)]
        g, lo = max(gaps)
        if g <= 1:
            break
        order.append(lo + g // 2)
    saved = []
    for r, idx in enumerate(order):
        m = pad_mask(masks[:, idx].astype(np.float32), pad)
        state = engine.interact(state, feats, m, idx)
        cc = int(jax.device_get(state.certain_count))
        for f in FILLS:
            if cc >= f and f not in saved:
                np.savez(BANK.format(f),
                         bank_k=np.asarray(state.bank_k)[:cc],
                         bank_v=np.asarray(state.bank_v)[:, :cc],
                         cc=cc)
                saved.append(f)
                print(f"saved bank fill {f} (cc={cc}) at round {r + 1}",
                      flush=True)
        if len(saved) == len(FILLS):
            break
    qk = np.asarray(feats.k16[25:30]).reshape(5 * feats.k16.shape[1], -1)
    np.savez("/tmp/r5_bank_qk.npz", qk=qk)
    save("banks", {"fills": saved, "tokens_per_slot": int(feats.k16.shape[1])})


def load_bank(fill):
    import ml_dtypes

    d = np.load(BANK.format(fill))
    bank_k, bank_v, cc = d["bank_k"], d["bank_v"], int(d["cc"])
    if bank_k.dtype.kind == "V":
        bank_k = bank_k.view(ml_dtypes.bfloat16)
        bank_v = bank_v.view(ml_dtypes.bfloat16)
    q = np.load("/tmp/r5_bank_qk.npz")["qk"]
    if q.dtype.kind == "V":
        q = q.view(ml_dtypes.bfloat16)
    # banks store [slots, tps, CK] keys / [K, slots, tps, CV] values
    ck = bank_k.shape[-1]
    cv = bank_v.shape[-1]
    mk = bank_k.reshape(-1, ck)
    mv = bank_v.reshape(bank_v.shape[0], -1, cv)
    return (jnp.asarray(mk), jnp.asarray(mv), jnp.asarray(q), cc)


def timed_chain(fn, qk, iters=20):
    """Chained timing: iteration i's query carries a zero-valued dependency
    on iteration i-1's output, so device executions serialize (the tunnel's
    block_until_ready on donated/async outputs is unreliable —
    r4_sync_probe)."""
    @jax.jit
    def step(q):
        out = fn(q)
        first = jax.tree_util.tree_leaves(out)[0]
        dep = (first.reshape(-1)[0] * 0).astype(q.dtype)
        return q + dep, out

    q = qk
    for _ in range(3):
        q, out = step(q)
    jax.device_get(np.asarray(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        q, out = step(q)
    jax.device_get(np.asarray(jax.tree_util.tree_leaves(out)[0])[0])
    return (time.perf_counter() - t0) / iters * 1e3


def part_sweep():
    """Selection geometry x defer on REAL banks.

    NOTE the r4_geom_resweep 'exact: false' entries were a HARNESS bug,
    not kernel bugs: ref_i was computed once per fill from the FIRST
    geometry's qk, but each geometry re-drew qk at a different RNG stream
    position (mk's padded row count mp depends on block_m and is drawn
    first).  Every inexact flag coincides with a differing mp (fill72
    bm1024/bm2048 share mp=116736 and were the only 'exact' big-geometry
    cases).  Real banks are fixed arrays — immune by construction."""
    from eva_vos_tpu.kernels.memory_topk import tournament_topk_t
    from eva_vos_tpu.kernels.memory_readout import pallas_fused_readout
    from eva_vos_tpu.kernels.config import KernelConfig
    from eva_vos_tpu.ops.memory_attention import memory_affinity_topk

    GEOMS = [(512, 1024), (512, 2048), (256, 2048), (256, 4096)]
    DEFERS = (0, 8, 16)
    for fill in FILLS:
        if not Path(BANK.format(fill)).exists():
            print(f"bank {fill} missing — run banks first", flush=True)
            continue
        mk, mv, qk, cc = load_bank(fill)
        m, ck = mk.shape
        n = qk.shape[0]
        scale = math.sqrt(ck)

        _, ref_i = memory_affinity_topk(mk, qk, 50)
        ref_i = np.asarray(ref_i)

        row = {"cc": cc, "tokens": m}
        for bq, bm in GEOMS:
            mp = m + (-m) % bm
            npad = n + (-n) % bq
            mk_p = jnp.pad(mk, ((0, mp - m), (0, 0)))
            qk_p = jnp.pad(qk, ((0, npad - n), (0, 0)))
            msq = jnp.sum(mk_p.astype(jnp.float32) ** 2, axis=-1)
            valid = jnp.asarray([m], jnp.int32)
            for defer in DEFERS:
                key = f"sel_{bq}x{bm}_defer{defer}"
                try:
                    ms = timed_chain(
                        lambda q, d=defer: tournament_topk_t(
                            q, mk_p, msq, valid, top_k=50, block_q=bq,
                            block_m=bm, scale=scale, defer_s=d)[0],
                        qk_p)
                    _, idx = tournament_topk_t(
                        qk_p, mk_p, msq, valid, top_k=50, block_q=bq,
                        block_m=bm, scale=scale, defer_s=defer)
                    exact = bool((np.asarray(idx).T[:n] == ref_i).all())
                    row[key] = {"ms": round(ms, 3), "exact": exact}
                    print(f"fill{fill} {key}: {ms:.3f} ms exact={exact}",
                          flush=True)
                except Exception as e:
                    row[key] = f"failed: {type(e).__name__}"[:100]
                    print(f"fill{fill} {key}: FAILED {e!r:.120}", flush=True)
        # fused end-to-end (selection + readout) at default vs best knobs
        for defer in (0, 8):
            ms_f = timed_chain(
                lambda q, d=defer: pallas_fused_readout(
                    mk, q[:n], mv, 50, kcfg=KernelConfig(tour_defer=d)),
                jnp.asarray(qk))
            row[f"fused_defer{defer}_ms"] = round(ms_f, 3)
            print(f"fill{fill} fused defer{defer}: {ms_f:.3f} ms",
                  flush=True)
        save(f"fill{fill}", row)


def part_e2e():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench
    from eva_vos_tpu.kernels.config import KernelConfig
    from eva_vos_tpu.engine.propagation import pad_mask

    t, rounds = 60, 10
    for defer in (0, 8):
        engine = build_engine(KernelConfig(tour_defer=defer))
        feats, masks, pad = session_feats(engine, t)
        masks_dev = jnp.asarray(
            np.stack([pad_mask(masks[:, i].astype(np.float32), pad)
                      for i in range(t)], axis=1))
        windows, span = bench._window_session(engine, feats, masks_dev, t,
                                              rounds)
        fr, sec = span(1, rounds)
        fps = fr / sec if sec else 0.0
        save(f"e2e_defer{defer}",
             {"fps_rounds_1_{}".format(rounds): round(fps, 2),
              "frames": fr, "seconds": round(sec, 3),
              "windows": [[a, b, f, round(s, 4)]
                          for a, b, f, s in windows]})


if __name__ == "__main__":
    steps = sys.argv[1:] or ["banks", "sweep", "e2e"]
    for s in steps:
        {"banks": part_banks, "sweep": part_sweep, "e2e": part_e2e}[s]()
