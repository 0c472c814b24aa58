"""Per-phase MFU / roofline accounting at production geometry (VERDICT r2
#5: fps-vs-baseline was the only efficiency lens; this measures achieved
vs peak FLOP/s for every phase of the blocked propagation step).

Phases (one blocked engine step = 5 frames at 480p, bank fill 13 slots):
  encode_key   — resnet50 key trunk, per frame (amortized per video)
  selection    — resident/tournament top-k kernel (5-frame query block)
  readout      — index-scatter value sweep (part of the fused call)
  decoder      — decode_with_readout, vmapped over the 5-frame block
  fusion       — FusionNet packed space-to-depth + attention, 5 frames
  encode_value — value trunk, one admission per block

FLOPs: XLA cost_analysis for the flax modules (exact for the compiled
graph); analytic matmul counts for the Pallas kernels (cost_analysis
cannot see inside a pallas_call):
  selection: 2*Nq*M_live*CK  (the affinity dot; VPU top-k not counted)
  readout:   2*Nq*M_live*CV  (upper bound: contrib @ V per live block;
             the skip makes the real number track the top-k spread)

Prints a JSON table {phase: {ms, tflops, achieved_tflops_s, pct_peak}}.

Run on TPU:  python experiments/r3_phase_mfu.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

DTYPE = jnp.bfloat16
H, W = 480, 864          # padded 480p
H16, W16 = H // 16, W // 16
HW = H16 * W16           # 1620
CK, CV = 64, 512
B = 5                    # blocked frames (mem_freq)
FILL = 13                # live bank slots (interactive steady state)
MMAX = 72
TOP_K = 50
PEAK = 197e12            # v5e bf16


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def cost_flops(jitted, *args):
    try:
        a = jitted.lower(*args).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0]
        return float(a["flops"])
    except Exception:
        return None


def main():
    from eva_vos_tpu.models import PropagationNetwork, FusionNet

    stcn = PropagationNetwork(dtype=DTYPE)
    fusion = FusionNet(dtype=DTYPE)
    params = stcn.init(jax.random.PRNGKey(0), jnp.zeros((H, W, 3), DTYPE),
                       jnp.zeros((1, H, W), DTYPE), method="init_all")
    fparams = fusion.init(jax.random.PRNGKey(1), jnp.zeros((H, W, 3), DTYPE),
                          jnp.zeros((H, W), DTYPE), jnp.zeros((H, W), DTYPE),
                          jnp.zeros((H, W, 2), DTYPE), jnp.zeros((2,), DTYPE))
    rng = np.random.default_rng(0)

    table = {}

    def add(name, secs, tflops):
        ach = tflops * 1e12 / secs if tflops else None
        table[name] = {
            "ms": round(secs * 1e3, 3),
            "tflops": round(tflops, 4) if tflops else None,
            "achieved_tflops_s": round(ach / 1e12, 2) if ach else None,
            "pct_v5e_peak": round(100 * ach / PEAK, 1) if ach else None,
        }
        print(f"{name:14s} {table[name]}", flush=True)

    # ---- encode_key (per frame) ----
    img = jnp.asarray(rng.standard_normal((H, W, 3)), DTYPE)
    ek = jax.jit(lambda x: stcn.apply(params, x, method="encode_key"))
    add("encode_key", timed(ek, img), (cost_flops(ek, img) or 0) / 1e12)

    # ---- selection + readout (5-frame query block, fill=13) ----
    from eva_vos_tpu.kernels import pallas_memory_topk, pallas_fused_readout

    mk = jnp.asarray(rng.standard_normal((MMAX * HW, CK)), DTYPE)
    qk = jnp.asarray(rng.standard_normal((B * HW, CK)), DTYPE)
    mv = jnp.asarray(rng.standard_normal((1, MMAX * HW, CV)), DTYPE)
    valid = jnp.asarray(FILL * HW, jnp.int32)

    sel = jax.jit(lambda q, v: pallas_memory_topk(
        mk, q, TOP_K, v, block_q=128, block_m=4096, method="resident")[0])
    t_sel = timed(sel, qk, valid)
    fl_sel = 2 * (B * HW) * (FILL * HW) * CK / 1e12
    add("selection", t_sel, fl_sel)

    fused = jax.jit(lambda q, v: pallas_fused_readout(
        mk, q, mv, TOP_K, v, block_q=128, block_m=4096))
    t_fused = timed(fused, qk, valid)
    fl_ro = 2 * (B * HW) * (FILL * HW) * CV / 1e12
    add("readout", max(t_fused - t_sel, 1e-6), fl_ro)

    # ---- decoder (5-frame block) ----
    ro = jnp.asarray(rng.standard_normal((B, 1, H16, W16, CV)), DTYPE)
    thin = jnp.asarray(rng.standard_normal((B, H16, W16, CV)), DTYPE)
    f8 = jnp.asarray(rng.standard_normal((B, H // 8, W // 8, 512)), DTYPE)
    f4 = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, 256)), DTYPE)

    dec = jax.jit(lambda ro, thin, f8, f4: jax.vmap(
        lambda r, t, e, f: stcn.apply(params, r, t, e, f,
                                      skips_precomputed=True,
                                      method="decode_with_readout"))(
        ro, thin, f8, f4))
    t_dec = timed(dec, ro, thin, f8, f4)
    add("decoder", t_dec,
        (cost_flops(dec, ro, thin, f8, f4) or 0) / 1e12)

    # ---- fusion (5 frames, packed path) ----
    im5 = jnp.asarray(rng.standard_normal((B, H, W, 3)), DTYPE)
    prev = jnp.asarray(rng.standard_normal((B, H, W)), DTYPE)
    curr = jnp.asarray(rng.standard_normal((B, H, W)), DTYPE)
    attn = jnp.asarray(rng.standard_normal((B, H, W, 2)), DTYPE)
    tdist = jnp.asarray(rng.standard_normal((B, 2)), DTYPE)

    from eva_vos_tpu.models.fusion import fusion_apply_packed

    fuse = jax.jit(lambda *a: jax.vmap(
        lambda i, p, c, at, td: fusion_apply_packed(
            fparams, i, p, c, at, td))(*a))
    t_fuse = timed(fuse, im5, prev, curr, attn, tdist)
    add("fusion", t_fuse,
        (cost_flops(fuse, im5, prev, curr, attn, tdist) or 0) / 1e12)

    # ---- encode_value (one admission per block) ----
    f16 = jnp.asarray(rng.standard_normal((H16, W16, 1024)), DTYPE)
    mask = jnp.asarray(rng.standard_normal((1, H, W)), DTYPE)
    ev = jax.jit(lambda i, f, m: stcn.apply(params, i, f, m,
                                            method="encode_value"))
    t_ev = timed(ev, img, f16, mask)
    add("encode_value", t_ev, (cost_flops(ev, img, f16, mask) or 0) / 1e12)

    # ---- aggregate over one blocked step (5 frames) ----
    step_ms = (t_sel + (t_fused - t_sel) + t_dec + t_fuse + t_ev) * 1e3
    step_fl = (fl_sel + fl_ro
               + sum((table[p]["tflops"] or 0)
                     for p in ("decoder", "fusion", "encode_value")))
    table["_blocked_step"] = {
        "ms": round(step_ms, 2), "ms_per_frame": round(step_ms / B, 2),
        "tflops": round(step_fl, 3),
        "mfu": round(step_fl * 1e12 / (step_ms * 1e-3) / PEAK, 4),
    }
    print(json.dumps(table), flush=True)
    with open("experiments/r3_phase_mfu.json", "w") as fh:
        json.dump(table, fh, indent=2)


if __name__ == "__main__":
    main()
