"""r4: why does the 160x160 brief fit produce empty masks at 480p?

VERDICT r3 #1: BENCH_r03 recorded j_torch_reference_prod = 0.0 — the
briefly-fitted STCN does not transfer from the 160x160 fit geometry to the
480x854 bench episode.  Hypothesis: the synthetic object's token-space
extent differs (160p square = 40 px = 2.5x2.5 tokens at stride 16; the 480p
bench square = 120 px = 7.5x7.5 tokens), and the fitted key/value features
are scale-specific.  The background texture is iid per pixel, so per-token
statistics are resolution-independent — object size in PIXELS is the main
variable.

Variants:
  A = the current bench fit (160x160, size-40 square)
  B = fit at 256x448 with a size-120 square (production token extent,
      ~4x cheaper than fitting at full 480x864)

Each variant is evaluated one-shot (memorize frame 0, decode frames 1..T-1)
at several geometries, reporting mean J.  Run on TPU:

    cd /root/repo && nohup python experiments/r4_fit_transfer.py \
        > experiments/r4_fit_transfer.log 2>&1 &
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from eva_vos_tpu.models import PropagationNetwork
from eva_vos_tpu.ops.memory_attention import memory_readout
from eva_vos_tpu.ops.normalize import im_normalize
from eva_vos_tpu.data import synthetic_video

jax.config.update("jax_compilation_cache_dir", "/tmp/evavos_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

STCN = PropagationNetwork(top_k=50, dtype=jnp.float32)


def fit(t, h, w, size, steps, seed=5, lr=3e-4, log=print):
    images, gt = synthetic_video(t, h, w, num_objects=1, size=size, seed=seed)
    frames = im_normalize(jnp.asarray(images, jnp.float32))
    gt = jnp.asarray(gt[0], jnp.float32)

    variables = STCN.init(jax.random.PRNGKey(0), frames[0], gt[0][None],
                          method="init_all")
    params, stats = variables["params"], variables.get("batch_stats", {})
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(params):
        v = {"params": params, "batch_stats": stats}
        feats = jax.lax.map(
            lambda fr: STCN.apply(v, fr, method="encode_key"), frames)
        hw16 = feats.k16.shape[1] * feats.k16.shape[2]
        k16 = feats.k16.reshape(t, hw16, -1)
        v0 = STCN.apply(v, frames[0], feats.f16[0], gt[0][None],
                        method="encode_value")
        mv = v0.reshape(1, hw16, -1)

        def seg(i):
            ro = memory_readout(k16[0], k16[i], mv, top_k=min(50, hw16),
                                strategy="scatter")
            ro = ro.reshape(1, *feats.f16_thin.shape[1:3], -1)
            prob = STCN.apply(v, ro, feats.f16_thin[i], feats.f8[i],
                              feats.f4[i], method="decode_with_readout")
            return prob[0]

        probs = jax.lax.map(seg, jnp.arange(1, t))
        tgt = gt[1:]
        eps = 1e-6
        bce = -(tgt * jnp.log(probs + eps)
                + (1 - tgt) * jnp.log(1 - probs + eps))
        return jnp.mean(bce)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    loss = None
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if i == 0:
            log(f"  first step (compile) {time.time() - t0:.0f}s")
    log(f"  fit({h}x{w}, size={size}): {steps} steps in "
        f"{time.time() - t0:.0f}s, final bce {float(loss):.4f}")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


@functools.partial(jax.jit, static_argnums=(2,))
def _eval_probs(variables, frames, t):
    feats = jax.lax.map(
        lambda fr: STCN.apply(variables, fr, method="encode_key"), frames)
    hw16 = feats.k16.shape[1] * feats.k16.shape[2]
    k16 = feats.k16.reshape(t, hw16, -1)
    return feats, k16, hw16


def evaluate(variables, t, h, w, size, seed=11, log=print):
    """One-shot propagation mean J over frames 1..t-1."""
    images, gt = synthetic_video(t, h, w, num_objects=1, size=size, seed=seed)
    frames = im_normalize(jnp.asarray(images, jnp.float32))
    gt_np = np.asarray(gt[0])

    @jax.jit
    def probs_fn(variables, frames, gt0):
        feats = jax.lax.map(
            lambda fr: STCN.apply(variables, fr, method="encode_key"), frames)
        hw16 = feats.k16.shape[1] * feats.k16.shape[2]
        k16 = feats.k16.reshape(t, hw16, -1)
        v0 = STCN.apply(variables, frames[0], feats.f16[0], gt0[None],
                        method="encode_value")
        mv = v0.reshape(1, hw16, -1)

        def seg(i):
            ro = memory_readout(k16[0], k16[i], mv, top_k=min(50, hw16),
                                strategy="scatter")
            ro = ro.reshape(1, *feats.f16_thin.shape[1:3], -1)
            prob = STCN.apply(variables, ro, feats.f16_thin[i], feats.f8[i],
                              feats.f4[i], method="decode_with_readout")
            return prob[0]

        return jax.lax.map(seg, jnp.arange(1, t))

    t0 = time.time()
    probs = np.asarray(probs_fn(variables, frames,
                                jnp.asarray(gt_np[0], jnp.float32)))
    masks = probs > 0.5
    js = []
    for i in range(1, t):
        g = gt_np[i] == 1
        m = masks[i - 1]
        union = np.logical_or(m, g).sum()
        js.append(float(np.logical_and(m, g).sum() / union) if union else 1.0)
    j = float(np.mean(js))
    log(f"  eval {h}x{w} size={size}: J={j:.4f} "
        f"({time.time() - t0:.0f}s)  per-frame {[round(x, 3) for x in js]}")
    return j


def main():
    def log(*a):
        print(*a, flush=True)

    results = {}
    log("=== variant A: current bench fit (160x160, size 40) ===")
    va = fit(t=6, h=160, w=160, size=40, steps=150, log=log)
    results["A_fit"] = "160x160_size40_150steps"
    results["A_eval_160_s40"] = evaluate(va, 6, 160, 160, 40, log=log)
    results["A_eval_480_s40"] = evaluate(va, 6, 480, 864, 40, log=log)
    results["A_eval_480_s120"] = evaluate(va, 6, 480, 864, 120, log=log)

    log("=== variant B: production-token-extent fit (256x448, size 120) ===")
    vb = fit(t=6, h=256, w=448, size=120, steps=150, log=log)
    results["B_fit"] = "256x448_size120_150steps"
    results["B_eval_256_s120"] = evaluate(vb, 6, 256, 448, 120, log=log)
    results["B_eval_480_s120"] = evaluate(vb, 6, 480, 864, 120, log=log)
    results["B_eval_480_s40"] = evaluate(vb, 6, 480, 864, 40, log=log)

    out = Path(__file__).with_suffix(".json")
    out.write_text(json.dumps(results, indent=2))
    log(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
