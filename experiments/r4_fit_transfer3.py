"""r4 fit diagnosis, part 3: logit-space loss (part 2's BCE froze).

Part 2's 480p fit showed BCE frozen at 1.9188 across 200 steps: the
decoder's sigmoid saturates at this geometry and BCE-on-probabilities has
exactly zero gradient through a saturated sigmoid (p(1-p) underflows).
Here the loss is sigmoid-BCE in LOGIT space (optax.sigmoid_binary_
cross_entropy-style, numerically stable, gradient = sigmoid(x) - y never
zero), positive-weighted, on the bench video at production geometry.
Also logs mean |logit| to confirm the saturation diagnosis.

Run: cd /root/repo && nohup python experiments/r4_fit_transfer3.py \
        > experiments/r4_fit_transfer3.log 2>&1 &
"""

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
T_FIT = 8
H, W = 480, 864


def log(*a):
    print(*a, flush=True)


def fit(lr, steps, pos_w, seed=0, t_stride=8):
    images, gt = synthetic_video(60, H, W, num_objects=1, seed=seed)
    sel = list(range(0, 60, t_stride))[:T_FIT]
    frames = im_normalize(jnp.asarray(images[sel], jnp.float32))
    gtf = jnp.asarray(gt[0][sel], jnp.float32)
    t = len(sel)

    variables = STCN.init(jax.random.PRNGKey(0), frames[0], gtf[0][None],
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
        v0 = STCN.apply(v, frames[0], feats.f16[0], gtf[0][None],
                        method="encode_value")
        mv = v0.reshape(1, hw16, -1)

        def seg(i):
            ro = memory_readout(k16[0], k16[i], mv, top_k=min(50, hw16),
                                strategy="scatter")
            ro = ro.reshape(1, *feats.f16_thin.shape[1:3], -1)
            logit = STCN.apply(v, ro, feats.f16_thin[i], feats.f8[i],
                               feats.f4[i], method="decode_with_readout",
                               return_logits=True)
            return logit[0]

        logits = jax.lax.map(seg, jnp.arange(1, t))
        tgt = gtf[1:]
        # stable sigmoid BCE in logit space; weight positives
        ls = jax.nn.log_sigmoid(logits)
        lns = jax.nn.log_sigmoid(-logits)
        bce = -(pos_w * tgt * ls + (1 - tgt) * lns)
        return jnp.mean(bce), jnp.mean(jnp.abs(logits))

    @jax.jit
    def step(params, opt_state):
        (loss, alog), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, alog

    t0 = time.time()
    curve = []
    for i in range(steps):
        params, opt_state, loss, alog = step(params, opt_state)
        if i % 25 == 0 or i == steps - 1:
            lv, av = float(loss), float(alog)
            curve.append(round(lv, 4))
            log(f"  step {i}: bce {lv:.4f} mean|logit| {av:.1f} "
                f"({time.time() - t0:.0f}s)")
    return {"params": params, **({"batch_stats": stats} if stats else {})}, \
        curve


def eval_oneshot(variables, seed=0):
    images, gt = synthetic_video(60, H, W, num_objects=1, seed=seed)
    gt_np = np.asarray(gt[0])
    frames = im_normalize(jnp.asarray(images, jnp.float32))

    @jax.jit
    def feats_of(fr):
        return STCN.apply(variables, fr, method="encode_key")

    f0 = feats_of(frames[0])
    hw16 = f0.k16.shape[0] * f0.k16.shape[1]
    v0 = STCN.apply(variables, frames[0], f0.f16,
                    gt_np[0][None].astype(np.float32), method="encode_value")
    mv = v0.reshape(1, hw16, -1)
    k0 = f0.k16.reshape(hw16, -1)

    @jax.jit
    def seg(fr):
        f = feats_of(fr)
        ki = f.k16.reshape(hw16, -1)
        ro = memory_readout(k0, ki, mv, top_k=50, strategy="scatter")
        ro = ro.reshape(1, *f.f16_thin.shape[0:2], -1)
        return STCN.apply(variables, ro, f.f16_thin, f.f8, f.f4,
                          method="decode_with_readout")[0]

    js = []
    for i in range(1, 60, 7):
        m = np.asarray(seg(frames[i])) > 0.5
        g = gt_np[i] == 1
        union = np.logical_or(m, g).sum()
        js.append(float(np.logical_and(m, g).sum() / union) if union else 1.0)
    return float(np.mean(js)), [round(x, 3) for x in js]


def main():
    results = {}
    for name, lr, steps, pos_w in (
            ("logit_lr1e-3_posw4", 1e-3, 300, 4.0),
            ("logit_lr3e-4_posw4", 3e-4, 300, 4.0)):
        log(f"=== {name} (480x864, bench video seed 0) ===")
        v, curve = fit(lr, steps, pos_w)
        j, js = eval_oneshot(v)
        log(f"  one-shot J over bench video: {j:.4f}  {js}")
        results[name] = {"curve": curve, "j_oneshot": round(j, 4), "js": js}
        Path(__file__).with_suffix(".json").write_text(
            json.dumps(results, indent=2))
        if j > 0.5:
            log("  good enough; stopping sweep")
            break
    log(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
