"""Attribute the eva_vos round time (BENCH r4: 28.5 s/round) to phases.

Phases per round (loop: interactions/multiple.py:_run_multi_loop + eva_vos):
  encode    annotator.set_image_to_sam (ViT-H 1024^2, per-frame cached)
  annotate  the SAM click chain / gt-mask fetch (multiple.annotate)
  rl_fwd    ActorCritic forward on the device-resident embedding
  interact  engine.interact dispatch + device execution (synced here)
  metric    eval_session_metric (device-batched J + count fetch)
  qnet      qnet_frame_selection (masks->224 resize + QNet forward + argmax)

Each phase timer ends with the host-visible value the loop actually needs,
plus one tiny device_get where the phase would otherwise return an
un-synced device array (interact) — same window-sync discipline as bench.py
(r4_sync_probe: block_until_ready alone under-reports through the tunnel).

Run: timeout 1800 python experiments/r4_evavos_profile.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/evavos_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from eva_vos_tpu.models import PropagationNetwork, FusionNet
    from eva_vos_tpu.engine import InferenceEngine
    from eva_vos_tpu.engine.propagation import EngineConfig, prepare_video
    from eva_vos_tpu.data import synthetic_video
    from eva_vos_tpu.data.datasets import VideoSample
    from eva_vos_tpu.annotator import Annotator
    from eva_vos_tpu.interactions import multiple
    from eva_vos_tpu.interactions import eval as ieval
    from eva_vos_tpu.interactions.multiple import eva_vos
    from eva_vos_tpu.models.qnet import QualityNet
    from eva_vos_tpu.models.rl_agent import ActorCritic

    t, h, w, top_k = 60, 480, 854, 50
    dtype = jnp.bfloat16
    print(f"devices: {jax.devices()}", file=sys.stderr)

    stcn = PropagationNetwork(key_arch="resnet50", value_arch="resnet18",
                              top_k=top_k, dtype=dtype)
    fusion = FusionNet(dtype=dtype)
    ph, pw = h + (-h) % 16, w + (-w) % 16
    sp = stcn.init(jax.random.PRNGKey(0), jnp.zeros((ph, pw, 3), dtype),
                   jnp.zeros((1, ph, pw), dtype), method="init_all")
    fp = FusionNet(dtype=dtype).init(
        jax.random.PRNGKey(1), jnp.zeros((ph, pw, 3), dtype),
        jnp.zeros((ph, pw), dtype), jnp.zeros((ph, pw), dtype),
        jnp.zeros((ph, pw, 2), dtype), jnp.zeros((2,), dtype))
    cfg = EngineConfig(mem_freq=5, top_k=top_k, max_interactions=60,
                       feature_chunk=2)
    engine = InferenceEngine(stcn, fusion, sp, fp, cfg)

    images, gt = synthetic_video(t, h, w, num_objects=1, seed=0)

    # SAM + policy nets, same as bench.eva_vos_round_rate
    from bench import build_jax_sam
    controller = build_jax_sam()
    scfg = controller.predictor.cfg
    emb_shape = (1, scfg.grid, scfg.grid, scfg.prompt_embed_dim)

    qnet = QualityNet(merge_strategy="cat", arch="resnet18", n_labels=20)
    qv = qnet.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 224, 224, 3)))
    qnet_extract = jax.jit(
        lambda imgs, masks: qnet.apply(qv, imgs, masks,
                                       method="extract_features"))
    rl = ActorCritic(out_dim=2, arch="resnet18", dropout=0.0)
    rv = rl.init(jax.random.PRNGKey(1), jnp.zeros(emb_shape),
                 jnp.zeros((1, 224, 224, 3)))
    rl_fwd = jax.jit(lambda emb, mask: rl.apply(rv, emb, mask))

    phase = {}
    rounds_log = []

    def timed(name, fn):
        def wrapper(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            dt = time.perf_counter() - t0
            phase[name] = phase.get(name, 0.0) + dt
            rounds_log.append((name, round(dt, 3)))
            return out
        return wrapper

    # wrap the module-level bindings the loop calls
    multiple.annotate_inner = multiple.annotate
    multiple.annotate = timed("annotate", multiple.annotate)
    multiple.eval_session_metric = timed("metric", multiple.eval_session_metric)
    multiple.qnet_frame_selection = timed(
        "qnet", multiple.qnet_frame_selection)

    # interact: sync on a 4-byte field so its device time lands here,
    # not inside the next metric fetch
    orig_interact = ieval.Session.interact

    def interact_synced(self, mask, idx):
        out = orig_interact(self, mask, idx)
        jax.device_get(self.state.certain_count)
        return out
    ieval.Session.interact = timed("interact", interact_synced)

    annotator = Annotator(controller)
    annotator.set_image_to_sam = timed("encode", annotator.set_image_to_sam)

    calls = [0]

    def rl_act(emb, mask224):
        t0 = time.perf_counter()
        _, value = rl_fwd(jnp.asarray(emb), jnp.asarray(mask224))
        v = float(value.squeeze())
        phase["rl_fwd"] = phase.get("rl_fwd", 0.0) + time.perf_counter() - t0
        calls[0] += 1
        return calls[0] % 2, v

    sample = VideoSample(name="bench__1", images01=images, gt=gt)

    # warm-up compiles (same as bench)
    jax.block_until_ready(qnet_extract(jnp.zeros((t, 224, 224, 3)),
                                       jnp.zeros((t, 224, 224, 3))))
    jax.block_until_ready(rl_fwd(jnp.zeros(emb_shape),
                                 jnp.zeros((1, 224, 224, 3))))

    rounds = 6
    t0 = time.perf_counter()
    mu, times, values, actions, metrics, frames = eva_vos(
        qnet_extract, rl_act, rounds, engine, sample, annotator,
        annotation_types=("3clicks", "mask"), eval_metric="j")
    elapsed = time.perf_counter() - t0

    attributed = sum(phase.values())
    out = {
        "rounds": len(mu),
        "elapsed_s": round(elapsed, 2),
        "s_per_round": round(elapsed / len(mu), 2),
        "phase_totals_s": {k: round(v, 2) for k, v in sorted(
            phase.items(), key=lambda kv: -kv[1])},
        "attributed_s": round(attributed, 2),
        "unattributed_s": round(elapsed - attributed, 2),
        "actions": list(actions),
        "per_call": rounds_log,
    }
    print(json.dumps(out, indent=1))
    with open("/root/repo/experiments/r4_evavos_profile.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
