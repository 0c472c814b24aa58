"""r4: SAM-path profile on TPU.

(a) re-measures the annotator decode chain with the fused on-device
    selection (predict_select) — the r4_bench_full1 capture recorded
    7466 ms for the warm-start chain because every click round fetched
    ~5 MB of full-res logits through the ~13 MB/s device tunnel;
(b) decomposes the ViT-H 1024^2 encode (346 ms recorded = ~6%% of v5e
    bf16 peak on the ~4.5 TFLOP model) into windowed-block, global-block
    and rel-pos components via encoder variants, to pick the next lever.

Timing follows the sync-probe methodology: jitted calls chained through a
real data dependency, ONE scalar fetch at the end (block_until_ready alone
under-reports through the tunnel; per-call device_get inflates).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

RESULT = {}


def timed_chain(fn, x, n=3, dep=True):
    out = fn(x)
    jax.device_get(jnp.sum(out).astype(jnp.float32))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n):
        if dep:
            x = x * (1.0 + 0.0 * jnp.mean(out).astype(x.dtype))
        out = fn(x)
    jax.device_get(jnp.sum(out).astype(jnp.float32))
    return (time.perf_counter() - t0) / n * 1e3  # ms/call


def part_a_decode_chain():
    from bench import build_jax_sam, sam_bench

    controller = build_jax_sam()
    out = sam_bench(controller)
    RESULT["fused_sam_encode_ms"] = out.get("sam_encode_ms")
    RESULT["fused_sam_decode_chain_ms"] = out.get("sam_decode_chain_ms")
    print(json.dumps(RESULT), flush=True)
    return controller


def part_b_encoder_variants():
    from eva_vos_tpu.models.sam import image_encoder as ie

    img = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((1, 1024, 1024, 3)), jnp.bfloat16)

    def build(depth, globals_, use_rel_pos=True, label=""):
        ie.VitAttention.use_rel_pos = use_rel_pos  # probe-only default flip
        enc = ie.ImageEncoderViT(
            img_size=1024, patch_size=16, embed_dim=1280, depth=depth,
            num_heads=16, out_chans=256, window_size=14,
            global_attn_indexes=globals_, dtype=jnp.bfloat16)
        # zeros via eval_shape: matmul cost is weight-independent and the
        # real init would be one more slow remote compile per variant
        shapes = jax.eval_shape(enc.init, jax.random.PRNGKey(0), img)
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        fn = jax.jit(lambda x: enc.apply(params, x))
        ms = timed_chain(fn, img)
        ie.VitAttention.use_rel_pos = True
        print(f"[probe] {label}: {ms:.1f} ms", file=sys.stderr, flush=True)
        return ms

    # full ViT-H: 28 windowed + 4 global
    RESULT["enc_full32_ms"] = round(build(32, (7, 15, 23, 31),
                                          label="full32"), 1)
    # all-windowed 32: isolates windowed-block cost (full - this ~= global
    # premium over windowed for 4 blocks)
    RESULT["enc_win32_ms"] = round(build(32, (), label="win32"), 1)
    # 4 global blocks only (plus patch embed + neck)
    RESULT["enc_glob4_ms"] = round(build(4, (0, 1, 2, 3), label="glob4"), 1)
    # rel-pos ablations
    RESULT["enc_win32_norel_ms"] = round(
        build(32, (), use_rel_pos=False, label="win32_norel"), 1)
    RESULT["enc_glob4_norel_ms"] = round(
        build(4, (0, 1, 2, 3), use_rel_pos=False, label="glob4_norel"), 1)
    print(json.dumps(RESULT), flush=True)


def main():
    print(f"[probe] device: {jax.devices()[0].device_kind}",
          file=sys.stderr, flush=True)
    part_a_decode_chain()
    part_b_encoder_variants()
    with open("/root/repo/experiments/r4_sam_profile.json", "w") as f:
        json.dump(RESULT, f, indent=1)
    print(json.dumps(RESULT), flush=True)


if __name__ == "__main__":
    main()
