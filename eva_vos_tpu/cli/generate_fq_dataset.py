"""FQ (frame-quality) dataset generator for QNet training.

Behavior parity target: ``generate_fq_dataset.py`` + ``util/fq_dataset.py``
in the reference: run 8 oracle-mask rounds per (video, object) on MOSE,
save each round's propagated masks at 224p plus the 224p RGB frames, and a
``res_<imset>.csv`` with the per-state IoU lists; skip states where the
worst frame isn't the oracle pick (a consistency filter the reference
applies at ``generate_fq_dataset.py:72-75``).

Usage:
    python -m eva_vos_tpu.cli.generate_fq_dataset --imset train --rounds 8
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np

from ..utils.paths import DataPaths
from ..utils.seeding import seed_everything
from ..engine import InferenceEngine
from ..engine.propagation import EngineConfig
from ..interactions.mask import oracle_mask_dataset
from ..ops.resize import resize_nearest, resize_bicubic


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--imset", default="train")
    p.add_argument("--db", default="MOSE")
    p.add_argument("--rounds", type=int, default=8)
    p.add_argument("--metric", default="j", choices=["j", "j_and_f"])
    p.add_argument("--min-idx", type=int)
    p.add_argument("--max-idx", type=int)
    p.add_argument("--out", default=None, help="defaults to <data>/FQ_DB")
    p.add_argument("--allow-random", action="store_true")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    return p


def save_state_masks(out_root: Path, state_name: str, gen_masks: np.ndarray):
    """gen_masks [T, H, W] 0/1 -> 224p PNGs under Annotations/224/<state>/."""
    from PIL import Image
    import jax.numpy as jnp

    d = out_root / "Annotations" / "224" / state_name
    os.makedirs(d, exist_ok=True)
    m224 = np.asarray(resize_nearest(jnp.asarray(gen_masks), (224, 224),
                                     h_axis=1, w_axis=2))
    for f in range(m224.shape[0]):
        Image.fromarray((m224[f] * 255).astype(np.uint8)).save(
            d / f"{f:05d}.png")


def save_frames(out_root: Path, video_name: str, images01: np.ndarray):
    from PIL import Image
    import jax.numpy as jnp

    d = out_root / "RGBFrames" / "224" / video_name
    if d.exists():
        return
    os.makedirs(d, exist_ok=True)
    x = jnp.asarray(images01)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    im224 = np.asarray(resize_bicubic(x, (224, 224), h_axis=1, w_axis=2))
    im224 = (np.clip(im224, 0, 1) * 255).astype(np.uint8)
    for f in range(im224.shape[0]):
        Image.fromarray(im224[f]).save(d / f"{f:05d}.png")


def main(argv=None):
    args = build_parser().parse_args(argv)
    seed_everything()

    import jax.numpy as jnp

    from ..utils import model_zoo

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    stcn, sp = model_zoo.load_stcn(dtype=dtype,
                                   allow_random=args.allow_random)
    fusion, fp = model_zoo.load_fusion(dtype=dtype,
                                       allow_random=args.allow_random)
    engine = InferenceEngine(stcn, fusion, sp, fp,
                             EngineConfig(max_interactions=args.rounds + 2))

    out_root = Path(args.out) if args.out else DataPaths.db_root("FQ_DB")

    if args.synthetic:
        from ..data.datasets import make_synthetic_sample

        samples = (make_synthetic_sample(t=6, h=64, w=96, seed=i)
                   for i in range(args.synthetic))
    else:
        from ..data.datasets import AnnotationDataset

        root = DataPaths.db_root(args.db)
        imset = root / "ImageSets" / f"{args.imset}.txt"
        samples = AnnotationDataset(root, imset, min_idx=args.min_idx,
                                    max_idx=args.max_idx)

    rows = []
    for sample in samples:
        gen_per_round, frames, metric_list, _times = oracle_mask_dataset(
            args.rounds, engine, sample, args.metric)
        video = sample.name.split("__")[0]
        save_frames(out_root, video, sample.images01)
        for r, (gen, worst, metric) in enumerate(
                zip(gen_per_round, frames, metric_list), start=1):
            # consistency filter: keep only states whose recorded worst frame
            # is the true argmin of the iou list
            if int(np.argmin(metric)) != worst:
                continue
            state_name = f"{sample.name}_round_{r}"
            save_state_masks(out_root, state_name, gen)
            rows.append({"state_name": state_name, "ious": str(list(metric))})
        print(f"[fq] {sample.name}: {len(gen_per_round)} rounds")

    import pandas as pd

    os.makedirs(out_root, exist_ok=True)
    out_csv = out_root / f"res_{args.imset}.csv"
    pd.DataFrame(rows).to_csv(out_csv, index=False)
    print(f"[done] {len(rows)} states -> {out_csv}")


if __name__ == "__main__":
    main()
