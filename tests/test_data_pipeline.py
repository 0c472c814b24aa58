"""Data-pipeline integration: generators -> datasets -> trainers.

Chains the FQ-dataset generator (oracle rounds on synthetic videos) into
MaskQualityDB and one QNet train step, and the annotation-dataset generator
into AnnotTypeDB — the full reference data flow without any downloads.
"""

import os
from pathlib import Path

import numpy as np
import jax
import pytest

from eva_vos_tpu.data.datasets import (MaskQualityDB, AnnotTypeDB,
                                       AnnotationDataset, IOU_BINS)


class TestIoUBinning:
    def test_bins_match_reference_discretization(self):
        db = MaskQualityDB.__new__(MaskQualityDB)  # no files needed
        assert MaskQualityDB.iou_to_label(0.0) == 0
        assert MaskQualityDB.iou_to_label(0.04) == 0
        assert MaskQualityDB.iou_to_label(0.05) == 0  # boundary -> lower bin
        assert MaskQualityDB.iou_to_label(0.051) == 1
        assert MaskQualityDB.iou_to_label(1.0) == 19
        with pytest.raises(ValueError):
            MaskQualityDB.iou_to_label(1.5)

    def test_bins_array(self):
        assert len(IOU_BINS) == 21
        np.testing.assert_allclose(IOU_BINS[1] - IOU_BINS[0], 0.05)


@pytest.fixture(scope="module")
def fq_db_dir(tmp_path_factory):
    """Run the FQ generator on synthetic videos into a temp dir."""
    out = tmp_path_factory.mktemp("fq_db")
    from eva_vos_tpu.cli.generate_fq_dataset import main

    main(["--synthetic", "2", "--rounds", "2", "--imset", "train",
          "--allow-random", "--out", str(out)])
    return out


@pytest.mark.slow  # module-scoped generator fixture dominates (minutes on CPU)
class TestFQPipeline:
    def test_generator_output_layout(self, fq_db_dir):
        assert (fq_db_dir / "res_train.csv").exists()
        states = list((fq_db_dir / "Annotations" / "224").iterdir())
        assert len(states) >= 1
        frames = list((fq_db_dir / "RGBFrames" / "224").iterdir())
        assert len(frames) == 2  # one dir per video

    def test_mask_quality_db_loads(self, fq_db_dir):
        db = MaskQualityDB(fq_db_dir, fq_db_dir / "res_train.csv")
        assert len(db) > 0
        item = db[0]
        assert item["img"].shape == (224, 224, 3)
        assert item["mask"].shape == (224, 224)
        assert 0 <= item["label"] < 20

    def test_batches_and_train_step(self, fq_db_dir):
        from eva_vos_tpu.train import QNetTrainer
        from eva_vos_tpu.parallel import make_mesh

        db = MaskQualityDB(fq_db_dir, fq_db_dir / "res_train.csv")
        rng = np.random.default_rng(0)
        # batch of 8 divides the 8-device mesh
        batch = next(db.batches(8, rng=rng, drop_last=False)) \
            if len(db) >= 8 else None
        if batch is None:
            items = [db[i % len(db)] for i in range(8)]
            batch = {
                "img": np.stack([it["img"] for it in items]),
                "mask": np.stack([it["mask"] for it in items]),
                "label": np.asarray([it["label"] for it in items], np.int32),
            }
        trainer = QNetTrainer(arch="resnet18", lr=1e-3, mesh=make_mesh(8))
        state = trainer.init(jax.random.PRNGKey(0), image_size=224)
        state, metrics = trainer.train_step(state, batch,
                                            jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
class TestTrainQNetCLI:
    def test_one_epoch_over_generated_db(self, fq_db_dir, tmp_path,
                                         monkeypatch):
        """train_qnet CLI end-to-end over the generated FQ dataset."""
        import shutil

        # the CLI expects res_<train-set>.csv and res_val.csv under FQ_DB
        shutil.copy(fq_db_dir / "res_train.csv", fq_db_dir / "res_val.csv")
        monkeypatch.setenv("EVAVOS_DATA_ROOT", str(fq_db_dir.parent))
        (fq_db_dir.parent / "FQ_DB").exists() or shutil.copytree(
            fq_db_dir, fq_db_dir.parent / "FQ_DB")

        from eva_vos_tpu.cli.train_qnet import main

        out = tmp_path / "qnet_out"
        main(["--epochs", "1", "--batch-size", "8", "--train-set", "train",
              "--lr", "1e-3", "--out", str(out)])
        assert (out / "qnet_ckpt").exists()

        from eva_vos_tpu.utils.checkpoint import restore_checkpoint

        ck = restore_checkpoint(out / "qnet_ckpt")
        assert "params" in ck and "batch_stats" in ck


@pytest.fixture(scope="module")
def annot_db_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("annot_db")
    from eva_vos_tpu.cli.generate_annotation_dataset import main

    main(["--synthetic", "1", "--rounds", "3", "--imset", "train",
          "--sam", "fake", "--allow-random", "--out", str(out)])
    return out


@pytest.mark.slow
class TestAnnotPipeline:
    def test_generator_output(self, annot_db_dir):
        import pandas as pd

        csv = annot_db_dir / "train.csv"
        assert csv.exists()
        df = pd.read_csv(csv)
        assert {"id", "video_name", "frame_num", "frame_cost",
                "selected_annotation", "init_iou"} <= set(df.columns)
        assert len(df) >= 1
        row = df.iloc[0]
        assert (annot_db_dir / "Images" / f"{row['id']}.png").exists()
        assert (annot_db_dir / "Masks" / f"{row['id']}.png").exists()
        emb = np.load(annot_db_dir / "SAM_Embeddings" / f"{row['id']}.npy")
        assert emb.shape == (256, 64, 64)


def save_palette_png(arr: np.ndarray, path):
    """Save object-id maps as a REAL palette PNG — without ``putpalette``
    PIL re-quantizes on ``convert('P')`` and collapses the ids (DAVIS/MOSE
    annotations always carry an explicit palette)."""
    from PIL import Image

    im = Image.fromarray(arr.astype(np.uint8), mode="P")
    im.putpalette([0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 255, 0]
                  + [0] * (768 - 12))
    im.save(path)


class TestAnnotationDataset:
    def test_davis_layout_roundtrip(self, tmp_path):
        """Write a minimal DAVIS-style tree and read it back."""
        from PIL import Image
        from eva_vos_tpu.data import synthetic_video

        root = tmp_path / "DAVIS_17"
        images, masks = synthetic_video(3, 32, 48, num_objects=2, seed=1)
        vid = "videoA"
        (root / "JPEGImages" / "480p" / vid).mkdir(parents=True)
        (root / "Annotations" / "480p" / vid).mkdir(parents=True)
        for f in range(3):
            Image.fromarray((images[f] * 255).astype(np.uint8)).save(
                root / "JPEGImages" / "480p" / vid / f"{f:05d}.jpg")
            palette = np.where(masks[1, f] > 0, 2, masks[0, f]).astype(np.uint8)
            save_palette_png(palette,
                             root / "Annotations" / "480p" / vid / f"{f:05d}.png")
        imset = root / "ImageSets" / "set.txt"
        imset.parent.mkdir(parents=True)
        imset.write_text(f"{vid}\n")

        ds = AnnotationDataset(root, imset)
        assert len(ds) == 2  # one sample per object
        s0 = ds[0]
        assert s0.name == "videoA__1"
        assert s0.images01.shape == (3, 32, 48, 3)
        assert s0.gt.shape == (1, 3, 32, 48)
        # jpeg artifacts aside, images round-trip approximately
        assert abs(float(s0.images01.mean()) - float(images.mean())) < 0.05

    def test_min_max_idx_slicing(self, tmp_path):
        from PIL import Image
        from eva_vos_tpu.data import synthetic_video

        root = tmp_path / "db"
        images, masks = synthetic_video(2, 16, 16, num_objects=3, seed=2)
        vid = "v"
        (root / "JPEGImages" / "480p" / vid).mkdir(parents=True)
        (root / "Annotations" / "480p" / vid).mkdir(parents=True)
        for f in range(2):
            Image.fromarray((images[f] * 255).astype(np.uint8)).save(
                root / "JPEGImages" / "480p" / vid / f"{f:05d}.jpg")
            palette = np.zeros(masks.shape[2:], np.uint8)
            for k in range(3):
                palette = np.where(masks[k, f] > 0, k + 1, palette)
            save_palette_png(palette,
                             root / "Annotations" / "480p" / vid / f"{f:05d}.png")
        imset = root / "set.txt"
        imset.write_text("v\n")

        ds = AnnotationDataset(root, imset, min_idx=1, max_idx=1)
        assert len(ds) == 1
        assert ds[0].name == "v__2"


@pytest.mark.slow
class TestRLAgentCLI:
    """CLI-level coverage of train_rl_agent (VERDICT r2 #4): the default
    path drives the vectorized fleet (batched_rollouts); --sequential keeps
    the reference's per-env loop.  Both train over a generated AnnotDB with
    the FakeSAM and write best + iteration checkpoints."""

    def _run(self, annot_db_dir, tmp_path, monkeypatch, extra):
        from eva_vos_tpu.cli.train_rl_agent import main

        monkeypatch.setenv("EVAVOS_DATA_ROOT", str(annot_db_dir.parent))
        out = tmp_path / ("rl_out_" + ("seq" if extra else "vec"))
        # the generated AnnotDB dir is named by mktemp; point AnnotDB at it
        import os
        link = annot_db_dir.parent / "AnnotDB"
        if not link.exists():
            os.symlink(annot_db_dir, link)
        # AnnotTypeDB reads gt from the sibling MOSE annotation tree;
        # synthesize it from the same deterministic synthetic video
        from eva_vos_tpu.data.datasets import make_synthetic_sample

        sample = make_synthetic_sample(t=6, h=64, w=96, seed=0)
        ann_dir = (annot_db_dir.parent / "MOSE" / "Annotations" / "480p"
                   / "synthetic_0")
        if not ann_dir.exists():
            ann_dir.mkdir(parents=True)
            for f in range(sample.gt.shape[1]):
                save_palette_png(sample.gt[0, f].astype(np.uint8),
                                 ann_dir / f"{f:05d}.png")
        argv = ["--rollouts", "4", "--num-envs", "2", "--num-steps", "2",
                "--mini-batch", "1", "--ppo-epochs", "1", "--sam", "fake",
                "--imset", "train", "--no-sample", "--out", str(out)] + extra
        main(argv)
        assert (out / "_checkpoint").exists()
        assert (out / "model").exists()
        from eva_vos_tpu.utils.checkpoint import restore_checkpoint

        ck = restore_checkpoint(out / "_checkpoint")
        assert int(ck["iters"]) >= 4
        return out

    def test_vectorized_default(self, annot_db_dir, tmp_path, monkeypatch):
        self._run(annot_db_dir, tmp_path, monkeypatch, [])

    def test_sequential_flag(self, annot_db_dir, tmp_path, monkeypatch):
        self._run(annot_db_dir, tmp_path, monkeypatch, ["--sequential"])
