"""Feature extractors and the vis plotting surface."""

import numpy as np
import pandas as pd
import pytest


class TestEvalTransform:
    def test_resize_crop_normalize(self, rng):
        from eva_vos_tpu.models.feature_extractors import eval_transform

        x = rng.uniform(0, 1, (2, 300, 400, 3)).astype(np.float32)
        out = np.asarray(eval_transform(x))
        assert out.shape == (2, 224, 224, 3)
        # ImageNet normalization: uniform [0,1] input -> mean near
        # (0.5 - mean)/std per channel
        assert abs(out[..., 0].mean() - (0.5 - 0.485) / 0.229) < 0.05


class TestBuildFeatureExtractor:
    def test_resnet_random_init(self, rng):
        from eva_vos_tpu.models.feature_extractors import build_feature_extractor

        extract = build_feature_extractor("resnet18", allow_random=True)
        feats = extract(rng.uniform(0, 1, (2, 64, 96, 3)).astype(np.float32))
        assert feats.shape[0] == 2 and feats.ndim == 2

    @pytest.mark.slow
    def test_vit_random_init(self, rng):
        from eva_vos_tpu.models.feature_extractors import build_feature_extractor

        extract = build_feature_extractor("dino_small", allow_random=True)
        feats = extract(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        assert feats.shape == (1, 384)

    def test_unknown_arch(self):
        from eva_vos_tpu.models.feature_extractors import build_feature_extractor

        with pytest.raises(AttributeError):
            build_feature_extractor("alexnet", allow_random=True)

    def test_missing_weights_without_allow_random(self):
        from eva_vos_tpu.models.feature_extractors import build_feature_extractor

        with pytest.raises(FileNotFoundError):
            build_feature_extractor("resnet18", allow_random=False)


class TestPlots:
    def test_plot_experiments_writes_png(self, tmp_path):
        from eva_vos_tpu.vis.plots import plot_experiments

        df = pd.DataFrame({
            "video": ["a"] * 3, "mu_metric": [0.4, 0.6, 0.7],
            "annotation_time": [80, 80, 3], "round": [0, 1, 2]})
        df.to_csv(tmp_path / "rand_mask.csv", index=False)
        out = plot_experiments(str(tmp_path), str(tmp_path / "curves.png"))
        assert (tmp_path / "curves.png").exists()
