"""CLI smoke tests on synthetic data (tiny models via EVAVOS_TINY)."""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(autouse=True)
def tiny_models(monkeypatch):
    monkeypatch.setenv("EVAVOS_TINY", "1")


class TestEvalCLI:
    @pytest.mark.slow
    def test_oracle_mask_synthetic(self, tmp_path):
        from eva_vos_tpu.cli.eval_annotation_method import main

        path = main(["--policy", "oracle_mask", "--synthetic", "1",
                     "--rounds", "2", "--allow-random", "--metric", "j",
                     "--top-k", "8", "--out-dir", str(tmp_path)])
        df = pd.read_csv(path)
        assert list(df.columns) == ["video", "mu_metric", "annotation_time",
                                    "round", "weights"]
        # random-init smoke runs carry a loud marker on every row
        assert (df["weights"] == "RANDOM_WEIGHTS").all()
        assert len(df) == 2
        assert (df["annotation_time"] > 0).all()

    @pytest.mark.slow
    def test_resume_skips_done_videos(self, tmp_path):
        from eva_vos_tpu.cli.eval_annotation_method import main

        p1 = main(["--policy", "oracle_mask", "--synthetic", "1",
                   "--rounds", "2", "--allow-random", "--metric", "j",
                   "--top-k", "8", "--out-dir", str(tmp_path), "--resume"])
        before = pd.read_csv(p1)
        # rerun with 2 synthetic videos: video 0 must be skipped, 1 appended
        p2 = main(["--policy", "oracle_mask", "--synthetic", "2",
                   "--rounds", "2", "--allow-random", "--metric", "j",
                   "--top-k", "8", "--out-dir", str(tmp_path), "--resume"])
        after = pd.read_csv(p2)
        assert set(after["video"]) == {"synthetic_0__1", "synthetic_1__1"}
        # video 0's rows are identical (not recomputed)
        np.testing.assert_allclose(
            after[after.video == "synthetic_0__1"]["mu_metric"].to_numpy(),
            before["mu_metric"].to_numpy())


class TestPolicyString:
    def test_types_in_policy_string(self):
        from eva_vos_tpu.cli.eval_annotation_method import (build_parser,
                                                            policy_string)

        args = build_parser().parse_args(
            ["--policy", "oracle_oracle", "--types", "3clicks", "mask"])
        assert policy_string(args) == "oracle_oracle_3clicks_mask"

    def test_invalid_type_rejected(self):
        from eva_vos_tpu.cli.eval_annotation_method import (build_parser,
                                                            policy_string)

        args = build_parser().parse_args(
            ["--policy", "rand_type", "--types", "scribble"])
        with pytest.raises(AttributeError):
            policy_string(args)

    def test_idx_range_suffix(self):
        from eva_vos_tpu.cli.eval_annotation_method import (build_parser,
                                                            policy_string)

        args = build_parser().parse_args(
            ["--policy", "rand_mask", "--min-idx", "0", "--max-idx", "9"])
        assert policy_string(args) == "rand_maskfrom_0_to_9"
