"""vis: experiment aggregation and the Eq. 3 video ranking."""

import numpy as np
import pandas as pd
import pytest

from eva_vos_tpu.vis import read_exp, rank_policy

pytestmark = pytest.mark.smoke


def simple_exp_csv(tmp_path):
    df = pd.DataFrame({
        "video": ["a", "a", "b", "b"],
        "mu_metric": [0.5, 0.7, 0.4, 0.6],
        "annotation_time": [80, 80, 80, 3],
        "round": [0, 1, 0, 1],
    })
    p = tmp_path / "rand_mask.csv"
    df.to_csv(p, index=False)
    return p


def ranking_csv(tmp_path, name="oracle_oracle.csv", with_rl=False):
    rows = []
    for vid, qualities in [("a", [[0.2, 0.4], [0.9, 0.4], [0.9, 0.95]]),
                           ("b", [[0.3, 0.3], [0.5, 0.6], [0.9, 0.9]])]:
        for r, q in enumerate(qualities):
            row = {
                "video": vid,
                "mu_metric": float(np.mean(q)),
                "annotation_time": 80,
                "round": r,
                "round_metrics": str(q),
                "annotated_frames": r % 2,
                "annotation_actions": "mask",
            }
            if with_rl:
                row["rl_values"] = 0.1 * (r + 1)
            rows.append(row)
    p = tmp_path / name
    pd.DataFrame(rows).to_csv(p, index=False)
    return p


class TestReadExp:
    def test_simple_aggregation(self, tmp_path):
        hours, metric = read_exp(str(simple_exp_csv(tmp_path)))
        np.testing.assert_allclose(metric, [0.45, 0.65])
        np.testing.assert_allclose(hours, [160 / 3600, 243 / 3600])

    def test_oracle_uses_ranking(self, tmp_path):
        hours, metric = read_exp(str(ranking_csv(tmp_path)))
        assert len(hours) == len(metric)
        assert len(metric) >= 2
        assert metric[-1] > metric[0]  # quality improves over time

    def test_eva_vos_uses_rl_ranking(self, tmp_path):
        p = ranking_csv(tmp_path, name="eva_vos.csv", with_rl=True)
        hours, metric = read_exp(str(p))
        assert len(metric) >= 2


class TestRankPolicy:
    def test_greedy_picks_highest_reward_first(self, tmp_path):
        df = pd.read_csv(ranking_csv(tmp_path))
        hours, points = rank_policy(df)
        # Rewards use the frame recorded in the NEXT round's row (frame 1):
        # video a: 0.4 -> 0.4 (reward 0); video b: 0.3 -> 0.6 (reward
        # 0.3/80) -> the first greedy step advances video b, giving mean
        # quality (a@0 + b@1) / 2 = (0.3 + 0.55) / 2.
        assert points[1] == pytest.approx((0.3 + 0.55) / 2)
        # times accumulate: initial 160 then +80 per step
        np.testing.assert_allclose(hours[:2] * 3600, [160, 240])

    def test_monotone_time(self, tmp_path):
        df = pd.read_csv(ranking_csv(tmp_path))
        hours, points = rank_policy(df)
        assert (np.diff(hours) > 0).all()


def test_overlays_render(tmp_path):
    """Annotator debug overlays (reference annotator/util.py:16-53):
    mask/points/box render onto an Agg axes and the session composer
    writes a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from eva_vos_tpu.vis import (show_mask, show_mask_thickness, show_points,
                                 show_box, save_click_session)

    h, w = 32, 48
    mask = np.zeros((h, w)); mask[8:20, 10:30] = 1
    fig, ax = plt.subplots()
    show_mask(mask, ax)
    show_mask_thickness(mask, ax, thickness=3)
    show_points(np.array([[12.0, 9.0], [40.0, 28.0], [20.0, 15.0]]),
                np.array([1, 0, 2]), ax)
    show_box([10, 8, 30, 20], ax)
    # boundary ring: dilation-xor produces white pixels around the mask
    plt.close(fig)

    img = np.random.default_rng(0).random((h, w, 3))
    out = tmp_path / "session.png"
    save_click_session(img, mask, str(out),
                       coords=np.array([[12.0, 9.0]]), labels=np.array([1]),
                       box=[10, 8, 30, 20], gt_mask=mask, title="round 3")
    assert out.exists() and out.stat().st_size > 0
