from .vis_util import read_exp, rank_policy, PLOT_DATA, PLOT_DATA_ANNOTATIONS

__all__ = ["read_exp", "rank_policy", "PLOT_DATA", "PLOT_DATA_ANNOTATIONS"]
