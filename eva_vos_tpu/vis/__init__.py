from .vis_util import read_exp, rank_policy, PLOT_DATA, PLOT_DATA_ANNOTATIONS
from .overlays import (show_mask, show_mask_thickness, show_points, show_box,
                       save_click_session)

__all__ = ["read_exp", "rank_policy", "PLOT_DATA", "PLOT_DATA_ANNOTATIONS",
           "show_mask", "show_mask_thickness", "show_points", "show_box",
           "save_click_session"]
