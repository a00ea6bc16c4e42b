from .scorefunction import (
    combined_score,
    min_area_rect,
    score_corners,
    score_dimensions,
    score_iou,
    score_mod_segmentation,
    score_point_cloud,
    score_ratios,
    score_segmentation,
    score_segmentation_pair,
)
