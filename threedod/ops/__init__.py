from .losses import (
    binary_cross_entropy_with_logits,
    cross_entropy,
    dice_loss,
    safely_reduce_losses,
    sigmoid_focal_loss,
    smooth_l1_loss,
)
from .matcher import (
    MatchResult,
    apply_ignore_regions,
    match_candidates,
    subsample_fg_bg,
    weighted_topk_sample,
)
from .nms import batched_nms, nms_mask, nms_mask_blocked, topk_by_mask
from .roi_align import (
    assign_fpn_levels,
    multilevel_roi_align,
    multilevel_roi_align_dense,
    multilevel_roi_align_windowed,
    roi_align,
)
