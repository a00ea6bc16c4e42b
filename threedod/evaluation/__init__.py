from .inference import (
    gather_predictions,
    Omni3DEvaluationHelper,
    detections_to_coco_json,
    gts_from_records,
    inference_on_dataset,
)
from .omni3d_eval import Omni3DEval, Omni3DParams, iou_2d_xywh, iou_3d_corners
