from .dinov2 import (
    INTERMEDIATE_LAYER_IDX,
    VIT_SPECS,
    DinoVisionTransformer,
    build_dinov2,
)
from .dpt import (
    DEPTH_MODEL_CONFIGS,
    DepthAnythingV2,
    DPTHead,
    preprocess_image,
    resize_align_corners,
)
