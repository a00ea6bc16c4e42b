from .backbones import build_backbone
from .heads import BoxHeadMLP, BoxPredictor, CubeHeadNet, ScoreHeadNet
from .meta_arch import RCNN3D, build_model
from .roi_heads3d import Detections, ROIHeads3D, SampledROIs, scale_Ks
from .rpn import RPN, Proposals, RPNHead, generate_anchors
