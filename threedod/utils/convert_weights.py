"""PyTorch checkpoint -> flax params converters.

Covers the external model weights the reference downloads
(download_models.sh / depth/download_models.sh): Depth-Anything-V2 metric
checkpoints (DINOv2 ViT + DPT head) and torchvision-style ResNet trunks.
Conversions are pure key/layout mapping:
  Linear   (out, in)        -> kernel (in, out)
  Conv2d   (O, I, kh, kw)   -> kernel (kh, kw, I, O)
  ConvT2d  (I, O, kh, kw)   -> kernel (kh, kw, O, I) with transpose_kernel
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x):
    return np.asarray(x)


def linear(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv_transpose(sd, prefix):
    # torch ConvTranspose2d weight: (in, out, kh, kw). flax ConvTranspose
    # with transpose_kernel=True expects (kh, kw, out, in).
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def layernorm(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def batchnorm_params(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def batchnorm_stats(sd, prefix):
    return {"mean": _t(sd[f"{prefix}.running_mean"]), "var": _t(sd[f"{prefix}.running_var"])}


def convert_dinov2(sd: Dict, prefix: str = "pretrained", depth: int = 12) -> Dict:
    """DINOv2 ViT params -> flax tree for models.depth.dinov2."""
    p = {
        "cls_token": _t(sd[f"{prefix}.cls_token"]),
        "pos_embed": _t(sd[f"{prefix}.pos_embed"]),
        "patch_embed": conv(sd, f"{prefix}.patch_embed.proj"),
        "norm": layernorm(sd, f"{prefix}.norm"),
    }
    for i in range(depth):
        b = f"{prefix}.blocks.{i}"
        p[f"block{i}"] = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "norm2": layernorm(sd, f"{b}.norm2"),
            "attn": {"qkv": linear(sd, f"{b}.attn.qkv"), "proj": linear(sd, f"{b}.attn.proj")},
            "mlp": {"fc1": linear(sd, f"{b}.mlp.fc1"), "fc2": linear(sd, f"{b}.mlp.fc2")},
            "ls1_gamma": _t(sd[f"{b}.ls1.gamma"]),
            "ls2_gamma": _t(sd[f"{b}.ls2.gamma"]),
        }
    return p


def convert_dpt_head(sd: Dict, prefix: str = "depth_head") -> Dict:
    p = {}
    for i in range(4):
        p[f"project{i}"] = conv(sd, f"{prefix}.projects.{i}")
    p["resize0"] = conv_transpose(sd, f"{prefix}.resize_layers.0")
    p["resize1"] = conv_transpose(sd, f"{prefix}.resize_layers.1")
    p["resize3"] = conv(sd, f"{prefix}.resize_layers.3")
    for i in range(4):
        p[f"layer{i + 1}_rn"] = conv(sd, f"{prefix}.scratch.layer{i + 1}_rn")
    for i in range(1, 5):
        rn = f"{prefix}.scratch.refinenet{i}"
        block = {
            "resConfUnit2": {
                "conv1": conv(sd, f"{rn}.resConfUnit2.conv1"),
                "conv2": conv(sd, f"{rn}.resConfUnit2.conv2"),
            },
            "out_conv": conv(sd, f"{rn}.out_conv"),
        }
        # refinenet4 never uses resConfUnit1 (no residual input) but the
        # torch module still has the weights; keep them when present.
        if f"{rn}.resConfUnit1.conv1.weight" in sd and i != 4:
            block["resConfUnit1"] = {
                "conv1": conv(sd, f"{rn}.resConfUnit1.conv1"),
                "conv2": conv(sd, f"{rn}.resConfUnit1.conv2"),
            }
        p[f"refinenet{i}"] = block
    p["output_conv1"] = conv(sd, f"{prefix}.scratch.output_conv1")
    p["output_conv2_0"] = conv(sd, f"{prefix}.scratch.output_conv2.0")
    p["output_conv2_2"] = conv(sd, f"{prefix}.scratch.output_conv2.2")
    return p


def convert_depth_anything_v2(state_dict: Dict, encoder: str = "vits") -> Dict:
    """Full DA-V2 checkpoint -> flax params for models.depth.DepthAnythingV2."""
    depth = {"vits": 12, "vitb": 12, "vitl": 24}[encoder]
    sd = {k: v for k, v in state_dict.items()}
    return {
        "pretrained": convert_dinov2(sd, "pretrained", depth),
        "depth_head": convert_dpt_head(sd, "depth_head"),
    }


def load_torch_checkpoint(path: str) -> Dict:
    """Load a .pth state dict to numpy without needing CUDA."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
