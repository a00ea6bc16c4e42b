"""DPT decoder + DepthAnythingV2 metric-depth model in flax.

Parity target: depth/metric_depth/depth_anything_v2/dpt.py (:37-222) and
util/blocks.py: per-level 1x1 projections + resize layers, scratch 3x3
convs, four FeatureFusionBlocks (ResidualConvUnit pairs with align-corners
bilinear upsampling), sigmoid output scaled by max_depth.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .dinov2 import INTERMEDIATE_LAYER_IDX, build_dinov2

DEPTH_MODEL_CONFIGS = {
    # reference cubercnn/data/generate_depth_maps.py:13-17
    "vits": {"features": 64, "out_channels": (48, 96, 192, 384)},
    "vitb": {"features": 128, "out_channels": (96, 192, 384, 768)},
    "vitl": {"features": 256, "out_channels": (256, 512, 1024, 1024)},
}


def resize_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with torch align_corners=True semantics (NHWC)."""
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    dy = (ys - y0)[None, :, None, None]
    dx = (xs - x0)[None, None, :, None]
    v00 = x[:, y0][:, :, x0]
    v01 = x[:, y0][:, :, x1]
    v10 = x[:, y1][:, :, x0]
    v11 = x[:, y1][:, :, x1]
    return (
        v00 * (1 - dy) * (1 - dx)
        + v01 * (1 - dy) * dx
        + v10 * dy * (1 - dx)
        + v11 * dy * dx
    )


class ResidualConvUnit(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, res=None, size: Tuple[int, int] | None = None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype, name="resConfUnit1")(res)
        x = ResidualConvUnit(self.features, dtype=self.dtype, name="resConfUnit2")(x)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_align_corners(x, size[0], size[1])
        return nn.Conv(self.features, (1, 1), dtype=self.dtype, name="out_conv")(x)


class DPTHead(nn.Module):
    features: int
    out_channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, patch_h: int, patch_w: int):
        """tokens: 4 x (patch_tokens (B, N, D)); returns depth01 (B, 14h, 14w)."""
        outs = []
        for i, t in enumerate(tokens):
            b, n, d = t.shape
            x = t.reshape(b, patch_h, patch_w, d).astype(self.dtype)
            x = nn.Conv(self.out_channels[i], (1, 1), dtype=self.dtype, name=f"project{i}")(x)
            if i == 0:
                x = nn.ConvTranspose(
                    self.out_channels[0], (4, 4), strides=(4, 4), transpose_kernel=True, dtype=self.dtype, name="resize0"
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    self.out_channels[1], (2, 2), strides=(2, 2), transpose_kernel=True, dtype=self.dtype, name="resize1"
                )(x)
            elif i == 3:
                x = nn.Conv(
                    self.out_channels[3], (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="resize3",
                )(x)
            outs.append(x)

        rn = [
            nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype, name=f"layer{i + 1}_rn")(o)
            for i, o in enumerate(outs)
        ]

        path4 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3]
        )
        path3 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet3")(
            path4, rn[2], size=rn[1].shape[1:3]
        )
        path2 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet2")(
            path3, rn[1], size=rn[0].shape[1:3]
        )
        path1 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet1")(
            path2, rn[0]
        )

        out = nn.Conv(self.features // 2, (3, 3), padding="SAME", dtype=self.dtype, name="output_conv1")(path1)
        out = resize_align_corners(out, patch_h * 14, patch_w * 14)
        out = nn.Conv(32, (3, 3), padding="SAME", dtype=self.dtype, name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), dtype=jnp.float32, name="output_conv2_2")(out.astype(jnp.float32))
        return jax.nn.sigmoid(out)[..., 0]


class DepthAnythingV2(nn.Module):
    """Metric-depth DA-V2 (dpt.py:152-222): sigmoid * max_depth."""

    encoder: str = "vits"
    max_depth: float = 20.0
    dtype: Any = jnp.float32

    def setup(self):
        cfgd = DEPTH_MODEL_CONFIGS[self.encoder]
        self.pretrained = build_dinov2(self.encoder, dtype=self.dtype)
        self.depth_head = DPTHead(
            features=cfgd["features"], out_channels=cfgd["out_channels"], dtype=self.dtype
        )

    def __call__(self, x):
        """x: (B, H, W, 3) normalized RGB (ImageNet mean/std), H, W % 14 == 0."""
        layer_ids = INTERMEDIATE_LAYER_IDX[self.encoder]
        feats, hp, wp = self.pretrained.get_intermediate_layers(x, layer_ids)
        tokens = [f[0] for f in feats]
        depth01 = self.depth_head(tokens, hp, wp)
        return depth01 * self.max_depth


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess_image(img_rgb01: jnp.ndarray, input_size: int = 518) -> jnp.ndarray:
    """Resize (lower-bound, multiple of 14) + ImageNet-normalise.

    img_rgb01: (H, W, 3) floats in [0, 1]. Mirrors dpt.py image2tensor.
    """
    h, w = img_rgb01.shape[:2]
    scale = input_size / min(h, w)
    nh = int(round(h * scale / 14.0) * 14)
    nw = int(round(w * scale / 14.0) * 14)
    x = jax.image.resize(img_rgb01, (nh, nw, 3), method="cubic")
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x[None]
