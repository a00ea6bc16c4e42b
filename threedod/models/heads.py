"""Learnable heads: 2D box head/predictor, 3D cube head, score head.

Parity targets:
  FastRCNNConvFCHead + FastRCNNOutputLayers as configured by the reference
  (configs/Base.yaml ROI_BOX_HEAD: 2 FC x 1024),
  CubeHead (cubercnn/modeling/roi_heads/cube_head.py:24-202): per-class
  outputs for 2D-center deltas / dims / 6d-or-quat-or-euler pose / z (per
  cluster bin) / uncertainty, with shared or per-branch FC stacks and the
  reference's bias initialisations (z bias 1, uncertainty bias 5),
  ScoreHead (cube_head.py:205-239).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen.dtypes import promote_dtype

from ..geometry.rotations import (
    euler_xyz_to_matrix,
    normalize_quaternion,
    quaternion_to_matrix,
    rotation_6d_to_matrix,
)


def _xavier(scale=1.0):
    return nn.initializers.xavier_uniform()


def _normal(std):
    return nn.initializers.normal(stddev=std)


class SpatialPadDense(nn.Module):
    """First FC over flattened pooled ROI features, accepting spatially
    over-pooled input.

    The TPU ROIAlign kernel emits an (S+1)x(S+1) pool grid (its window math
    is 8-sublane aligned); slicing it back to SxS before the FC costs a
    full-tensor slice + relayout copy (~1.3 ms/step at inference ROI
    counts). Instead the head consumes the padded grid directly: params
    are declared at the valid S*S*C width (identical tree/init/apply to
    ``nn.Dense`` on the sliced input — parity suites and the zoo converter
    see no difference), and at apply time the kernel is zero-padded to the
    input's grid, so the extra rows contribute exactly 0 to every f32
    partial sum (finite inputs; 0-products are exact).
    """

    features: int
    valid_hw: int
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, hp, wp, c = x.shape
        vh = self.valid_hw
        kernel = self.param("kernel", self.kernel_init, (vh * vh * c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x2 = x.reshape(n, hp * wp * c)
        x2, kernel, bias = promote_dtype(x2, kernel, bias, dtype=self.dtype)
        if (hp, wp) != (vh, vh):
            kernel = jnp.pad(
                kernel.reshape(vh, vh, c, self.features),
                ((0, hp - vh), (0, wp - vh), (0, 0), (0, 0)),
            ).reshape(hp * wp * c, self.features)
        return jax.lax.dot_general(x2, kernel, (((1,), (0,)), ((), ()))) + bias


class BoxHeadMLP(nn.Module):
    """Pooled ROI features -> fc feature vector (FastRCNNConvFCHead)."""

    num_fc: int = 2
    fc_dim: int = 1024
    dtype: Any = jnp.float32
    pool_hw: int | None = None  # valid pool grid; enables spatial-pad input

    @nn.compact
    def __call__(self, x):
        start = 0
        if x.ndim == 4 and self.pool_hw is not None and self.num_fc > 0:
            x = nn.relu(
                SpatialPadDense(
                    self.fc_dim, self.pool_hw, _xavier(), self.dtype, name="fc1"
                )(x)
            )
            start = 1
        else:
            x = x.reshape(x.shape[0], -1)
        for i in range(start, self.num_fc):
            x = nn.Dense(self.fc_dim, kernel_init=_xavier(), dtype=self.dtype, name=f"fc{i + 1}")(x)
            x = nn.relu(x)
        return x


class BoxPredictor(nn.Module):
    """fc features -> (class scores (C+1), per-class box deltas (C*4))."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(
            self.num_classes + 1, kernel_init=_normal(0.01), dtype=jnp.float32, name="cls_score"
        )(x.astype(jnp.float32))
        deltas = nn.Dense(
            self.num_classes * 4, kernel_init=_normal(0.001), dtype=jnp.float32, name="bbox_pred"
        )(x.astype(jnp.float32))
        return scores, deltas


class CubeHeadNet(nn.Module):
    """Pooled 7x7 ROI features -> raw per-class 3D outputs.

    Returns (deltas_2d (N, C, 2), z (N, bins, C) or (N, C, 1), dims (N, C, 3),
    pose (N, C, 3, 3), uncert (N, C) or None).
    """

    num_classes: int
    num_fc: int = 2
    fc_dim: int = 1024
    shared_fc: bool = True
    z_type: str = "direct"
    pose_type: str = "6d"
    cluster_bins: int = 1
    use_confidence: float = 1.0
    dtype: Any = jnp.float32
    pool_hw: int | None = None  # valid pool grid; enables spatial-pad input

    def _fc_stack(self, x, name):
        for i in range(self.num_fc):
            if i == 0 and x.ndim == 4:
                x = SpatialPadDense(
                    self.fc_dim, self.pool_hw, _xavier(), self.dtype,
                    name=f"{name}_fc1",
                )(x)
            else:
                x = nn.Dense(self.fc_dim, kernel_init=_xavier(), dtype=self.dtype, name=f"{name}_fc{i + 1}")(x)
            x = nn.relu(x)
        return x

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        c = self.num_classes
        if not (x.ndim == 4 and self.pool_hw is not None and self.num_fc > 0):
            x = x.reshape(n, -1)

        if self.shared_fc:
            feat = self._fc_stack(x, "shared")
            f_xy = f_dims = f_pose = f_z = f_conf = feat
        else:
            f_xy = self._fc_stack(x, "xy")
            f_dims = self._fc_stack(x, "dims")
            f_pose = self._fc_stack(x, "pose")
            f_z = self._fc_stack(x, "z")
            f_conf = self._fc_stack(x, "conf") if self.use_confidence > 0 else None

        def head(feat, dim, name, bias=0.0):
            return nn.Dense(
                dim,
                kernel_init=_normal(0.001),
                bias_init=nn.initializers.constant(bias),
                dtype=jnp.float32,
                name=name,
            )(feat.astype(jnp.float32))

        deltas_2d = head(f_xy, c * 2, "bbox_3D_center_deltas").reshape(n, c, 2)
        dims = head(f_dims, c * 3, "bbox_3D_dims").reshape(n, c, 3)

        pose_dim = {"6d": 6, "quaternion": 4, "euler": 3}[self.pose_type]
        pose_raw = head(f_pose, c * pose_dim, "bbox_3D_pose").reshape(n * c, pose_dim)
        if self.pose_type == "6d":
            pose = rotation_6d_to_matrix(pose_raw)
        elif self.pose_type == "quaternion":
            pose = quaternion_to_matrix(normalize_quaternion(pose_raw))
        else:
            # pytorch3d 'XYZ' convention (cube_head.py:189), NOT euler2mat
            pose = euler_xyz_to_matrix(pose_raw)
        pose = pose.reshape(n, c, 3, 3)

        bins = max(self.cluster_bins, 1)
        # reference initialises the z bias to 1 (cube_head.py:143)
        z = head(f_z, c * bins, "bbox_3D_center_depth", bias=1.0)
        if self.cluster_bins > 1:
            z = z.reshape(n, bins, c)
        else:
            z = z.reshape(n, c)

        uncert = None
        if self.use_confidence > 0:
            # bias 5 -> initial confidence ~ e^-5 (cube_head.py:149)
            uncert = jnp.clip(head(f_conf, c, "bbox_3D_uncertainty", bias=5.0), 0.01, None)

        return deltas_2d, z, dims, pose, uncert


class ScoreHeadNet(nn.Module):
    """ScoreNet MLP head (cube_head.py:205-239): features -> Cubes params."""

    dtype: Any = jnp.float32
    pool_hw: int | None = None  # valid pool grid; enables spatial-pad input

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 4 and self.pool_hw is not None:
            x = nn.relu(
                SpatialPadDense(256, self.pool_hw, name="fc1")(x.astype(jnp.float32))
            )
        else:
            x = x.reshape(x.shape[0], -1).astype(jnp.float32)
            x = nn.relu(nn.Dense(256, name="fc1")(x))
        x = nn.Dense(128, name="fc2")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        x = nn.relu(x)
        x = nn.relu(nn.Dense(64, name="fc3")(x))
        centers = nn.Dense(3, name="fc_cube_centers")(x)
        dims = nn.Dense(3, name="fc_dims")(x)
        rot6d = nn.Dense(6, name="rotation_6d")(x)
        z = jnp.exp(jnp.clip(centers[:, 2], None, 5.0))
        centers = jnp.concatenate([centers[:, :2], z[:, None]], axis=1)
        dims = jnp.exp(jnp.clip(dims, None, 5.0))
        R = rotation_6d_to_matrix(rot6d)
        return centers, dims, R
