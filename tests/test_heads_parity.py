"""Numeric forward parity of the detector heads + 3D transform chain vs a
detectron2-free torch transcription of the reference.

Closes the last unverified network family (round-2 VERDICT Missing #2):
backbones / DA-V2 / SAM / GDINO all have torch-parity harnesses; this adds
the cube head (cube_head.py:24-202), the fast_rcnn per-class box-delta
decoding (d2 Box2BoxTransform weights (10,10,5,5)), and the full
ROIHeads3D transform chain (roi_heads.py:2339-2436: per-class gather,
cluster-bin z, dims priors exp/sigmoid, allocentric->egocentric, z
direct/sigmoid/log/clusters, virtual depth) through to the assembled 3D
boxes (roi_heads.py:2688-2691 backprojection + math_util.py:142-247 cuboid
corners) and the geometric-mean score fusion (roi_heads.py:2710-2715).

Pattern per VERDICT: random-init torch modules with the official d2 zoo
naming, convert with the SAME converter slice the zoo path uses
(utils.convert_weights.convert_roi_heads), and assert the flax heads
reproduce box deltas, per-class cube parameters, and assembled 3D boxes.
"""
from __future__ import annotations

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from threedod.config import Config
from threedod.models.roi_heads3d import Detections, ROIHeads3D
from threedod.utils.convert_weights import convert_roi_heads

C = 6  # classes
N = 16  # rois
RES, CFP = 7, 256


# ---------------------------------------------------------------------------
# torch transcriptions of the pytorch3d rotation utilities the reference
# imports (no pytorch3d dependency; formulas per pytorch3d/transforms)
# ---------------------------------------------------------------------------

def _rotation_6d_to_matrix_t(d6):
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = F.normalize(a1, dim=-1)
    b2 = a2 - (b1 * a2).sum(-1, keepdim=True) * b1
    b2 = F.normalize(b2, dim=-1)
    b3 = torch.cross(b1, b2, dim=-1)
    return torch.stack((b1, b2, b3), dim=-2)


def _quaternion_to_matrix_t(q):
    r, i, j, k = torch.unbind(q, -1)
    two_s = 2.0 / (q * q).sum(-1)
    o = torch.stack(
        (
            1 - two_s * (j * j + k * k), two_s * (i * j - k * r), two_s * (i * k + j * r),
            two_s * (i * j + k * r), 1 - two_s * (i * i + k * k), two_s * (j * k - i * r),
            two_s * (i * k - j * r), two_s * (j * k + i * r), 1 - two_s * (i * i + j * j),
        ),
        -1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def _euler_xyz_to_matrix_t(e):
    def axis_rot(axis, t):
        c, s = torch.cos(t), torch.sin(t)
        one, zero = torch.ones_like(t), torch.zeros_like(t)
        if axis == "X":
            flat = (one, zero, zero, zero, c, -s, zero, s, c)
        elif axis == "Y":
            flat = (c, zero, s, zero, one, zero, -s, zero, c)
        else:
            flat = (c, -s, zero, s, c, zero, zero, zero, one)
        return torch.stack(flat, -1).reshape(t.shape + (3, 3))

    rx, ry, rz = torch.unbind(e, -1)
    return axis_rot("X", rx) @ axis_rot("Y", ry) @ axis_rot("Z", rz)


def _axis_angle_to_matrix_t(aa):
    angle = aa.norm(dim=-1, keepdim=True)
    axis = aa / angle.clamp(min=1e-12)
    half = angle * 0.5
    q = torch.cat([torch.cos(half), torch.sin(half) * axis], dim=-1)
    return _quaternion_to_matrix_t(q)


def _R_from_allocentric_t(K, R_view, u, v):
    """math_util.py:802-831 (tensor branch)."""
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    sx, sy = K[:, 0, 2], K[:, 1, 2]
    oray = torch.stack(((u - sx) / fx, (v - sy) / fy, torch.ones_like(u))).T
    oray = oray / torch.linalg.norm(oray, dim=1).unsqueeze(1)
    angle = torch.acos(oray[:, -1])
    axis = torch.zeros_like(oray)
    axis[:, 0] = axis[:, 0] - oray[:, 1]
    axis[:, 1] = axis[:, 1] + oray[:, 0]
    norms = torch.linalg.norm(axis, dim=1)
    valid = angle > 0
    M = _axis_angle_to_matrix_t(angle.unsqueeze(1) * axis / norms.unsqueeze(1))
    R = R_view.clone()
    R[valid] = torch.bmm(M[valid], R_view[valid])
    return R


def _scaled_sigmoid_t(x, lo, hi):
    return lo + (hi - lo) * torch.sigmoid(x)


def _cuboid_verts_t(box3d, R):
    """math_util.py:142-247: (n, 6) [XYZ WHL] + (n, 3, 3) -> (n, 8, 3)."""
    n = box3d.shape[0]
    x, y, z = box3d[:, 0:1], box3d[:, 1:2], box3d[:, 2:3]
    w, h, l = box3d[:, 3:4], box3d[:, 4:5], box3d[:, 5:6]
    verts = torch.zeros(n, 3, 8)
    verts[:, 0, [0, 3, 4, 7]] = -l / 2
    verts[:, 0, [1, 2, 5, 6]] = l / 2
    verts[:, 1, [0, 1, 4, 5]] = -h / 2
    verts[:, 1, [2, 3, 6, 7]] = h / 2
    verts[:, 2, [0, 1, 2, 3]] = -w / 2
    verts[:, 2, [4, 5, 6, 7]] = w / 2
    verts = R @ verts
    verts[:, 0, :] += x
    verts[:, 1, :] += y
    verts[:, 2, :] += z
    return verts.transpose(1, 2)


# ---------------------------------------------------------------------------
# torch stand-in of CubeHead (cube_head.py:24-202) + box head/predictor,
# official d2 module tree so state_dict() keys match the zoo layout
# ---------------------------------------------------------------------------

class _TorchCubeHead(nn.Module):
    def __init__(self, num_classes, shared_fc, pose_type, cluster_bins, use_conf,
                 in_dim=RES * RES * CFP, fc_dim=1024, num_fc=2):
        super().__init__()
        self.num_classes = num_classes
        self.shared_fc = shared_fc
        self.pose_type = pose_type
        self.cluster_bins = cluster_bins
        self.use_conf = use_conf

        def stack():
            mods = nn.Sequential()
            d = in_dim
            for k in range(num_fc):
                mods.add_module(f"fc{k + 1}", nn.Linear(d, fc_dim))
                mods.add_module(f"fc_relu{k + 1}", nn.ReLU())
                d = fc_dim
            return mods

        if shared_fc:
            self.feature_generator = stack()
        else:
            self.feature_generator_XY = stack()
            self.feature_generator_dims = stack()
            self.feature_generator_pose = stack()
            self.feature_generator_Z = stack()
            if use_conf:
                self.feature_generator_conf = stack()

        c = num_classes
        self.bbox_3D_dims = nn.Linear(fc_dim, c * 3)
        self.bbox_3D_center_deltas = nn.Linear(fc_dim, c * 2)
        pose_dim = {"6d": 6, "quaternion": 4, "euler": 3}[pose_type]
        self.bbox_3D_pose = nn.Linear(fc_dim, c * pose_dim)
        bins = cluster_bins if cluster_bins > 1 else 1
        self.bbox_3D_center_depth = nn.Linear(fc_dim, c * bins)
        if use_conf:
            self.bbox_3D_uncertainty = nn.Linear(fc_dim, c)

    def forward(self, x):
        n = x.shape[0]
        c = self.num_classes
        box_uncert = None
        if self.shared_fc:
            feats = self.feature_generator(x)
            box_2d_deltas = self.bbox_3D_center_deltas(feats)
            box_dims = self.bbox_3D_dims(feats)
            box_pose = self.bbox_3D_pose(feats)
            box_z = self.bbox_3D_center_depth(feats)
            if self.use_conf:
                box_uncert = self.bbox_3D_uncertainty(feats).clip(0.01)
        else:
            box_2d_deltas = self.bbox_3D_center_deltas(self.feature_generator_XY(x))
            box_dims = self.bbox_3D_dims(self.feature_generator_dims(x))
            box_pose = self.bbox_3D_pose(self.feature_generator_pose(x))
            box_z = self.bbox_3D_center_depth(self.feature_generator_Z(x))
            if self.use_conf:
                box_uncert = self.bbox_3D_uncertainty(self.feature_generator_conf(x)).clip(0.01)

        if self.pose_type == "6d":
            box_pose = _rotation_6d_to_matrix_t(box_pose.view(-1, 6))
        elif self.pose_type == "quaternion":
            quats = box_pose.view(-1, 4)
            scales = (quats * quats).sum(1)
            quats = quats / torch.copysign(torch.sqrt(scales), quats[:, 0])[:, None]
            box_pose = _quaternion_to_matrix_t(quats)
        else:
            box_pose = _euler_xyz_to_matrix_t(box_pose.view(-1, 3))

        box_2d_deltas = box_2d_deltas.view(n, c, 2)
        box_dims = box_dims.view(n, c, 3)
        box_pose = box_pose.view(n, c, 3, 3)
        if self.cluster_bins > 1:
            box_z = box_z.view(n, self.cluster_bins, c, -1)
        else:
            box_z = box_z.view(n, c, -1)
        return box_2d_deltas, box_z, box_dims, box_pose, box_uncert


class _TorchHeads(nn.Module):
    """roi_heads.{box_head,box_predictor,cube_head,priors_*} module tree."""

    def __init__(self, ch_cfg, bins):
        super().__init__()
        self.box_head = nn.Module()
        self.box_head.fc1 = nn.Linear(RES * RES * CFP, 1024)
        self.box_head.fc2 = nn.Linear(1024, 1024)
        self.box_predictor = nn.Module()
        self.box_predictor.cls_score = nn.Linear(1024, C + 1)
        self.box_predictor.bbox_pred = nn.Linear(1024, C * 4)
        self.cube_head = _TorchCubeHead(
            C, ch_cfg.shared_fc, ch_cfg.pose_type, ch_cfg.cluster_bins,
            ch_cfg.use_confidence > 0,
        )
        g = torch.Generator().manual_seed(3)
        self.priors_dims_per_cat = nn.Parameter(
            torch.rand(1, C, 2, 3, generator=g) * 2 + 0.2
        )
        self.priors_z_scales = nn.Parameter(torch.rand(C, bins, generator=g) * 500 + 20)
        self.priors_z_stats = nn.Parameter(torch.rand(C, bins, 2, generator=g) * 4 + 0.5)


def _torch_transform_chain(th, cfg, pooled_chw, boxes, classes, K, v2r):
    """roi_heads.py:2339-2436 + 2688-2691 assembly, transcribed."""
    ch = cfg.model.roi_cube_head
    n = boxes.shape[0]
    fg = torch.arange(n)
    cube_2d_deltas, cube_z, cube_dims, cube_pose, cube_uncert = th.cube_head(pooled_chw)

    src_w = boxes[:, 2] - boxes[:, 0]
    src_h = boxes[:, 3] - boxes[:, 1]
    src_scales = (src_h**2 + src_w**2).sqrt()
    src_cx = boxes[:, 0] + 0.5 * src_w
    src_cy = boxes[:, 1] + 0.5 * src_h

    assignments = None
    if ch.cluster_bins > 1:
        scales_diff = (
            th.priors_z_scales.detach().T.unsqueeze(0)
            - src_scales.unsqueeze(1).unsqueeze(2)
        ).abs()
        assignments = scales_diff.argmin(1)
        cube_z = cube_z[fg, :, classes, :][fg, assignments[fg, classes]]
    else:
        cube_z = cube_z[fg, classes, :]
    cube_dims = cube_dims[fg, classes, :]
    cube_pose = cube_pose[fg, classes, :, :]
    if ch.use_confidence > 0:
        cube_uncert = cube_uncert[fg, classes]
    cube_2d_deltas = cube_2d_deltas[fg, classes, :]

    cube_x = src_cx + src_w * cube_2d_deltas[:, 0]
    cube_y = src_cy + src_h * cube_2d_deltas[:, 1]
    cube_xy = torch.stack((cube_x, cube_y), dim=1)

    cube_dims_norm = cube_dims
    if ch.dims_priors_enabled:
        prior = th.priors_dims_per_cat.detach().repeat([n, 1, 1, 1])[fg, classes]
        pm, ps = prior[:, 0, :], prior[:, 1, :]
        if ch.dims_priors_func == "sigmoid":
            cube_dims = _scaled_sigmoid_t(
                cube_dims_norm, (pm - 3 * ps).clip(0.0), pm + 3 * ps
            )
        else:
            cube_dims = torch.exp(cube_dims_norm.clip(max=5)) * pm
    else:
        cube_dims = torch.exp(cube_dims_norm.clip(max=5))

    Ks_per = K.repeat(n, 1, 1)
    if ch.allocentric_pose:
        cube_pose = _R_from_allocentric_t(
            Ks_per, cube_pose, cube_x.detach(), cube_y.detach()
        )

    cube_z = cube_z.squeeze()
    if ch.z_type == "sigmoid":
        cube_z = torch.sigmoid(cube_z) * 100
    elif ch.z_type == "log":
        cube_z = torch.exp(cube_z)
    elif ch.z_type == "clusters":
        z_means = th.priors_z_stats[:, :, 0].T.unsqueeze(0).repeat([n, 1, 1])
        z_means = torch.gather(z_means, 1, assignments.unsqueeze(1)).squeeze(1)
        z_stds = th.priors_z_stats[:, :, 1].T.unsqueeze(0).repeat([n, 1, 1])
        z_stds = torch.gather(z_stds, 1, assignments.unsqueeze(1)).squeeze(1)
        z_means = z_means.detach()[fg, classes]
        z_stds = z_stds.detach()[fg, classes]
        cube_z = _scaled_sigmoid_t(cube_z, (z_means - 3 * z_stds).clip(0), z_means + 3 * z_stds)
    if ch.virtual_depth:
        cube_z = cube_z * v2r

    # inference assembly (roi_heads.py:2688-2691, 2710-2726)
    cube_x3d = cube_z * (cube_x - Ks_per[:, 0, 2]) / Ks_per[:, 0, 0]
    cube_y3d = cube_z * (cube_y - Ks_per[:, 1, 2]) / Ks_per[:, 1, 1]
    center_cam = torch.stack((cube_x3d, cube_y3d, cube_z)).T
    corners = _cuboid_verts_t(torch.cat([center_cam, cube_dims], dim=1), cube_pose)
    return {
        "xy": cube_xy, "z": cube_z, "dims": cube_dims, "pose": cube_pose,
        "uncert": cube_uncert, "center_cam": center_cam, "corners": corners,
    }


def _cfg(**kw):
    cfg = Config()
    cfg.model.dtype = "float32"
    cfg.model.roi_heads.num_classes = C
    ch = cfg.model.roi_cube_head
    for k, v in kw.items():
        setattr(ch, k, v)
    return cfg


VARIANTS = {
    "base_6d_direct": dict(),  # Base.yaml-like defaults: 6d, direct z, exp priors
    "clusters_quat_sigmoid": dict(
        z_type="clusters", cluster_bins=4, pose_type="quaternion",
        dims_priors_func="sigmoid",
    ),
    "euler_log_noprior": dict(
        z_type="log", pose_type="euler", dims_priors_enabled=False,
        shared_fc=False, allocentric_pose=False, virtual_depth=False,
        use_confidence=0.0,
    ),
}


@pytest.fixture(scope="module", params=list(VARIANTS))
def setup(request):
    cfg = _cfg(**VARIANTS[request.param])
    ch = cfg.model.roi_cube_head
    bins = max(ch.cluster_bins, 1)
    torch.manual_seed(0)
    th = _TorchHeads(ch, bins)
    th.eval()

    roih = ROIHeads3D(cfg)
    rng = np.random.RandomState(1)
    pooled = rng.randn(1, N, RES, RES, CFP).astype(np.float32)
    xy = rng.uniform(10, 400, (N, 2)).astype(np.float32)
    wh = rng.uniform(20, 200, (N, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    classes = rng.randint(0, C, (N,)).astype(np.int32)
    K = np.array([[[520.0, 0, 330.0], [0, 515.0, 260.0], [0, 0, 1]]], np.float32)
    v2r = np.float32(1.37)

    def run_all(m, pooled_j, boxes_j, classes_j, K_j, v2r_j):
        flat = pooled_j.reshape((-1,) + pooled_j.shape[2:])
        fc = m.box_head(flat)
        scores, deltas = m.box_predictor(fc)
        pred_boxes = m.transform.apply_deltas(deltas, boxes_j.reshape(-1, 4))
        out = m.cube_forward(
            None, boxes_j, classes_j, K_j, v2r_j[None], pooled=pooled_j
        )
        return scores, deltas, pred_boxes, out

    args = (
        jnp.asarray(pooled), jnp.asarray(boxes)[None], jnp.asarray(classes)[None],
        jnp.asarray(K), jnp.asarray(v2r),
    )
    variables = roih.init(jax.random.PRNGKey(0), *args, method=run_all)

    # remap the torch tree to zoo naming and run the zoo converter slice
    sd = {f"roi_heads.{k}": v.detach().numpy() for k, v in th.state_dict().items()}
    params = convert_roi_heads(sd, variables["params"], RES, CFP)
    assert jax.tree.structure(params) == jax.tree.structure(variables["params"])

    j_scores, j_deltas, j_pred, j_out = roih.apply(
        {"params": params}, *args, method=run_all
    )
    return cfg, th, roih, params, (pooled, boxes, classes, K, v2r), (
        j_scores, j_deltas, j_pred, j_out,
    )


class TestHeadsParity:
    def test_box_branch_and_delta_decoding(self, setup):
        cfg, th, roih, params, (pooled, boxes, classes, K, v2r), jres = setup
        j_scores, j_deltas, j_pred, _ = jres
        x = torch.from_numpy(pooled[0]).permute(0, 3, 1, 2).flatten(1)
        with torch.no_grad():
            fc = F.relu(th.box_head.fc2(F.relu(th.box_head.fc1(x))))
            t_scores = th.box_predictor.cls_score(fc)
            t_deltas = th.box_predictor.bbox_pred(fc)
            # d2 Box2BoxTransform.apply_deltas, weights (10, 10, 5, 5)
            b = torch.from_numpy(boxes)
            w, h = b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]
            cx, cy = b[:, 0] + 0.5 * w, b[:, 1] + 0.5 * h
            d = t_deltas.view(N, C, 4)
            dx, dy = d[..., 0] / 10.0, d[..., 1] / 10.0
            clamp = math.log(1000.0 / 16)
            dw = (d[..., 2] / 5.0).clamp(max=clamp)
            dh = (d[..., 3] / 5.0).clamp(max=clamp)
            pcx = dx * w[:, None] + cx[:, None]
            pcy = dy * h[:, None] + cy[:, None]
            pw, ph = torch.exp(dw) * w[:, None], torch.exp(dh) * h[:, None]
            t_pred = torch.stack(
                [pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], dim=-1
            ).reshape(N, C * 4)
        np.testing.assert_allclose(np.asarray(j_scores), t_scores.numpy(), atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(j_deltas), t_deltas.numpy(), atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(j_pred), t_pred.numpy(), atol=5e-3, rtol=1e-5)

    def test_cube_chain_and_assembled_boxes(self, setup):
        cfg, th, roih, params, (pooled, boxes, classes, K, v2r), jres = setup
        *_, j_out = jres
        x = torch.from_numpy(pooled[0]).permute(0, 3, 1, 2).flatten(1)
        with torch.no_grad():
            t = _torch_transform_chain(
                th, cfg, x, torch.from_numpy(boxes), torch.from_numpy(classes).long(),
                torch.from_numpy(K), torch.tensor(float(v2r)),
            )
        np.testing.assert_allclose(np.asarray(j_out["xy"]), t["xy"].numpy(), atol=1e-3, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(j_out["dims"]), t["dims"].numpy(), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(j_out["z"]), t["z"].numpy(), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(j_out["pose"]), t["pose"].numpy(), atol=1e-5, rtol=1e-4)
        if cfg.model.roi_cube_head.use_confidence > 0:
            np.testing.assert_allclose(
                np.asarray(j_out["uncert"]), t["uncert"].numpy(), atol=1e-5, rtol=1e-4
            )

        # assembled detections: backprojected center, corners, score fusion
        scores_2d = np.linspace(0.2, 0.95, N).astype(np.float32)[None]
        det = Detections(
            boxes=jnp.asarray(boxes)[None],
            scores=jnp.asarray(scores_2d),
            scores_2d=jnp.asarray(scores_2d),
            classes=jnp.asarray(classes)[None],
            valid=jnp.ones((1, N), bool),
            center_cam=jnp.zeros((1, N, 3)),
            dimensions=jnp.zeros((1, N, 3)),
            pose=jnp.zeros((1, N, 3, 3)),
            center_2d=jnp.zeros((1, N, 2)),
            corners3d=jnp.zeros((1, N, 8, 3)),
        )
        ratio = jnp.asarray([1.42], jnp.float32)
        full = roih.apply(
            {"params": params}, det, j_out, ratio, method=ROIHeads3D.assemble_detections
        )
        np.testing.assert_allclose(
            np.asarray(full.center_cam[0]), t["center_cam"].numpy(), atol=1e-3, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(full.corners3d[0]), t["corners"].numpy(), atol=2e-3, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(full.center_2d[0]), t["xy"].numpy() * 1.42, atol=2e-3, rtol=1e-5
        )
        if cfg.model.roi_cube_head.use_confidence > 0:
            exp_scores = np.sqrt(scores_2d[0] * np.exp(-t["uncert"].numpy()))
            np.testing.assert_allclose(
                np.asarray(full.scores[0]), exp_scores, atol=1e-5, rtol=1e-4
            )
