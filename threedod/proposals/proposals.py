"""Cube proposal samplers — the "proposal method" engine, TPU-native.

Parity target: ProposalNetwork/proposals/proposals.py — all 7 samplers
(`random`, `xy_patch`, `z`, `random_dim`, `aspect_ratio`, `random_rotation`,
and the full `propose` :338-424) with the same distributions:
  * centers from a depth-image grid trig unprojection (:352-375),
  * dims from per-category prior gaussians truncated to
    [0.05, mu + 2*sigma] (:377-383),
  * center refinement by the fitted linear coefficients x: 1.15x,
    y: 1.1y, z: 0.85z + 0.35 (:385-396),
  * rotations from 36 yaw-sampled bases around the ground normal (:400-407).

TPU re-design: the reference already vectorises over proposals; here the
instance loop disappears too — every sampler is a pure function of a PRNG
key, vmapped over instances, so a whole image's (N_instances x 1000)
proposals are one fused program. Rejection re-sampling becomes exact
truncated-normal sampling.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..geometry.rotations import matrix_to_euler, orthobasis_from_normal
from ..structures.cubes import Cubes

MIN_PROP_S = 0.05  # minimum edge length in meters


def rescale_interval(x, lo, hi):
    return (lo - hi) * x + hi


def lin_fun(x, coef):
    return coef[0] * x + coef[1]


def sample_normal_in_range(key, mean, std, count, lo=None, hi=None):
    """Truncated-normal sampling (exact version of the reference's rejection
    loop, utils.py:42-60). mean/std broadcast to (count,)."""
    std = jnp.maximum(std, 1e-6)
    if lo is None and hi is None:
        return mean + std * jax.random.normal(key, (count,))
    a = (lo - mean) / std if lo is not None else -jnp.inf
    b = (hi - mean) / std if hi is not None else jnp.inf
    # guard inverted/degenerate intervals
    b = jnp.maximum(b, a + 1e-4)
    return mean + std * jax.random.truncated_normal(key, a, b, (count,))


def randn_orthobasis(key, shape):
    """Random orthonormal bases (parity: utils.py:62-69)."""
    z = jax.random.normal(key, shape + (3, 3))
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
    r0 = jnp.cross(z[..., 1, :], z[..., 2, :])
    r0 = r0 / jnp.maximum(jnp.linalg.norm(r0, axis=-1, keepdims=True), 1e-8)
    r1 = jnp.cross(z[..., 2, :], r0)
    r1 = r1 / jnp.maximum(jnp.linalg.norm(r1, axis=-1, keepdims=True), 1e-8)
    return jnp.stack([r0, r1, z[..., 2, :]], axis=-2)


def _depth_grid_centers(box, depth_image, K, p):
    """Trig unprojection of a P-point grid across the (shrunken) 2D box.

    Returns (x, y, z_tmp) each (P,) — reference proposals.py:352-375.
    """
    h, w = depth_image.shape
    bw = box[2] - box[0]
    bh = box[3] - box[1]
    x_lo, x_hi = box[0] + bw / 4, box[2] - bw / 4
    y_lo, y_hi = box[1] + bh / 4, box[3] - bh / 4
    t = jnp.linspace(0.0, 1.0, p)
    xg = x_lo + t * (x_hi - x_lo)
    yg = y_lo + t * (y_hi - y_lo)
    xi = jnp.clip(jnp.round(xg).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(yg).astype(jnp.int32), 0, h - 1)
    d = depth_image[yi, xi]

    opp_x = xg - K[0, 2]
    opp_y = yg - K[1, 2]
    adj = K[0, 0]
    angle_x = jnp.arctan2(opp_x, adj)
    dx_cam = jnp.sqrt(opp_x**2 + adj**2)
    angle_d = jnp.arctan2(opp_y, dx_cam)
    y = d * jnp.sin(angle_d)
    dx = jnp.sqrt(jnp.maximum(d**2 - y**2, 0.0))
    x = dx * jnp.sin(angle_x)
    z_tmp = jnp.sqrt(jnp.maximum(dx**2 - x**2, 0.0))
    return x, y, z_tmp


def _refined_center(key, x, y, z_tmp, l, p):
    """Linear-coefficient center refinement (reference :385-396)."""
    kx, ky, kz = jax.random.split(key, 3)
    x = sample_normal_in_range(kx, lin_fun(jnp.median(x), (1.15, 0.0)), jnp.std(x) * 1.2, p)
    y = sample_normal_in_range(ky, lin_fun(jnp.median(y), (1.1, 0.0)), jnp.std(y) * 0.8, p)
    z_shift = z_tmp + l / 2
    z = sample_normal_in_range(
        kz, lin_fun(jnp.median(z_shift), (0.85, 0.35)), jnp.std(z_shift) * 1.2, p
    )
    return x, y, z


def _prior_dims(key, prior_mean, prior_std, p):
    """Truncated prior gaussians for (w, h, l) (reference :377-383)."""
    kw, kh, kl = jax.random.split(key, 3)
    w = sample_normal_in_range(kw, prior_mean[0], prior_std[0], p, MIN_PROP_S, prior_mean[0] + 2 * prior_std[0])
    h = sample_normal_in_range(kh, prior_mean[1], prior_std[1] * 1.1, p, MIN_PROP_S, prior_mean[1] + 2.2 * prior_std[1])
    l = sample_normal_in_range(kl, prior_mean[2], prior_std[2], p, MIN_PROP_S, prior_mean[2] + 2 * prior_std[2])
    return w, h, l


def _pixel_to_norm(v, dim, norm):
    return (v - 0.5 * dim) * (norm / dim)


def _assemble(x, y, z, w, h, l, R):
    xyzwhl = jnp.stack([x, y, z, w, h, l], axis=-1)
    return Cubes(jnp.concatenate([xyzwhl, R.reshape(R.shape[:-2] + (9,))], axis=-1)[None])


# ---------------------------------------------------------------------------
# samplers (single instance; vmap over instances via propose_batch)
# ---------------------------------------------------------------------------

def _propose_random(key, box, depth_image, prior_mean, prior_std, im_shape, K, p, ground_normal):
    ks = jax.random.split(key, 7)
    x = jax.random.uniform(ks[0], (p,)) * 4 - 2
    y = jax.random.uniform(ks[1], (p,)) * 2 - 1
    z = jax.random.uniform(ks[2], (p,)) * 4 + 1
    w = rescale_interval(jax.random.uniform(ks[3], (p,)), MIN_PROP_S, 2)
    h = rescale_interval(jax.random.uniform(ks[4], (p,)), MIN_PROP_S, 2)
    l = rescale_interval(jax.random.uniform(ks[5], (p,)), MIN_PROP_S, 2)
    R = randn_orthobasis(ks[6], (p,))
    return x, y, z, w, h, l, R


def _propose_xy_patch(key, box, depth_image, prior_mean, prior_std, im_shape, K, p, ground_normal):
    ks = jax.random.split(key, 5)
    bw = box[2] - box[0]
    bh = box[3] - box[1]
    x_lo = _pixel_to_norm(box[0] + bw / 4, im_shape[0], 3.0)
    x_hi = _pixel_to_norm(box[2] - bw / 4, im_shape[0], 3.0)
    y_lo = _pixel_to_norm(box[1] + bh / 4, im_shape[1], 2.0)
    y_hi = _pixel_to_norm(box[3] - bh / 4, im_shape[1], 2.0)
    t = jnp.linspace(0.0, 1.0, p)
    x = x_lo + t * (x_hi - x_lo)
    y = y_lo + t * (y_hi - y_lo)
    z = jax.random.uniform(ks[0], (p,)) * 4 + 1
    w = rescale_interval(jax.random.uniform(ks[1], (p,)), MIN_PROP_S, 2)
    h = rescale_interval(jax.random.uniform(ks[2], (p,)), MIN_PROP_S, 2)
    l = rescale_interval(jax.random.uniform(ks[3], (p,)), MIN_PROP_S, 2)
    R = randn_orthobasis(ks[4], (p,))
    return x, y, z, w, h, l, R


def _propose_z(key, box, depth_image, prior_mean, prior_std, im_shape, K, p, ground_normal):
    ks = jax.random.split(key, 4)
    bw = box[2] - box[0]
    bh = box[3] - box[1]
    x_lo = _pixel_to_norm(box[0] + bw / 4, im_shape[0], 3.0)
    x_hi = _pixel_to_norm(box[2] - bw / 4, im_shape[0], 3.0)
    y_lo = _pixel_to_norm(box[1] + bh / 4, im_shape[1], 2.0)
    y_hi = _pixel_to_norm(box[3] - bh / 4, im_shape[1], 2.0)
    t = jnp.linspace(0.0, 1.0, p)
    x = x_lo + t * (x_hi - x_lo)
    y = y_lo + t * (y_hi - y_lo)
    # depth quantiles inside the (clamped) 2D box, padded-safe via masking
    h_im, w_im = depth_image.shape
    yy = jnp.arange(h_im)[:, None]
    xx = jnp.arange(w_im)[None, :]
    in_box = (yy >= box[1]) & (yy < box[3]) & (xx >= box[0]) & (xx < box[2])
    big = jnp.where(in_box, depth_image, jnp.nan)
    q = jnp.nanquantile(big, jnp.asarray([0.1, 0.9]))
    z = jnp.linspace(q[0], q[1], p)
    w = rescale_interval(jax.random.uniform(ks[0], (p,)), MIN_PROP_S, 2)
    h = rescale_interval(jax.random.uniform(ks[1], (p,)), MIN_PROP_S, 2)
    l = rescale_interval(jax.random.uniform(ks[2], (p,)), MIN_PROP_S, 2)
    R = randn_orthobasis(ks[3], (p,))
    return x, y, z, w, h, l, R


def _propose_random_dim(key, box, depth_image, prior_mean, prior_std, im_shape, K, p, ground_normal):
    ks = jax.random.split(key, 5)
    xg, yg, z_tmp = _depth_grid_centers(box, depth_image, K, p)
    w = rescale_interval(jax.random.uniform(ks[0], (p,)), MIN_PROP_S, 2)
    h = rescale_interval(jax.random.uniform(ks[1], (p,)), MIN_PROP_S, 2)
    l = rescale_interval(jax.random.uniform(ks[2], (p,)), MIN_PROP_S, 2)
    x, y, z = _refined_center(ks[3], xg, yg, z_tmp, l, p)
    R = randn_orthobasis(ks[4], (p,))
    return x, y, z, w, h, l, R


_RATIOS = jnp.asarray([0.33, 0.66, 1.0, 1.33, 1.67, 2.0, 3.0])


def _propose_aspect_ratio(key, box, depth_image, prior_mean, prior_std, im_shape, K, p, ground_normal):
    ks = jax.random.split(key, 5)
    xg, yg, z_tmp = _depth_grid_centers(box, depth_image, K, p)
    w = rescale_interval(jax.random.uniform(ks[0], (p,)), MIN_PROP_S, 2)
    r1 = _RATIOS[jax.random.randint(ks[1], (), 0, len(_RATIOS))]
    r2 = _RATIOS[jax.random.randint(ks[2], (), 0, len(_RATIOS))]
    h = w * r1
    l = w * r2
    x, y, z = _refined_center(ks[3], xg, yg, z_tmp, l, p)
    R = randn_orthobasis(ks[4], (p,))
    return x, y, z, w, h, l, R


def _propose_random_rotation(key, box, depth_image, prior_mean, prior_std, im_shape, K, p, ground_normal):
    ks = jax.random.split(key, 3)
    xg, yg, z_tmp = _depth_grid_centers(box, depth_image, K, p)
    w, h, l = _prior_dims(ks[0], prior_mean, prior_std, p)
    x, y, z = _refined_center(ks[1], xg, yg, z_tmp, l, p)
    R = randn_orthobasis(ks[2], (p,))
    return x, y, z, w, h, l, R


def _propose(key, box, depth_image, prior_mean, prior_std, im_shape, K, p, ground_normal):
    """The full method (reference :338-424)."""
    ks = jax.random.split(key, 4)
    xg, yg, z_tmp = _depth_grid_centers(box, depth_image, K, p)
    w, h, l = _prior_dims(ks[0], prior_mean, prior_std, p)
    x, y, z = _refined_center(ks[1], xg, yg, z_tmp, l, p)
    if ground_normal is None:
        R = randn_orthobasis(ks[2], (p,))
    else:
        angles = jnp.linspace(0.0, jnp.pi, 36)
        bases = orthobasis_from_normal(ground_normal, angles)  # (36, 3, 3)
        idx = jax.random.randint(ks[3], (p,), 0, 36)
        R = bases[idx]
    return x, y, z, w, h, l, R


PROPOSAL_FUNCS = {
    "random": _propose_random,
    "xy": _propose_xy_patch,
    "z": _propose_z,
    "dim": _propose_random_dim,
    "aspect": _propose_aspect_ratio,
    "rotation": _propose_random_rotation,
    "propose": _propose,
}


def propose_batch(
    key: jax.Array,
    name: str,
    reference_boxes: jnp.ndarray,  # (N, 4) XYXY
    depth_image: jnp.ndarray,  # (H, W)
    prior_means: jnp.ndarray,  # (N, 3)
    prior_stds: jnp.ndarray,  # (N, 3)
    im_shape,  # (w, h) static
    K: jnp.ndarray,  # (3, 3)
    number_of_proposals: int = 1000,
    ground_normal: Optional[jnp.ndarray] = None,
) -> Cubes:
    """Vmapped proposal generation: (N instances x P proposals) in one shot."""
    fn = PROPOSAL_FUNCS[name]
    n = reference_boxes.shape[0]
    keys = jax.random.split(key, n)

    def one(k, box, pm, ps):
        return fn(k, box, depth_image, pm, ps, im_shape, K, number_of_proposals, ground_normal)

    x, y, z, w, h, l, R = jax.vmap(one)(keys, reference_boxes, prior_means, prior_stds)
    xyzwhl = jnp.stack([x, y, z, w, h, l], axis=-1)  # (N, P, 6)
    tensor = jnp.concatenate([xyzwhl, R.reshape(n, number_of_proposals, 9)], axis=-1)
    return Cubes(tensor)


def gt_in_norm_range(rng, gt):
    return (gt - rng[0]) / jnp.abs(rng[1] - rng[0])


def statistics(gt_cubes: Cubes, cubes: Cubes) -> jnp.ndarray:
    """Where the GT falls inside each sampled range (reference :427-445).

    Returns (N, 9) normalized positions of the gt parameters within the
    per-instance proposal min/max ranges.
    """
    t = cubes.tensor  # (N, P, 15)
    gt = gt_cubes.tensor[:, 0]  # (N, 15)
    lo = t[..., :6].min(axis=1)
    hi = t[..., :6].max(axis=1)
    stats6 = (gt[:, :6] - lo) / jnp.abs(hi - lo + 1e-9)
    angles = matrix_to_euler(gt[:, 6:].reshape(-1, 3, 3))
    denom = jnp.asarray([jnp.pi, jnp.pi / 2, jnp.pi])
    stats_r = angles / denom
    return jnp.concatenate([stats6, stats_r], axis=1)
