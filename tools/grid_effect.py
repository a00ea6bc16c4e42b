#!/usr/bin/env python
"""Numerical sanity script: IoU3D loss from the proposal method's rotation
grid discretization.

Parity target: ProposalNetwork/proposals/grid_effect.py — the propose()
sampler quantizes yaw to a 36-step grid around the ground normal
(proposals.py:400-407, 10 deg steps; the reference script probes the 2.5 deg
half-step case). This reports the IoU a perfectly-sized unit cube loses to
a pure yaw offset, for a sweep of grid half-steps.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from threedod.geometry.cuboids import cuboid_verts
from threedod.geometry.iou3d import box3d_overlap
from threedod.geometry.rotations import euler_to_matrix as euler2mat


def main():
    center_dims = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
    unit = cuboid_verts(center_dims, euler2mat(jnp.asarray([0.0, 0.0, 0.0]))[None])
    for deg in (1.25, 2.5, 5.0):
        rot = cuboid_verts(
            center_dims, euler2mat(jnp.asarray([0.0, np.deg2rad(deg), 0.0]))[None]
        )
        _, iou = box3d_overlap(unit, rot)
        print(
            f"Difference in IoU due to rotation grid ({deg:5.2f} deg): "
            f"{1.0 - float(iou[0, 0]):.4f}"
        )


if __name__ == "__main__":
    main()
