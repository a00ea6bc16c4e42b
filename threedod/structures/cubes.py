"""Cubes: batched 3D-box container as a JAX pytree (struct-of-one-array).

Parity target: ProposalNetwork/utils/spaces.py:95-328 (``Cubes``), keeping
the same (N_instances, N_proposals, 15) tensor contract
[c1, c2, c3, w, h, l, R11..R33] so every downstream op (bube corners,
projection clamps, scoring) lines up. Registered as a pytree so it flows
through jit/vmap/grad without unwrapping.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.cuboids import cuboid_verts, project_points


@jax.tree_util.register_pytree_node_class
class Cubes:
    """3D boxes [[c1, c2, c3, w, h, l, R(9)]] of shape (N, P, 15)."""

    def __init__(self, tensor: jnp.ndarray, scores: jnp.ndarray | None = None, labels: jnp.ndarray | None = None):
        tensor = jnp.asarray(tensor, jnp.float32)
        if tensor.ndim == 1:
            tensor = tensor[None, None]
        elif tensor.ndim == 2:
            tensor = tensor[None]
        self.tensor = tensor
        self.scores = scores
        self.labels = labels

    # --- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.tensor, self.scores, self.labels), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        tensor, scores, labels = children
        obj = object.__new__(cls)
        obj.tensor = tensor
        obj.scores = scores
        obj.labels = labels
        return obj

    # --- views ------------------------------------------------------------
    @property
    def centers(self):
        return self.tensor[..., :3]

    @property
    def dimensions(self):
        return self.tensor[..., 3:6]

    @property
    def rotations(self):
        shp = self.tensor.shape[:-1] + (3, 3)
        return self.tensor[..., 6:].reshape(shp)

    @property
    def num_instances(self):
        return self.tensor.shape[0]

    @property
    def num_proposals(self):
        return self.tensor.shape[1]

    @property
    def shape(self):
        return self.tensor.shape

    # --- geometry ----------------------------------------------------------
    def get_all_corners(self) -> jnp.ndarray:
        """Corner vertices (N, P, 8, 3) in camera space."""
        box6 = self.tensor[..., :6]
        return cuboid_verts(box6, self.rotations)

    def get_bube_corners(self, K: jnp.ndarray, clamp: tuple | None = None) -> jnp.ndarray:
        """Projected corners (N, P, 8, 2); optional gradient-safe clamp.

        clamp = (width, height): x in [-w/2+1, 2w-1], y in [-h/2+1, 2h-1]
        (same bounds as spaces.py:239-243).
        """
        corners = self.get_all_corners()
        proj = project_points(K, corners.reshape(-1, 8, 3)).reshape(corners.shape)
        xy = proj[..., :2]
        if clamp is not None:
            w, h = clamp
            x = jnp.clip(xy[..., 0], int(-w / 2 + 1), int(w - 1 + w))
            y = jnp.clip(xy[..., 1], int(-h / 2 + 1), int(h - 1 + h))
            xy = jnp.stack([x, y], axis=-1)
        return xy

    def to_boxes2d(self, K: jnp.ndarray, im_shape: tuple | None = None) -> jnp.ndarray:
        """Projected axis-aligned 2D boxes (N, P, 4) XYXY.

        Parity: ProposalNetwork/utils/conversions.py:25-48 (cubes_to_box).
        """
        corners = self.get_bube_corners(K, im_shape)
        x1 = corners[..., 0].min(-1)
        y1 = corners[..., 1].min(-1)
        x2 = corners[..., 0].max(-1)
        y2 = corners[..., 1].max(-1)
        return jnp.stack([x1, y1, x2, y2], axis=-1)

    def get_volumes(self) -> jnp.ndarray:
        return jnp.prod(self.dimensions, axis=-1)

    # --- structural ops ----------------------------------------------------
    def __getitem__(self, item) -> "Cubes":
        t = self.tensor[item]
        return Cubes(t)

    def __len__(self):
        return self.tensor.shape[0]

    def __repr__(self):
        return f"Cubes(shape={tuple(self.tensor.shape)})"

    def reshape(self, *shape) -> "Cubes":
        return Cubes(self.tensor.reshape(*shape), self.scores, self.labels)

    @classmethod
    def cat(cls, cubes_list, axis: int = 0) -> "Cubes":
        return cls(jnp.concatenate([c.tensor for c in cubes_list], axis=axis))

    @classmethod
    def from_parts(cls, centers, dims, rotations, scores=None, labels=None) -> "Cubes":
        """Build from centers (..., 3), dims (..., 3), rotations (..., 3, 3)."""
        flat_R = rotations.reshape(rotations.shape[:-2] + (9,))
        return cls(jnp.concatenate([centers, dims, flat_R], axis=-1), scores, labels)
