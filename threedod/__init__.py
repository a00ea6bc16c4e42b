"""threedod — a TPU-native monocular 3D object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``luchsonice/3dod`` reference (Omni3D / Cube R-CNN + weak-supervision thesis
methods), built TPU-first:

* static-shape, padded+masked batch contracts everywhere the reference used
  ragged ``Instances`` lists,
* pure-functional flax models, ``jit``-compiled end-to-end,
* data parallelism via ``jax.sharding.Mesh`` + NamedSharding (XLA collectives
  over ICI/DCN — no user-level NCCL-style code),
* device-side geometry kernels (oriented 3D IoU via polyhedral clipping,
  ROIAlign, masked NMS, vectorised RANSAC) instead of CUDA extensions.

Subpackages
-----------
geometry     cuboid/rotation/projection math, IoU3D, RANSAC plane, hulls
structures   Cubes / padded-Instances pytree containers
config       typed dataclass config system with YAML `_BASE_` inheritance
data         Omni3D dataset layer, mapper, priors, category registry
models       backbones+FPN, RPN, box/cube heads, meta-architectures
ops          roi_align, nms, losses, pallas kernels
proposals    cube proposal samplers (the "proposal method" engine)
scoring      cube scoring functions
evaluation   Omni3D AP evaluation (2D + 3D)
train        training loop, solver, checkpointing, divergence stabilizer
parallel     mesh/sharding helpers
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: detection graphs at full canvas take
# minutes to compile (especially through a remote TPU relay); cache them
# across processes. Harmless no-op if the config key ever disappears.
import os as _os

try:
    import jax as _jax

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "jax_comp_cache"),
    )
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass
