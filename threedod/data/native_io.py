"""Host image/asset IO with an optional native core.

`native/loaderc.cpp` provides GIL-free JPEG decode and NPZ loading
(`python native/setup.py` builds `threedod/data/_loaderc*.so`), giving the
loader thread pool true parallelism — the reference leans on PyTorch
DataLoader worker processes for the same purpose (train_net.py:143-144).
Without the extension these fall back to PIL/numpy transparently.
"""
from __future__ import annotations

import numpy as np

try:  # built by native/setup.py; optional
    from . import _loaderc  # type: ignore
except ImportError:  # pragma: no cover - depends on build step
    from ..utils.native_build import ensure_native_built

    ensure_native_built()
    try:
        from . import _loaderc  # type: ignore
    except ImportError:
        _loaderc = None


def native_available() -> bool:
    return _loaderc is not None


def imread_rgb(path: str) -> np.ndarray:
    """(H, W, 3) uint8 RGB. Native JPEG path when possible."""
    if _loaderc is not None and path.lower().endswith((".jpg", ".jpeg")):
        try:
            return _loaderc.imread_rgb(path)
        except IOError:
            pass  # fall through (corrupt/progressive-unsupported files)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def npz_load(path: str, key: str) -> np.ndarray:
    """One array out of an .npz archive by key."""
    if _loaderc is not None:
        try:
            return _loaderc.npz_load(path, key)
        except IOError:
            pass
    with np.load(path) as z:
        return z[key]
