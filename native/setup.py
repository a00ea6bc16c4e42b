"""Build the native cores: python native/setup.py build_ext --inplace

Produces threedod/evaluation/_evalc*.so (COCO-style eval inner loops) and
threedod/data/_loaderc*.so (GIL-free JPEG/NPZ loading); both are
auto-detected by their Python callers and fall back to numpy/PIL.
"""
import os

import numpy as np
from setuptools import Extension, setup

here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(here)

setup(
    name="threedod-native",
    ext_modules=[
        Extension(
            "threedod.evaluation._evalc",
            sources=[os.path.join(here, "evalc.cpp")],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
        ),
        Extension(
            "threedod.data._loaderc",
            sources=[os.path.join(here, "loaderc.cpp")],
            include_dirs=[np.get_include()],
            libraries=["jpeg", "z"],
            extra_compile_args=["-O3", "-std=c++17"],
        ),
    ],
    script_args=["build_ext", "--inplace"],
)
