"""Build the native evaluation core: python native/setup.py build_ext --inplace

Produces threedod/evaluation/_evalc*.so; the evaluator auto-detects it.
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
        )
    ],
    script_args=["build_ext", "--inplace"],
)
