"""Build the mvc_tpu._native C++ extension:

    python csrc/setup.py build_ext --build-lib mvc_tpu/

or ``make native`` from the repo root.
"""

import os

from setuptools import Extension, setup

HERE = os.path.dirname(os.path.abspath(__file__))

setup(
    name="mvc-tpu-native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "mvc_tpu._native",
            sources=[os.path.join(HERE, "native.cpp")],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            language="c++",
        )
    ],
    script_args=os.sys.argv[1:] or ["build_ext", "--inplace"],
)
