"""Build the native wire-format codec:

    cd native && python setup.py build_ext --inplace

The server layer auto-detects the built extension and falls back to the
pure-Python codec otherwise.
"""
from setuptools import Extension, setup

setup(
    name='mit-tpu-native',
    ext_modules=[
        Extension('wirecodec', sources=['wirecodec.cpp'],
                  extra_compile_args=['-O3', '-std=c++17']),
    ],
)
