"""Build script: metadata lives in pyproject.toml; this only wires up the
OPTIONAL native BOP-annotation parser (native/bop_annots.cpp, CPython C API,
no third-party deps).  `optional=True` makes a missing/failing compiler a
warning, not an install failure — scflow_tpu.datasets.bop_store falls back
to the pure-Python parser with identical output (tested in
tests/test_bop_store.py)."""

from setuptools import setup
from setuptools.extension import Extension

setup(
    ext_modules=[
        Extension(
            "scflow_tpu.datasets._bop_annots",
            sources=["native/bop_annots.cpp"],
            language="c++",
            extra_compile_args=["-O3", "-std=c++17"],
            optional=True,
        )
    ]
)
