"""Native (C++) runtime components, loaded via ctypes.

The reference keeps its performance-critical host code in C++
(src/bvh.cpp builder, loaders); this package holds the TPU framework's
equivalents, compiled on demand with the system toolchain and loaded
through a C ABI (no pybind11 in this environment).  Every native entry
point has a pure-numpy fallback so the framework works without a
compiler.
"""

from .build import load_library  # noqa: F401
