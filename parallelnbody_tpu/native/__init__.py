"""Native (C++) components: the double-precision direct-sum oracle.

Built on demand with g++ into a cached shared library and bound via ctypes
(this image has no pybind11). The oracle is the ground truth for the
energy-drift parity tests (BASELINE.md: < 1e-4 relative drift over 1000
steps) — deliberately independent of JAX.
"""

from parallelnbody_tpu.native.oracle import Oracle, build_oracle_lib

__all__ = ["Oracle", "build_oracle_lib"]
