"""ctypes bindings + on-demand build of the C++ direct-sum oracle."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("oracle.cpp")
_LIB_CACHE: dict[str, ctypes.CDLL] = {}


def build_oracle_lib(cache_dir: str | None = None) -> ctypes.CDLL:
    """Compile (once) and load the oracle shared library."""
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    if tag in _LIB_CACHE:
        return _LIB_CACHE[tag]

    cache = Path(cache_dir or os.environ.get(
        "PNBODY_NATIVE_CACHE",
        Path(tempfile.gettempdir()) / "parallelnbody_tpu_native",
    ))
    cache.mkdir(parents=True, exist_ok=True)
    lib_path = cache / f"oracle_{tag}.so"
    if not lib_path.exists():
        tmp = lib_path.with_suffix(".so.tmp")
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", str(tmp), str(_SRC),
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, lib_path)

    lib = ctypes.CDLL(str(lib_path))
    d = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    f64 = ctypes.c_double
    lib.nbody_direct_accel.argtypes = [d, d, i64, f64, f64, d, d]
    lib.nbody_direct_accel.restype = None
    lib.nbody_leapfrog_steps.argtypes = [d, d, d, i64, f64, f64, f64, i64, d, d]
    lib.nbody_leapfrog_steps.restype = None
    lib.nbody_semi_euler_steps.argtypes = [d, d, d, i64, f64, f64, f64, i64, d, d]
    lib.nbody_semi_euler_steps.restype = None
    lib.nbody_total_energy.argtypes = [d, d, d, i64, f64, f64]
    lib.nbody_total_energy.restype = f64
    _LIB_CACHE[tag] = lib
    return lib


def _as_c(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class Oracle:
    """Double-precision CPU direct-sum oracle (reference force law)."""

    def __init__(self, g: float = 1.0, softening: float = 0.0):
        self.g = float(g)
        self.eps = float(softening)
        self._lib = build_oracle_lib()

    def accel(self, pos, mass):
        pos = np.ascontiguousarray(pos, np.float64)
        mass = np.ascontiguousarray(mass, np.float64)
        n = pos.shape[0]
        acc = np.zeros((n, 3), np.float64)
        pot = np.zeros(n, np.float64)
        self._lib.nbody_direct_accel(_as_c(pos), _as_c(mass), n,
                                     self.g, self.eps, _as_c(acc), _as_c(pot))
        return acc, pot

    def run(self, pos, vel, mass, dt: float, steps: int,
            integrator: str = "leapfrog"):
        """Integrate `steps` steps; returns (pos, vel) copies."""
        pos = np.ascontiguousarray(pos, np.float64).copy()
        vel = np.ascontiguousarray(vel, np.float64).copy()
        mass = np.ascontiguousarray(mass, np.float64)
        n = pos.shape[0]
        acc, pot = self.accel(pos, mass)
        fn = {
            "leapfrog": self._lib.nbody_leapfrog_steps,
            "euler_semi_implicit": self._lib.nbody_semi_euler_steps,
        }[integrator]
        fn(_as_c(pos), _as_c(vel), _as_c(mass), n, self.g, self.eps,
           float(dt), int(steps), _as_c(acc), _as_c(pot))
        return pos, vel

    def total_energy(self, pos, vel, mass) -> float:
        pos = np.ascontiguousarray(pos, np.float64)
        vel = np.ascontiguousarray(vel, np.float64)
        mass = np.ascontiguousarray(mass, np.float64)
        return float(self._lib.nbody_total_energy(
            _as_c(pos), _as_c(vel), _as_c(mass), pos.shape[0], self.g, self.eps))
