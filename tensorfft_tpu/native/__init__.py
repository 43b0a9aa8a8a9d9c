"""ctypes bindings for the native host library (libtfft_host.so).

Build with ``make -C tensorfft_tpu/native`` (g++, no external deps).  Every
binding has a pure-NumPy fallback elsewhere in the package; consumers access
``tensorfft_tpu.native.lib`` and catch ImportError/OSError when the library
is not built.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["lib", "build", "NativeLib"]

_SO_PATH = Path(__file__).parent / "libtfft_host.so"


def build(force: bool = False) -> Path:
    """Compile the native library in place (requires g++)."""
    if _SO_PATH.exists() and not force:
        return _SO_PATH
    subprocess.run(
        ["make", "-C", str(Path(__file__).parent), "-s"], check=True
    )
    return _SO_PATH


class NativeLib:
    """Typed wrapper over the C ABI (see tfft_host.cpp for contracts)."""

    def __init__(self, path: Path):
        self._c = ctypes.CDLL(str(path))
        c = self._c
        i64, i32 = ctypes.c_int64, ctypes.c_int
        pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        c.tfft_version.restype = i32
        c.tfft_is_power_of_2.argtypes = [i64]
        c.tfft_optimal_radices.argtypes = [i64, pi32, ctypes.POINTER(i32)]
        c.tfft_dft_matrix.argtypes = [i32, i32, pd, pd]
        c.tfft_stage_twiddle.argtypes = [i32, i64, i32, pd, pd]
        c.tfft_digit_reversal_perm.argtypes = [i64, pi32, i32, pi64]
        c.tfft_sine_superposition.argtypes = [i64, pd, i32, i32, pd]
        c.tfft_fft_f64.argtypes = [i64, i32, i32, pd, pd, pd, pd]

    @property
    def version(self) -> int:
        return self._c.tfft_version()

    def optimal_radices(self, n: int):
        out = np.zeros(32, np.int32)
        count = ctypes.c_int(0)
        if self._c.tfft_optimal_radices(n, out, ctypes.byref(count)):
            raise ValueError(f"bad fft length {n}")
        return tuple(int(r) for r in out[: count.value])

    def dft_matrix(self, radix: int, sign: int):
        re = np.empty((radix, radix), np.float64)
        im = np.empty((radix, radix), np.float64)
        if self._c.tfft_dft_matrix(radix, sign, re, im):
            raise ValueError(f"bad radix {radix}")
        return re, im

    def stage_twiddle(self, radix: int, prior: int, sign: int):
        re = np.empty((radix, prior), np.float64)
        im = np.empty((radix, prior), np.float64)
        if self._c.tfft_stage_twiddle(radix, prior, sign, re, im):
            raise ValueError(f"bad twiddle shape ({radix}, {prior})")
        return re, im

    def digit_reversal_perm(self, n: int, radices):
        radices = np.asarray(radices, np.int32)
        perm = np.empty(n, np.int64)
        if self._c.tfft_digit_reversal_perm(n, radices, len(radices), perm):
            raise ValueError(f"radices {radices} do not factor {n}")
        return perm

    def sine_superposition(self, n: int, weights, harmonics: str = "linear"):
        weights = np.ascontiguousarray(weights, np.float64)
        out = np.empty(n, np.float64)
        mode = {"linear": 0, "pow2": 1}[harmonics]
        if self._c.tfft_sine_superposition(n, weights, len(weights), mode, out):
            raise ValueError("bad sine_superposition args")
        return out

    def fft_f64(self, re, im, sign: int = -1, scale: bool = True):
        re = np.array(re, np.float64, copy=True)
        im = np.array(im, np.float64, copy=True)
        n = len(re)
        work_re = np.empty(n, np.float64)
        work_im = np.empty(n, np.float64)
        if self._c.tfft_fft_f64(n, sign, int(scale), re, im, work_re, work_im):
            raise ValueError(f"length {n} not a power of 2")
        return re, im


def _load():
    if not _SO_PATH.exists():
        raise ImportError(
            "libtfft_host.so not built; run `make -C tensorfft_tpu/native`"
        )
    return NativeLib(_SO_PATH)


try:
    lib = _load()
except ImportError:
    lib = None
