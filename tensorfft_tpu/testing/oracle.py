"""fp64 reference oracle.

Role of cuFFT-in-fp64 in the reference harness (CuFFTTest.h:173-261 produces
the Z2Z ground truth; AccuracyCalculator.h:32-48 divides it by N to match the
library's progressive scaling).  Here the oracle is NumPy's fp64 FFT, scaled
by 1/N to the reference convention, with ``jnp.fft`` available as the
secondary on-device baseline (the role cuFFT-fp16/fp32 plays in the accuracy
curves, AccuracyTestCuFFT.cu:53-56).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["fft_oracle", "fftn_oracle", "xla_baseline"]


def fft_oracle(
    re: np.ndarray, im: np.ndarray, scaling: str = "forward", axis: int = -1
) -> Tuple[np.ndarray, np.ndarray]:
    """fp64 forward FFT of a split-complex signal, 1/N-scaled by default."""
    x = np.asarray(re, dtype=np.float64) + 1j * np.asarray(im, dtype=np.float64)
    out = np.fft.fft(x, axis=axis)
    n = x.shape[axis]
    if scaling == "forward":
        out = out / n
    elif scaling == "ortho":
        out = out / np.sqrt(n)
    elif scaling != "none":
        raise ValueError(f"bad scaling {scaling!r}")
    return out.real.copy(), out.imag.copy()


def fftn_oracle(re, im, axes=None, scaling: str = "forward"):
    x = np.asarray(re, dtype=np.float64) + 1j * np.asarray(im, dtype=np.float64)
    out = np.fft.fftn(x, axes=axes)
    if axes is None:
        axes = range(x.ndim)
    n = int(np.prod([x.shape[a] for a in axes]))
    if scaling == "forward":
        out = out / n
    elif scaling == "ortho":
        out = out / np.sqrt(n)
    return out.real.copy(), out.imag.copy()


def xla_baseline(re, im, scaling: str = "forward"):
    """On-device jnp.fft baseline (complex64) — the 'cuFFT fp32' analog."""
    import jax.numpy as jnp

    x = jnp.asarray(re, dtype=jnp.float32) + 1j * jnp.asarray(im, dtype=jnp.float32)
    out = jnp.fft.fft(x, axis=-1)
    n = x.shape[-1]
    if scaling == "forward":
        out = out / n
    elif scaling == "ortho":
        out = out / np.sqrt(n)
    return np.asarray(jnp.real(out)), np.asarray(jnp.imag(out))
