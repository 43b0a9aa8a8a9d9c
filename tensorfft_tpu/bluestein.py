"""Arbitrary-length FFTs via Bluestein's algorithm (chirp-Z).

Capability extension beyond the reference (power-of-two only, Plan.h:85-96)
and beyond this repo's own power-of-two kernel contract: any length N is
expressed as a circular convolution of chirp-premultiplied data with a chirp
kernel, both carried by the existing power-of-two pipeline:

    y[n] = x[n] * a[n],          a[n] = exp(-i*pi*n^2/N)
    X[k] = a[k] * (y (*) b)[k],  b[n] = exp(+i*pi*n^2/N)  (circular, M-pt)

with M = next power of two >= 2N-1.  The chirp tables and the kernel's
M-point spectrum are fp64-accurate host constants (phases reduced mod 2N
before the complex exponential, so n^2 never loses precision to fp64
rounding at large N); the device runs two M-point transforms and three VPU
complex multiplies.  Cost: ~8x a power-of-two FFT of comparable size —
the standard Bluestein trade.

Scaling follows the library convention: 'forward' returns the 1/N-scaled
DFT (progressively scaled inside the M-point transforms), 'none' and
'ortho' analogous.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

from tensorfft_tpu.plan import is_power_of_2
from tensorfft_tpu.fft import fft_split as _fft_split, ifft_split as _ifft_split
from tensorfft_tpu import plan as _plan_mod

__all__ = ["fft_split_any", "ifft_split_any", "fft_any", "ifft_any"]


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


@functools.lru_cache(maxsize=64)
def _tables(n: int):
    """Chirp a[n] (conjugated pre/post multiplier) and the M-point spectrum
    of the chirp kernel b, both fp64; returns fp32 device constants."""
    m = _next_pow2(2 * n - 1)
    idx = np.arange(n, dtype=np.int64)
    # n^2 mod 2N keeps the phase argument small: exp(-i*pi*k/N) has period
    # 2N in k, and (n^2 mod 2N) is exact integer math where n^2 itself would
    # exceed fp64's 53-bit mantissa for N > ~2^26.
    sq = (idx * idx) % (2 * n)
    phase = -np.pi * sq / n
    a = np.cos(phase) + 1j * np.sin(phase)        # exp(-i pi n^2 / N)
    b = np.zeros(m, np.complex128)
    b[:n] = np.conj(a)                            # exp(+i pi n^2 / N)
    b[m - n + 1:] = np.conj(a)[1:][::-1]          # b[m-k] = b[k]
    b_hat = np.fft.fft(b)                         # unnormalized, fp64
    return (
        jnp.asarray(a.real, jnp.float32), jnp.asarray(a.imag, jnp.float32),
        jnp.asarray(b_hat.real, jnp.float32),
        jnp.asarray(b_hat.imag, jnp.float32),
        m,
    )


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def fft_split_any(re, im, forward: bool = True, scaling: str = "forward",
                  precision: str = "float32", **plan_kwargs):
    """FFT of ANY length along the last axis on split planar data.

    Power-of-two lengths delegate to the native pipeline; other lengths run
    Bluestein.  ``precision`` defaults to float32 (the chirp products run on
    the VPU in fp32 either way; bf16 storage through the 2N-point
    convolution costs ~1 decimal digit — opt in explicitly if wanted).
    """
    re = jnp.asarray(re)
    im = jnp.asarray(im)
    n = re.shape[-1]
    if n < 1 or re.shape != im.shape:
        raise ValueError(f"bad split input shapes {re.shape} / {im.shape}")
    storage = _plan_mod.Precision(precision).storage_dtype
    if n == 1:
        # The 1-point DFT is the identity, and every convention's scale is
        # 1^(+-1/2..1) = 1.
        if scaling not in ("forward", "none", "ortho"):
            raise ValueError(f"bad scaling {scaling!r}")
        return re.astype(storage), im.astype(storage)
    if is_power_of_2(n):
        plan = _plan_mod.create_plan(n, precision=precision, scaling=scaling,
                                     **plan_kwargs)
        fn = _fft_split if forward else _ifft_split
        return fn(re, im, plan)

    a_re, a_im, bh_re, bh_im, m = _tables(n)
    if not forward:
        a_im, bh_im = -a_im, -bh_im
    x_re = re.astype(jnp.float32)
    x_im = im.astype(jnp.float32)
    y_re, y_im = _cmul(x_re, x_im, a_re, a_im)
    pad = [(0, 0)] * (re.ndim - 1) + [(0, m - n)]
    y_re = jnp.pad(y_re, pad)
    y_im = jnp.pad(y_im, pad)

    # M-point circular convolution.  The 'none' convention is NumPy's
    # (stage_scales: forward unscaled, inverse carries 1/M), so
    # ifft_none(fft_none(y) * b_hat) IS the convolution — no extra scale.
    # An explicit tuning= kwarg overrides the default cache consultation
    # (note it then applies to the M-point plan, not a plan of length n).
    m_kwargs = dict(plan_kwargs)
    m_kwargs.setdefault("tuning", "auto")
    mplan = _plan_mod.create_plan(m, precision=precision, scaling="none",
                                  **m_kwargs)
    f_re, f_im = _fft_split(y_re, y_im, mplan)
    g_re, g_im = _cmul(f_re.astype(jnp.float32), f_im.astype(jnp.float32),
                       bh_re, bh_im)
    c_re, c_im = _ifft_split(g_re, g_im, mplan)
    c_re = c_re.astype(jnp.float32)[..., :n]
    c_im = c_im.astype(jnp.float32)[..., :n]
    o_re, o_im = _cmul(c_re, c_im, a_re, a_im)

    # The core above computes the UNSCALED sum (e^{-} forward, e^{+}
    # inverse); apply the library convention (stage_scales semantics).
    if scaling == "forward":
        s = 1.0 / n if forward else 1.0
    elif scaling == "none":
        s = 1.0 if forward else 1.0 / n
    elif scaling == "ortho":
        s = 1.0 / np.sqrt(n)
    else:
        raise ValueError(f"bad scaling {scaling!r}")
    if s != 1.0:
        o_re = o_re * s
        o_im = o_im * s
    # Match the pow2 delegation's output contract (storage-dtype planes).
    return o_re.astype(storage), o_im.astype(storage)


def ifft_split_any(re, im, scaling: str = "forward", **kw):
    """Inverse of :func:`fft_split_any` (same conventions as ifft_split)."""
    return fft_split_any(re, im, forward=False, scaling=scaling, **kw)


def fft_any(x, **kw):
    """Host-boundary convenience wrapper (any length, returns complex64)."""
    x = np.asarray(x)
    o_re, o_im = fft_split_any(x.real.copy(), x.imag.copy(), **kw)
    return np.asarray(o_re, np.float32) + 1j * np.asarray(o_im, np.float32)


def ifft_any(x, **kw):
    x = np.asarray(x)
    o_re, o_im = ifft_split_any(x.real.copy(), x.imag.copy(), **kw)
    return np.asarray(o_re, np.float32) + 1j * np.asarray(o_im, np.float32)
