"""FFT-based convolution demos (BASELINE.md configs 3 and 4).

Circular convolution via the convolution theorem: conv(a, b) = IFFT(FFT(a) *
FFT(b)).  The 2D variant exercises the row-column fft2 path (config 3, "2D
FFT via row-column matmul stages"); the real 1D variant exercises the R2C/C2R
pair (config 4).
"""
from __future__ import annotations

import jax.numpy as jnp

from tensorfft_tpu.fft import fftn_split, ifftn_split
from tensorfft_tpu.plan import create_plan
from tensorfft_tpu.rfft import irfft_split, rfft_split

__all__ = ["fft_convolve_2d", "fft_convolve_real"]


def _cmul(a_re, a_im, b_re, b_im):
    return a_re * b_re - a_im * b_im, a_re * b_im + a_im * b_re


def fft_convolve_2d(image, kernel, precision: str = "float32"):
    """Circular 2D convolution of ``image`` with ``kernel`` (same shape),
    computed as ifft2(fft2(image) * fft2(kernel)).  Split-planar internally;
    real inputs, real output."""
    image = jnp.asarray(image, jnp.float32)
    kernel = jnp.asarray(kernel, jnp.float32)
    if image.shape[-2:] != kernel.shape[-2:]:
        raise ValueError(f"shape mismatch {image.shape} vs {kernel.shape}")
    zeros_i = jnp.zeros_like(image)
    zeros_k = jnp.zeros_like(kernel)
    axes = (-2, -1)
    fi_re, fi_im = fftn_split(image, zeros_i, axes=axes,
                                       precision=precision)
    fk_re, fk_im = fftn_split(kernel, zeros_k, axes=axes,
                                       precision=precision)
    p_re, p_im = _cmul(fi_re.astype(jnp.float32), fi_im.astype(jnp.float32),
                       fk_re.astype(jnp.float32), fk_im.astype(jnp.float32))
    o_re, _o_im = ifftn_split(p_re, p_im, axes=axes,
                                       precision=precision)
    # Forward scaling 1/(H*W) applied twice, inverse unscaled: the product
    # spectrum carries 1/(HW)^2; circular conv theorem needs a single 1/(HW)
    # on the unscaled spectra product, so rescale by HW.
    hw = image.shape[-2] * image.shape[-1]
    return o_re.astype(jnp.float32) * hw


def fft_convolve_real(a, b, precision: str = "float32"):
    """Circular 1D convolution of two real signals via the R2C/C2R pair."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    n = a.shape[-1]
    if b.shape[-1] != n:
        raise ValueError("signals must have equal length")
    plan = create_plan(n // 2, precision=precision)
    fa_re, fa_im = rfft_split(a, plan)
    fb_re, fb_im = rfft_split(b, plan)
    p_re, p_im = _cmul(fa_re.astype(jnp.float32), fa_im.astype(jnp.float32),
                       fb_re.astype(jnp.float32), fb_im.astype(jnp.float32))
    out = irfft_split(p_re, p_im, plan)
    return out.astype(jnp.float32) * n
