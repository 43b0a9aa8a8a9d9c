"""Demo application tests: FFT convolution and distributed Poisson solve."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from tensorfft_tpu.models import (
    fft_convolve_2d,
    fft_convolve_real,
    poisson_solve_3d,
)


def circular_conv_2d_ref(a, b):
    return np.real(np.fft.ifft2(np.fft.fft2(a) * np.fft.fft2(b)))


def test_fft_convolve_2d():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((64, 128)).astype(np.float32)
    ker = rng.standard_normal((64, 128)).astype(np.float32)
    got = np.asarray(fft_convolve_2d(img, ker), np.float64)
    want = circular_conv_2d_ref(img, ker)
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=1e-3)


def test_fft_convolve_2d_identity_kernel():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    delta = np.zeros((32, 32), np.float32)
    delta[0, 0] = 1.0
    got = np.asarray(fft_convolve_2d(img, delta))
    np.testing.assert_allclose(got, img, atol=1e-3)


def test_fft_convolve_real():
    rng = np.random.default_rng(2)
    a = rng.standard_normal(512).astype(np.float32)
    b = rng.standard_normal(512).astype(np.float32)
    got = np.asarray(fft_convolve_real(a, b), np.float64)
    want = np.real(np.fft.ifft(np.fft.fft(a) * np.fft.fft(b)))
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_poisson_3d():
    # Manufactured solution: u = sin(2 pi x) sin(4 pi y) cos(2 pi z) on [0,1)^3
    # with the continuous spectral laplacian (exact for band-limited u).
    n = 16
    mesh = Mesh(np.asarray(jax.devices()), ("sp",))
    x, y, z = np.meshgrid(
        np.arange(n) / n, np.arange(n) / n, np.arange(n) / n, indexing="ij"
    )
    u_true = np.sin(2 * np.pi * x) * np.sin(4 * np.pi * y) * np.cos(2 * np.pi * z)
    lap = -((2 * np.pi) ** 2 + (4 * np.pi) ** 2 + (2 * np.pi) ** 2) * u_true
    u = np.asarray(
        poisson_solve_3d(lap.astype(np.float32), mesh, discrete=False), np.float64
    )
    np.testing.assert_allclose(u, u_true, atol=1e-4)


def test_poisson_3d_discrete_residual():
    # Discrete eigenvalues: residual of the 7-point Laplacian must vanish.
    n = 16
    mesh = Mesh(np.asarray(jax.devices()), ("sp",))
    rng = np.random.default_rng(3)
    f = rng.standard_normal((n, n, n)).astype(np.float32)
    f -= f.mean()
    u = np.asarray(poisson_solve_3d(f, mesh, discrete=True), np.float64)
    h2 = (1.0 / n) ** 2
    lap_u = (
        np.roll(u, 1, 0) + np.roll(u, -1, 0)
        + np.roll(u, 1, 1) + np.roll(u, -1, 1)
        + np.roll(u, 1, 2) + np.roll(u, -1, 2)
        - 6 * u
    ) / h2
    np.testing.assert_allclose(lap_u, f - f.mean(), atol=2e-3)
