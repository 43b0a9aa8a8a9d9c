"""Native C++ host library vs the NumPy implementations.

Builds libtfft_host.so on demand (g++ is available in CI); every binding must
bit-agree (to ~1 ulp) with its NumPy counterpart.
"""
import numpy as np
import pytest

from tensorfft_tpu import dft
from tensorfft_tpu.plan import optimal_radices
from tensorfft_tpu.testing import sine_superposition


@pytest.fixture(scope="module")
def native():
    import tensorfft_tpu.native as nat

    if nat.lib is None:
        nat.build()
        nat.lib = nat.NativeLib(nat.build())
    assert nat.lib is not None
    return nat.lib


def test_version(native):
    assert native.version == 1


@pytest.mark.parametrize("n", [256, 4096, 1 << 16, 1 << 20])
def test_optimal_radices_matches_python(native, n):
    assert native.optimal_radices(n) == optimal_radices(n)


@pytest.mark.parametrize("radix", [16, 64, 256])
def test_dft_matrix_matches_numpy(native, radix):
    # Bit-identical: the NumPy generators apply the native code's modular
    # phase reduction in the same expression order (dft.py), so the cached
    # tables cannot silently depend on whether libtfft_host.so is built.
    re, im = native.dft_matrix(radix, -1)
    t = np.arange(radix, dtype=np.int64)
    phase = -2.0 * np.pi * (np.outer(t, t) % radix).astype(np.float64) / radix
    np.testing.assert_array_equal(re, np.cos(phase))
    np.testing.assert_array_equal(im, np.sin(phase))


def test_stage_twiddle_matches_numpy(native):
    re, im = native.stage_twiddle(64, 128, -1)
    r = np.arange(64, dtype=np.int64)[:, None]
    k = np.arange(128, dtype=np.int64)[None, :]
    denom = 64 * 128
    phase = -2.0 * np.pi * ((r * k) % denom).astype(np.float64) / denom
    np.testing.assert_array_equal(re, np.cos(phase))
    np.testing.assert_array_equal(im, np.sin(phase))


def test_stage_twiddle_py_matches_native(native):
    dft._stage_twiddle_f64.cache_clear()
    re, im = dft.stage_twiddle(16, 4096, dtype=np.float64)
    n_re, n_im = native.stage_twiddle(16, 4096, -1)
    np.testing.assert_array_equal(re, n_re)
    np.testing.assert_array_equal(im, n_im)


def test_digit_reversal_perm(native):
    # Gathering the input through the permutation then running natural-order
    # DFT stages == FFT; verify against the defining digit-reversal property.
    n, radices = 64, (4, 4, 4)
    perm = native.digit_reversal_perm(n, radices)
    assert sorted(perm) == list(range(n))
    # self-inverse for symmetric radix sequences
    np.testing.assert_array_equal(perm[perm], np.arange(n))


def test_sine_superposition_matches_numpy(native):
    w = np.linspace(-1, 1, 20)
    for harmonics in ("linear", "pow2"):
        got = native.sine_superposition(1024, w, harmonics)
        want = sine_superposition(1024, w, harmonics)
        np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("n", [256, 4096, 1 << 16])
def test_fft_oracle_matches_numpy(native, n):
    rng = np.random.default_rng(0)
    re = rng.standard_normal(n)
    im = rng.standard_normal(n)
    o_re, o_im = native.fft_f64(re, im, sign=-1, scale=True)
    want = np.fft.fft(re + 1j * im) / n
    np.testing.assert_allclose(o_re + 1j * o_im, want, atol=1e-12)


def test_fft_oracle_inverse(native):
    n = 1024
    rng = np.random.default_rng(1)
    re = rng.standard_normal(n)
    im = rng.standard_normal(n)
    f_re, f_im = native.fft_f64(re, im, sign=-1, scale=True)
    b_re, b_im = native.fft_f64(f_re, f_im, sign=+1, scale=False)
    np.testing.assert_allclose(b_re, re, atol=1e-12)
    np.testing.assert_allclose(b_im, im, atol=1e-12)


def test_dft_py_uses_native_tables(native):
    # dft.py prefers the native generator when built; results identical.
    dft._dft_matrix_f64.cache_clear()
    re, im = dft.dft_matrix(32, dtype=np.float64)
    n_re, n_im = native.dft_matrix(32, -1)
    np.testing.assert_array_equal(re, n_re)
    np.testing.assert_array_equal(im, n_im)
