"""Arbitrary-length (Bluestein) FFT vs NumPy fp64 oracle."""
import numpy as np
import pytest

from tensorfft_tpu.bluestein import (
    fft_any,
    fft_split_any,
    ifft_any,
    ifft_split_any,
)


def _rel(got, want):
    scale = max(np.abs(want).max(), 1e-30)
    return np.abs(got - want).max() / scale


@pytest.mark.parametrize("n", [3, 5, 7, 12, 100, 257, 1000, 1536])
def test_fft_any_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    got = fft_any(x[None, :])[0]
    want = np.fft.fft(x) / n
    assert _rel(got, want) < 2e-4, n
    back = ifft_any(got[None, :])[0]
    assert _rel(back, x) < 1e-3, n


def test_fft_any_pow2_delegates_to_native():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(256) + 1j * rng.standard_normal(256)
    got = fft_any(x[None, :])[0]
    assert _rel(got, np.fft.fft(x) / 256) < 1e-4


def test_fft_any_batched_split():
    rng = np.random.default_rng(1)
    re = rng.standard_normal((3, 60)).astype(np.float32)
    im = rng.standard_normal((3, 60)).astype(np.float32)
    o_re, o_im = fft_split_any(re, im)
    want = np.fft.fft(re + 1j * im, axis=-1) / 60
    got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
    assert _rel(got, want) < 2e-4
    b_re, b_im = ifft_split_any(o_re, o_im)
    assert _rel(np.asarray(b_re) + 1j * np.asarray(b_im), re + 1j * im) < 1e-3


def test_fft_any_scaling_conventions():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(100) + 1j * rng.standard_normal(100)
    g_none = fft_any(x[None, :], scaling="none")[0]
    assert _rel(g_none, np.fft.fft(x)) < 2e-4
    assert _rel(ifft_any(g_none[None, :], scaling="none")[0], x) < 1e-3
    g_ortho = fft_any(x[None, :], scaling="ortho")[0]
    assert _rel(g_ortho, np.fft.fft(x, norm="ortho")) < 2e-4


def test_large_n_phase_reduction():
    # The n^2-mod-2N reduction keeps chirp phases exact where raw n^2 / N
    # in fp64 loses mantissa bits (n^2 ~ 2^54 at N ~ 2^27).  int64 squares
    # stay exact (< 2^63); the reduced argument must match bigint math and
    # must differ from the naive fp64 phase by more than fp64 roundoff.
    n = (1 << 27) - 1
    idx = np.array([n - 3, n - 2, n - 1], dtype=np.int64)
    sq = (idx * idx) % (2 * n)
    sq_exact = [(int(i) * int(i)) % (2 * n) for i in idx]
    assert list(sq) == sq_exact
    phase_exact = -np.pi * sq / n                     # |arg| < 2*pi
    phase_naive = -np.pi * (idx.astype(np.float64) ** 2) / n
    # wrap the naive phase into the principal range for comparison
    wrapped = np.angle(np.exp(1j * phase_naive))
    delta = np.abs(np.angle(np.exp(1j * (phase_exact - wrapped))))
    assert delta.max() > 1e-8  # naive fp64 phase is measurably wrong here


def test_bad_scaling_raises():
    with pytest.raises(ValueError, match="bad scaling"):
        fft_any(np.ones(10)[None, :], scaling="bogus")

def test_fft_any_accepts_tuning_kwarg_and_n1():
    # Review regressions: an explicit tuning= kwarg must not collide with
    # the M-plan's cache consultation, and N=1 is the identity transform.
    y = fft_any(np.ones(12, np.float32)[None, :], tuning="auto")
    assert y.shape == (1, 12)
    z = fft_any((np.ones(1, np.float32) * 3)[None, :])
    assert z[0, 0] == 3.0


def test_fft_split_any_dtype_matches_pow2_contract():
    # Both paths must return storage-dtype planes (bf16 under the bfloat16
    # policy), not a float32 special case on the Bluestein branch.
    import jax.numpy as jnp

    for n in (1000, 1024):
        r, i = fft_split_any(np.ones((1, n), np.float32),
                             np.zeros((1, n), np.float32),
                             precision="bfloat16")
        assert r.dtype == jnp.bfloat16, (n, r.dtype)
