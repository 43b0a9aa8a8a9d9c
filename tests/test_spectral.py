"""Spectral utilities: shifts, frequency grids, windows (vs NumPy oracles)."""
import numpy as np
import pytest

import tensorfft_tpu as tfft


@pytest.mark.parametrize("shape,axes", [
    ((8,), None), ((7,), None), ((4, 6), None), ((4, 6), (1,)),
    ((3, 5, 8), (0, 2)), ((5, 8), -1),
])
def test_fftshift_matches_numpy(shape, axes):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    want = np.fft.fftshift(x, axes)
    got = np.asarray(tfft.fftshift(x, axes))
    assert np.array_equal(got, want)
    want_i = np.fft.ifftshift(x, axes)
    got_i = np.asarray(tfft.ifftshift(x, axes))
    assert np.array_equal(got_i, want_i)
    # ifftshift inverts fftshift exactly, odd lengths included.
    assert np.array_equal(
        np.asarray(tfft.ifftshift(tfft.fftshift(x, axes), axes)), x
    )


def test_fftshift_split_centers_dc():
    # DC bin of an 8-point spectrum lands at index 4 after the shift.
    re = np.zeros((2, 8), np.float32)
    im = np.zeros((2, 8), np.float32)
    re[:, 0] = 1.0
    s_re, s_im = tfft.fftshift_split(re, im, axes=-1)
    assert np.asarray(s_re)[0, 4] == 1.0 and np.asarray(s_re)[0, 0] == 0.0
    b_re, b_im = tfft.ifftshift_split(s_re, s_im, axes=-1)
    assert np.array_equal(np.asarray(b_re), re)


@pytest.mark.parametrize("n,d", [(8, 1.0), (9, 0.25), (1024, 2.0)])
def test_freq_grids_match_numpy(n, d):
    assert np.allclose(np.asarray(tfft.fftfreq(n, d)), np.fft.fftfreq(n, d),
                       atol=1e-7)
    assert np.allclose(np.asarray(tfft.rfftfreq(n, d)), np.fft.rfftfreq(n, d),
                       atol=1e-7)


def test_windows_match_numpy():
    n = 256
    for kind, fn in [("hann", np.hanning), ("hamming", np.hamming),
                     ("blackman", np.blackman), ("bartlett", np.bartlett)]:
        got = np.asarray(tfft.window(kind, n, dtype=np.float64))
        assert np.allclose(got, fn(n), atol=1e-12), kind
    assert np.array_equal(np.asarray(tfft.window("rect", n)), np.ones(n,
                          np.float32))
    # Periodic (DFT-even) variant = first n points of the (n+1) symmetric
    # window; its FFT has zero leakage for a full-period sinusoid.
    wper = np.asarray(tfft.window("hann", n, dtype=np.float64, periodic=True))
    assert np.allclose(wper, np.hanning(n + 1)[:n], atol=1e-12)
    with pytest.raises(ValueError, match="unknown window"):
        tfft.window("flattop", n)


def test_windowed_rfft_leakage():
    # End-to-end: hann-windowed off-bin sinusoid through rfft has far less
    # leakage than the rectangular window (the reason windows exist).
    n = 1024
    x = np.cos(2 * np.pi * 100.37 * np.arange(n) / n).astype(np.float32)
    spec_rect = np.abs(tfft.rfft(x[None, :], precision="float32"))[0]
    w = np.asarray(tfft.window("hann", n, periodic=True))
    spec_hann = np.abs(tfft.rfft((x * w)[None, :], precision="float32"))[0]
    far = np.arange(n // 2 + 1)
    far_mask = np.abs(far - 100) > 20
    peak_r = spec_rect.max()
    peak_h = spec_hann.max()
    assert (spec_hann[far_mask] / peak_h).max() < 1e-3
    assert (spec_rect[far_mask] / peak_r).max() > 1e-3