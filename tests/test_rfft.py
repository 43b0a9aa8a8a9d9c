"""R2C/C2R transforms vs numpy (config-4 capability extension)."""
import numpy as np
import pytest

import tensorfft_tpu as tfft
from tensorfft_tpu.rfft import irfft_split, rfft_split


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_rfft_matches_numpy(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    plan = tfft.create_plan(n // 2, precision="float32", strategy="staged")
    o_re, o_im = rfft_split(x, plan)
    want = np.fft.rfft(x) / n  # library forward scaling
    got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
    assert got.shape == (n // 2 + 1,)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rfft_batched():
    n, b = 512, 6
    rng = np.random.default_rng(1)
    x = rng.standard_normal((b, n)).astype(np.float32)
    plan = tfft.create_plan(n // 2, precision="float32", strategy="staged")
    o_re, o_im = rfft_split(x, plan)
    want = np.fft.rfft(x, axis=-1) / n
    got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("scaling", ["forward", "none", "ortho"])
def test_rfft_irfft_roundtrip(scaling):
    n = 2048
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n).astype(np.float32)
    plan = tfft.create_plan(n // 2, precision="float32", strategy="staged",
                            scaling=scaling)
    o_re, o_im = rfft_split(x, plan)
    back = np.asarray(irfft_split(o_re, o_im, plan), np.float64)
    np.testing.assert_allclose(back, x, atol=2e-4)


def test_irfft_matches_numpy():
    n = 1024
    rng = np.random.default_rng(3)
    spec = np.fft.rfft(rng.standard_normal(n)) / n
    plan = tfft.create_plan(n // 2, precision="float32", strategy="staged")
    got = np.asarray(irfft_split(spec.real.copy(), spec.imag.copy(), plan), np.float64)
    want = np.fft.irfft(spec * n, n=n)
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_rfft_rejects_odd_length():
    with pytest.raises(ValueError):
        rfft_split(np.ones(255))


def test_rfft_large_roundtrip_split_precision():
    # Config-4 scale: N = 2^20 roundtrip at the gate tolerances via the
    # x3-compensated float32 policy (four-step path under AUTO strategy).
    n = 1 << 20
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n).astype(np.float32)
    plan = tfft.create_plan(n // 2, precision="float32")
    o_re, o_im = rfft_split(x, plan)
    want = np.fft.rfft(x) / n
    got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
    dev = np.abs(got - want)
    assert dev.mean() < 1e-3 and dev.max() < 0.5
    back = np.asarray(irfft_split(o_re, o_im, plan), np.float64)
    rt = np.abs(back - x)
    assert rt.mean() < 1e-3, rt.mean()


def test_rfftn_matches_numpy():
    # N-D R2C: rfft along the last axis + C2C along the rest, the
    # numpy.fft.rfftn contract (scaled by 1/prod(shape) under 'forward').
    rng = np.random.default_rng(11)
    x = rng.standard_normal((4, 8, 16)).astype(np.float32)
    got = tfft.rfftn(x, precision="float32")
    want = np.fft.rfftn(x) / x.size
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-4
    back = tfft.irfftn(got, precision="float32")
    assert np.abs(back - x).max() < 1e-3


def test_rfftn_requires_last_axis():
    x = np.ones((4, 8), np.float32)
    with pytest.raises(ValueError, match="last axis"):
        tfft.rfftn_split(x, axes=(0,))


def test_rfftn_partial_axes():
    # axes=(-1,): pure rfft; axes=(0, 2): transform two of three dims.
    rng = np.random.default_rng(12)
    x = rng.standard_normal((4, 6, 8)).astype(np.float32)
    got = tfft.rfftn(x, axes=(0, 2), precision="float32")
    want = np.fft.rfftn(x, axes=(0, 2)) / (4 * 8)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-4
