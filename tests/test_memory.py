"""Memory/layout helpers (DataHandler-mapping surface)."""
import numpy as np

import tensorfft_tpu as tfft
from tensorfft_tpu.memory import (
    donate_fft,
    from_device_split,
    interleaved_to_split,
    split_to_interleaved,
    to_device_split,
)


def test_interleaved_roundtrip():
    buf = np.arange(16.0)
    re, im = interleaved_to_split(buf)
    assert re.shape == (8,) and im.shape == (8,)
    np.testing.assert_array_equal(split_to_interleaved(re, im), buf)


def test_device_staging_dtype():
    import jax.numpy as jnp

    plan = tfft.create_plan(256)  # bf16 default
    re, im = to_device_split(np.ones(256), np.zeros(256), plan)
    assert re.dtype == jnp.bfloat16
    h_re, h_im = from_device_split(re, im)
    assert h_re.dtype == np.float32


def test_donate_fft_matches():
    n = 512
    plan = tfft.create_plan(n, precision="float32", strategy="staged")
    rng = np.random.default_rng(0)
    re = rng.standard_normal(n).astype(np.float32)
    im = rng.standard_normal(n).astype(np.float32)
    want = tfft.fft_split(re, im, plan)
    fn = donate_fft(plan)
    got = fn(*to_device_split(re, im, plan))
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), atol=1e-6
    )
