"""rfft Pallas epilogue kernels vs the XLA formulations (bit-identical).

The kernels (ops/rfft_pallas.py) replace the XLA structural-op pack/untangle
that measured 94% overhead on TPU (results/RESULTS.md S10/S11); these tests
pin the contract that both implementations agree: bit-identical for bf16
storage, and within 1 fp32 ulp otherwise (FMA contraction may differ
between the kernel and XLA lowerings of the same elementwise chain).
"""
import importlib

import numpy as np
import pytest

import jax.numpy as jnp

import tensorfft_tpu as tfft
from tensorfft_tpu.ops import rfft_pallas
from tensorfft_tpu.rfft import irfft_split, rfft_split

rfft_mod = importlib.import_module("tensorfft_tpu.rfft")


def _assert_epilogue_equal(got, want, dtype, atol=3e-7):
    """bf16 outputs are bit-identical; f32 may differ by 1 ulp (FMA
    contraction differences between the kernel and XLA lowerings).  Callers
    comparing THROUGH a transform pass a larger atol: a 1-ulp difference
    entering an inverse FFT grows ~sqrt(N) by output time."""
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    if jnp.dtype(dtype) == jnp.bfloat16:
        np.testing.assert_array_equal(g, w)
    else:
        np.testing.assert_allclose(g, w, rtol=3e-7, atol=atol)


@pytest.mark.parametrize("dtype", ["bfloat16", "float32"])
@pytest.mark.parametrize("b,m", [(16, 512), (4, 2048), (5, 256), (1, 1024)])
def test_pack_matches_deinterleave(b, m, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 2 * m)), jnp.dtype(dtype))
    got_re, got_im = rfft_pallas.pack_split(x, interpret=True)
    want_re, want_im = rfft_mod._deinterleave(x)
    assert got_re.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(got_re, np.float32),
                                  np.asarray(want_re, np.float32))
    np.testing.assert_array_equal(np.asarray(got_im, np.float32),
                                  np.asarray(want_im, np.float32))


@pytest.mark.parametrize("dtype", ["bfloat16", "float32"])
@pytest.mark.parametrize("b,m", [(16, 512), (3, 2048)])
def test_interleave_matches_stack(b, m, dtype):
    rng = np.random.default_rng(1)
    dt = jnp.dtype(dtype)
    re = jnp.asarray(rng.standard_normal((b, m)), dt)
    im = jnp.asarray(rng.standard_normal((b, m)), dt)
    got = rfft_pallas.interleave_split(re, im, interpret=True)
    want = rfft_mod._interleave(re, im).astype(dt)
    assert got.shape == (b, 2 * m)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


@pytest.mark.parametrize("dtype", ["bfloat16", "float32"])
@pytest.mark.parametrize("b,m", [(16, 512), (2, 2048), (7, 128)])
def test_untangle_matches_xla(b, m, dtype):
    rng = np.random.default_rng(2)
    dt = jnp.dtype(dtype)
    n = 2 * m
    z_re = jnp.asarray(rng.standard_normal((b, m)), dt)
    z_im = jnp.asarray(rng.standard_normal((b, m)), dt)
    scale = 0.25
    got_re, got_im = rfft_pallas.untangle_fwd(z_re, z_im, n=n, scale=scale,
                                              interpret=True)
    want_re, want_im = rfft_mod._untangle_fwd(z_re, z_im, n, scale, dt)
    assert got_re.shape == (b, m + 1)
    _assert_epilogue_equal(got_re, want_re, dt)
    _assert_epilogue_equal(got_im, want_im, dt)


@pytest.mark.parametrize("dtype", ["bfloat16", "float32"])
@pytest.mark.parametrize("b,m", [(16, 512), (2, 2048), (7, 128)])
def test_retangle_matches_xla(b, m, dtype):
    rng = np.random.default_rng(3)
    dt = jnp.dtype(dtype)
    n = 2 * m
    re = jnp.asarray(rng.standard_normal((b, m + 1)), dt)
    im = jnp.asarray(rng.standard_normal((b, m + 1)), dt)
    scale = 1.0
    got_re, got_im = rfft_pallas.retangle_inv(re, im, n=n, scale=scale,
                                              out_dtype=dt, interpret=True)
    want_re, want_im = rfft_mod._retangle_inv(
        re.astype(jnp.float32), im.astype(jnp.float32), n, scale)
    assert got_re.shape == (b, m)
    _assert_epilogue_equal(got_re, want_re.astype(dt), dt)
    _assert_epilogue_equal(got_im, want_im.astype(dt), dt)


@pytest.mark.parametrize("precision", ["float32", "bfloat16"])
def test_rfft_epilogue_pallas_end_to_end(precision):
    # Full rfft/irfft through the Pallas epilogue (interpret on CPU) is
    # bit-identical to the XLA epilogue and inverts correctly.
    n, b = 4096, 4
    rng = np.random.default_rng(4)
    plan = tfft.create_plan(n // 2, precision=precision, strategy="staged")
    x = jnp.asarray(rng.standard_normal((b, n)),
                    plan.precision.storage_dtype)
    st = plan.precision.storage_dtype
    p_re, p_im = rfft_split(x, plan, epilogue="pallas")
    x_re, x_im = rfft_split(x, plan, epilogue="xla")
    _assert_epilogue_equal(p_re, x_re, st)
    _assert_epilogue_equal(p_im, x_im, st)
    back_p = irfft_split(p_re, p_im, plan, epilogue="pallas")
    back_x = irfft_split(p_re, p_im, plan, epilogue="xla")
    _assert_epilogue_equal(back_p, back_x, st, atol=2e-5)
    tol = 2e-2 if precision == "bfloat16" else 2e-4
    np.testing.assert_allclose(np.asarray(back_p, np.float64),
                               np.asarray(x, np.float64), atol=tol)


def test_rfft_epilogue_pallas_1d_and_odd_batch():
    # 1-D input and non-sublane-multiple batches go through the padding path.
    n = 2048
    rng = np.random.default_rng(5)
    plan = tfft.create_plan(n // 2, precision="float32", strategy="staged")
    for shape in [(n,), (3, n)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        p_re, p_im = rfft_split(x, plan, epilogue="pallas")
        want = np.fft.rfft(np.asarray(x, np.float64), axis=-1) / n
        got = np.asarray(p_re, np.float64) + 1j * np.asarray(p_im, np.float64)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_rfft_epilogue_pallas_rejects_small():
    with pytest.raises(ValueError):
        rfft_split(np.ones(128, np.float32), epilogue="pallas",
                   strategy="staged")


def test_epilogue_supported_gate():
    assert rfft_pallas.epilogue_supported(512)
    assert rfft_pallas.epilogue_supported(1 << 19)
    assert not rfft_pallas.epilogue_supported(64)
    # m < 2*lane_tile non-multiples run with lt = m (the pre-round-3 default
    # tile accepted these; the gate must not silently tighten).
    assert rfft_pallas.epilogue_supported(384)


@pytest.mark.parametrize("dtype", ["bfloat16", "float32"])
def test_untangle_retangle_multi_big_block(monkeypatch, dtype):
    """Exercise mbk >= 2: multiple big blocks per batch row, so the
    j-dependent modular index maps (b_spec/a_spec) and the Nyquist-at-j==mbk
    branch all run (ADVICE r3: every default-constant shape gave mbk == 1).
    Shrinking LANE_BLOCK_TARGET forces small K without needing m >= 8192."""
    monkeypatch.setattr(rfft_pallas, "LANE_BLOCK_TARGET", 256)
    rng = np.random.default_rng(6)
    dt = jnp.dtype(dtype)
    b, m = 4, 1024  # K = 2, L = 256, mbk = 4
    n = 2 * m
    z_re = jnp.asarray(rng.standard_normal((b, m)), dt)
    z_im = jnp.asarray(rng.standard_normal((b, m)), dt)
    got_re, got_im = rfft_pallas.untangle_fwd(
        z_re, z_im, n=n, scale=0.25, lane_tile=128, interpret=True)
    want_re, want_im = rfft_mod._untangle_fwd(z_re, z_im, n, 0.25, dt)
    _assert_epilogue_equal(got_re, want_re, dt)
    _assert_epilogue_equal(got_im, want_im, dt)

    re = jnp.asarray(rng.standard_normal((b, m + 1)), dt)
    im = jnp.asarray(rng.standard_normal((b, m + 1)), dt)
    got_re, got_im = rfft_pallas.retangle_inv(
        re, im, n=n, scale=1.0, out_dtype=dt, lane_tile=128, interpret=True)
    want_re, want_im = rfft_mod._retangle_inv(
        re.astype(jnp.float32), im.astype(jnp.float32), n, 1.0)
    _assert_epilogue_equal(got_re, want_re.astype(dt), dt)
    _assert_epilogue_equal(got_im, want_im.astype(dt), dt)


@pytest.mark.parametrize("precision", ["bfloat16", "float32"])
def test_rfft_four_step_fused_pack_interleave(precision):
    """Round-4 fused epilogues: four-step plans ride the pack on K1's input
    map and the interleave on K2's output map (four_step_fft_packed_real /
    four_step_fft_to_real).  Pack/interleave are exact permutations applied
    in the storage dtype, so the full rfft/irfft must match the standalone-
    kernel 'pallas' formulation bit-for-bit on the pack/interleave legs;
    end-to-end the only tolerated difference is the untangle/retangle fp32
    contraction ulp (bf16 storage: bit-identical)."""
    m = 1 << 15
    n = 2 * m
    b = 2
    plan = tfft.create_plan(
        m, precision=precision,
        tuning={"strategy": "four_step", "four_step_split": (128, 256)},
    )
    from tensorfft_tpu.rfft import _fused_pack_ok
    assert _fused_pack_ok(plan)
    rng = np.random.default_rng(7)
    x64 = rng.standard_normal((b, n))
    x = jnp.asarray(x64, plan.precision.storage_dtype)
    st = plan.precision.storage_dtype

    f_re, f_im = rfft_split(x, plan, epilogue="pallas")
    want = np.fft.rfft(x64, axis=-1) / n
    got = np.asarray(f_re, np.float64) + 1j * np.asarray(f_im, np.float64)
    tol = 2e-3 if precision == "bfloat16" else 1e-5
    np.testing.assert_allclose(got, want, atol=tol)

    # Fused-pack mids == standalone pack_split + fft (bit-identical).
    from tensorfft_tpu.fft import _fft_split_jit, four_step_call_kwargs
    from tensorfft_tpu.ops import four_step_pallas, rfft_pallas

    z_re, z_im = rfft_pallas.pack_split(x, interpret=True)
    Z_re_s, Z_im_s = _fft_split_jit(z_re, z_im, plan, True)
    Z_re_f, Z_im_f = four_step_pallas.four_step_fft_packed_real(
        x, **four_step_call_kwargs(plan, forward=True))
    np.testing.assert_array_equal(
        np.asarray(Z_re_f.astype(st), np.float32),
        np.asarray(Z_re_s, np.float32))
    np.testing.assert_array_equal(
        np.asarray(Z_im_f.astype(st), np.float32),
        np.asarray(Z_im_s, np.float32))

    # Fused interleave == four_step_fft + interleave_split (bit-identical).
    x_f = four_step_pallas.four_step_fft_to_real(
        Z_re_s, Z_im_s, **four_step_call_kwargs(plan, forward=False))
    o_re, o_im = _fft_split_jit(Z_re_s, Z_im_s, plan, False)
    x_s = rfft_pallas.interleave_split(o_re, o_im, interpret=True)
    np.testing.assert_array_equal(np.asarray(x_f, np.float32),
                                  np.asarray(x_s, np.float32))

    # Roundtrip inverts.
    back = irfft_split(f_re, f_im, plan, epilogue="pallas")
    rt_tol = 3e-2 if precision == "bfloat16" else 2e-4
    np.testing.assert_allclose(np.asarray(back, np.float64), x64, atol=rt_tol)
