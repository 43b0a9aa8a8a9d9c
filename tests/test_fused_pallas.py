"""Fused Pallas kernel (interpret mode on CPU) vs the fp64 oracle and the
staged engine.  On TPU the same kernel compiles through Mosaic; interpret mode
checks the kernel logic (block indexing, stage math, padding) exactly."""
import numpy as np
import pytest

import tensorfft_tpu as tfft
from tensorfft_tpu.fft import stage_scales
from tensorfft_tpu.ops import fused_pallas
from tensorfft_tpu.testing import deviation, fft_oracle, make_test_signal


def run_fused(n, b, radices=None, algorithm="bf16", lane_tile=128, seed=0):
    import jax.numpy as jnp

    plan = tfft.create_plan(n, radices=radices)
    rng = np.random.default_rng(seed)
    re = rng.standard_normal((n, b)).astype(np.float32)
    im = rng.standard_normal((n, b)).astype(np.float32)
    scales = stage_scales(plan.radices, "forward", True)
    o_re, o_im = fused_pallas.fused_fft(
        jnp.asarray(re), jnp.asarray(im),
        radices=plan.radices, scales=scales, sign=-1,
        lane_tile=lane_tile, algorithm=algorithm, interpret=True,
    )
    x = re.astype(np.float64) + 1j * im.astype(np.float64)
    want = np.fft.fft(x, axis=0) / n
    got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
    return np.abs(got - want).max()


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_fused_matches_oracle(n):
    # bf16 matmul operands: ~1e-3 max err on dense random input
    assert run_fused(n, 128) < 5e-3


@pytest.mark.parametrize("n", [256, 4096])
def test_fused_x3_compensation(n):
    assert run_fused(n, 128, algorithm="bf16x3") < 1e-5


def test_fused_batch_padding():
    # batch not divisible by lane_tile exercises the pad/slice path
    for b in (1, 7, 130):
        assert run_fused(512, b) < 5e-3, b


@pytest.mark.parametrize("radices", [(16, 16), (2, 128), (4, 4, 16)])
def test_fused_radix_mixes(radices):
    assert run_fused(256, 64, radices=radices) < 5e-3


def test_fused_bf16_storage():
    import jax.numpy as jnp

    n, b = 1024, 64
    plan = tfft.create_plan(n)
    rng = np.random.default_rng(1)
    re = rng.standard_normal((n, b)).astype(np.float32)
    im = rng.standard_normal((n, b)).astype(np.float32)
    scales = stage_scales(plan.radices, "forward", True)
    o_re, o_im = fused_pallas.fused_fft(
        jnp.asarray(re, jnp.bfloat16), jnp.asarray(im, jnp.bfloat16),
        radices=plan.radices, scales=scales, sign=-1, interpret=True,
    )
    assert o_re.dtype == jnp.bfloat16
    x = re.astype(np.float64) + 1j * im.astype(np.float64)
    want = np.fft.fft(x, axis=0) / n
    got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
    # bf16 input quantization dominates
    assert np.abs(got - want).max() < 2e-2


def test_full_api_fused_and_four_step():
    # End-to-end through fft_split with AUTO strategy on CPU interpret.
    for n in (16384, 65536):
        re, im = make_test_signal(n, 3, 4)
        plan = tfft.create_plan(n, precision="float32")
        got = tfft.fft_split(re, im, plan)
        d = deviation(
            (np.asarray(got[0], np.float64), np.asarray(got[1], np.float64)),
            fft_oracle(re, im),
        )
        assert d.average < 1e-5, f"N={n}: {d}"
        assert plan.resolve_strategy().value == ("fused" if n <= 16384 else "four_step")


def test_fused_batch_major_matches_oracle():
    import jax.numpy as jnp

    from tensorfft_tpu.fft import stage_scales
    from tensorfft_tpu.ops.four_step_pallas import fused_fft_batch_major
    from tensorfft_tpu.plan import optimal_radices

    rng = np.random.default_rng(0)
    for b, n in ((7, 512), (64, 1024)):
        re = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
        rad = optimal_radices(n)
        sc = stage_scales(rad, "forward", True)
        o = fused_fft_batch_major(
            re, im, radices=rad, scales=sc, sign=-1, algorithm="bf16x3",
            interpret=True,
        )
        want = np.fft.fft(
            np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64), axis=1
        ) / n
        got = np.asarray(o[0], np.float64) + 1j * np.asarray(o[1], np.float64)
        assert np.abs(got - want).max() < 1e-5


def test_grouped_tuning_through_public_api():
    """A tuner entry with grouped=True must produce gate-grade results
    through create_plan -> fft_split (the path tuner winners take)."""
    import numpy as np
    import tensorfft_tpu as tfft

    n, batch = 512, 8
    rng = np.random.default_rng(21)
    re = rng.standard_normal((batch, n)).astype(np.float32)
    im = rng.standard_normal((batch, n)).astype(np.float32)
    plan = tfft.create_plan(
        n, precision="float32",
        tuning={"strategy": "fused", "radices": (32, 16), "grouped": True},
    )
    assert plan.grouped
    o_re, o_im = tfft.fft_split(re, im, plan)
    want = np.fft.fft(re + 1j * im, axis=-1) / n
    got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
    assert np.abs(got - want).max() < 1e-5


def test_kernel_entry_typed_errors():
    # User-facing shape errors must be ValueError, not bare assert
    # (reference parity: every fallible call returns an error,
    # ComputeFFT.h:147-150).
    import jax.numpy as jnp
    import pytest

    from tensorfft_tpu.ops import four_step_pallas, fused_pallas

    x = jnp.zeros((64, 8), jnp.float32)
    y = jnp.zeros((8, 64), jnp.float32)
    with pytest.raises(ValueError):
        fused_pallas.fused_fft(x, y, radices=(8, 8), scales=(1.0, 1.0))
    with pytest.raises(ValueError):
        fused_pallas.fused_fft(x, x, radices=(16, 16), scales=(1.0, 1.0))
    with pytest.raises(ValueError):
        four_step_pallas.four_step_fft(
            y, y, n1=8, n2=16, radices1=(8,), radices2=(16,),
            scales1=(1.0,), scales2=(1.0,))
    with pytest.raises(ValueError):
        four_step_pallas.fused_fft_batch_major(
            y, x, radices=(8, 8), scales=(1.0, 1.0))
    with pytest.raises(ValueError):
        four_step_pallas.fft2_fused(
            jnp.zeros((2, 8, 8)), jnp.zeros((2, 8, 4)),
            radices1=(8,), radices2=(8,), scales1=(1.0,), scales2=(1.0,))


def test_kloop_width_variants_match_oracle():
    # kloop_width packs g twiddled slices per stage matmul along lanes; any
    # width must be bit-compatible with the same plan at width 128 (g=1)
    # within storage rounding, and match the fp64 oracle at gate tolerances.
    import jax.numpy as jnp
    import numpy as np

    import tensorfft_tpu as tfft

    n, batch = 2048, 16
    rng = np.random.default_rng(3)
    re = rng.standard_normal((batch, n)).astype(np.float32)
    im = rng.standard_normal((batch, n)).astype(np.float32)
    want = np.fft.fft(re + 1j * im, axis=-1) / n

    for width in (128, 512, 4096):
        plan = tfft.create_plan(
            n, precision="float32",
            tuning={"radices": (16, 16, 8), "strategy": "fused",
                    "kloop_width": width},
        )
        o_re, o_im = tfft.fft_split(re, im, plan)
        got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
        assert np.abs(got - want).max() < 1e-5, width


def test_four_step_pass_radices_tuning_through_public_api():
    """Tuned per-pass radix orders (col_radices/row_radices, incl. descending
    + grouped — the widened four-step tuner search) must be gate-grade
    through create_plan -> fft_split and must round-trip the cache format."""
    import numpy as np

    import tensorfft_tpu as tfft

    n, batch = 1 << 16, 2
    rng = np.random.default_rng(7)
    re = rng.standard_normal((batch, n)).astype(np.float32)
    im = rng.standard_normal((batch, n)).astype(np.float32)
    want = np.fft.fft(re + 1j * im, axis=-1) / n

    for tuning in (
        {"strategy": "four_step", "four_step_split": (128, 512),
         "col_radices": (128,), "row_radices": (32, 16), "grouped": True},
        # state_dtype=bfloat16 with a sub-128 k1_tile exercises the fp32
        # fallback guard (Mosaic cannot shape-cast narrow bf16 vectors).
        {"strategy": "four_step", "four_step_split": (64, 1024),
         "state_dtype": "bfloat16"},
    ):
        plan = tfft.create_plan(n, precision="float32", tuning=tuning)
        if "col_radices" in tuning:
            assert plan.col_radices == tuning["col_radices"]
            assert plan.row_radices == tuning["row_radices"]
        o_re, o_im = tfft.fft_split(re, im, plan)
        got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
        assert np.abs(got - want).max() < 1e-4, tuning


def test_tuner_four_step_search_includes_pass_radix_variants():
    from tensorfft_tpu.tuning.tuner import (
        RunConfig, _config_from_entry, get_run_configs, get_search_space,
    )

    cfgs = get_run_configs(get_search_space(1 << 16))
    assert len(cfgs) == len(set(cfgs)), "duplicate configs in the sweep"
    descs = [c for c in cfgs if c.col_radices or c.row_radices]
    assert descs, "expected per-pass radix variants for four-step lengths"
    assert any(c.grouped for c in descs)
    # Cache round trip: entry -> RunConfig -> tuning dict keeps the radices.
    c = descs[0]
    entry = {k: list(v) if isinstance(v, tuple) else v
             for k, v in c.as_tuning().items()}
    assert _config_from_entry(entry) == c


def test_mult3_matches_block_and_oracle():
    """complex_mult='mult3' (3 real matmuls per radix>=128 stage) must stay
    gate-grade vs the fp64 oracle across stage kinds: 'first' + 'kloop'
    (N=16384, radices 128x128), 'big' (N=65536, radices (128,4,128) puts a
    radix-128 stage at K=512 > _MAX_KLOOP), and the four-step passes."""
    import numpy as np

    import tensorfft_tpu as tfft

    rng = np.random.default_rng(11)

    def check(n, tuning, batch=2, tol=1e-4):
        re = rng.standard_normal((batch, n)).astype(np.float32)
        im = rng.standard_normal((batch, n)).astype(np.float32)
        want = np.fft.fft(re + 1j * im, axis=-1) / n
        plan = tfft.create_plan(n, precision="float32", tuning=tuning)
        assert plan.complex_mult == "mult3"
        o_re, o_im = tfft.fft_split(re, im, plan)
        got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
        err = np.abs(got - want).max()
        assert err < tol, (n, tuning, err)

    check(16384, {"strategy": "fused", "radices": (128, 128),
                  "complex_mult": "mult3"}, batch=1)
    check(65536, {"strategy": "fused", "radices": (128, 4, 128),
                  "complex_mult": "mult3", "max_fused_length": 65536}, batch=1)
    check(1 << 16, {"strategy": "four_step", "four_step_split": (128, 512),
                    "col_radices": (128,), "row_radices": (4, 128),
                    "complex_mult": "mult3"})
