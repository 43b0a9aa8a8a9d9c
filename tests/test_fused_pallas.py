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


def test_mid_n_single_pass_fused_through_public_api():
    """A mid-N tuner winner with max_fused_length raised to n (the single-
    pass plan that beats the two-HBM-pass four-step bound) must run fused
    and match the oracle through create_plan -> fft_split."""
    import numpy as np
    import tensorfft_tpu as tfft
    from tensorfft_tpu.plan import Strategy, optimal_radices

    n, batch = 32768, 2
    tuning = {"strategy": "fused", "radices": optimal_radices(n),
              "max_fused_length": n, "state_dtype": "bfloat16"}
    plan = tfft.create_plan(n, precision="float32", tuning=tuning)
    assert plan.resolve_strategy() is Strategy.FUSED
    rng = np.random.default_rng(33)
    re = rng.standard_normal((batch, n)).astype(np.float32)
    im = rng.standard_normal((batch, n)).astype(np.float32)
    o_re, o_im = tfft.fft_split(re, im, plan)
    want = np.fft.fft(re + 1j * im, axis=-1) / n
    got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
    # bf16 in-VMEM state: reference-gate-grade, not fp32-grade.
    err = np.abs(got - want)
    assert err.mean() < 1e-3 and err.max() < 0.5


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
        # Wide K2 lane panels (k1_tile=256 halves the row-pass grid) — the
        # tuner's four-step twin challenge.
        {"strategy": "four_step", "four_step_split": (256, 256),
         "k1_tile": 256},
    ):
        plan = tfft.create_plan(n, precision="float32", tuning=tuning)
        if "col_radices" in tuning:
            assert plan.col_radices == tuning["col_radices"]
            assert plan.row_radices == tuning["row_radices"]
        if "k1_tile" in tuning:
            assert plan.k1_tile == tuning["k1_tile"]
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
    # k1_tile (the K2 lane-panel twin) must survive the same round trip.
    import dataclasses as _dc
    c2 = _dc.replace(c, k1_tile=256)
    entry2 = {k: list(v) if isinstance(v, tuple) else v
              for k, v in c2.as_tuning().items()}
    assert entry2["k1_tile"] == 256
    assert _config_from_entry(entry2) == c2


def test_four_step_gridslice_bit_identical_and_oracle():
    """engine='gridslice'/'gridslice16' on four-step plans defers the K2 row
    pass's last-stage interleave to the output DMA (the same mechanism as the
    fused gridslice engine).  Must be BIT-identical to the stacked row pass
    (same math, different store path) and gate-grade vs the fp64 oracle —
    including the fallback when the row radices cannot emit whole slices."""
    import numpy as np

    import tensorfft_tpu as tfft

    rng = np.random.default_rng(13)
    n = 1 << 16
    re = rng.standard_normal((2, n)).astype(np.float32)
    im = rng.standard_normal((2, n)).astype(np.float32)
    want = np.fft.fft(re + 1j * im, axis=-1) / n

    for split, extra in [
        ((128, 512), {}),                                    # K2 gridslice
        ((64, 1024), {"state_dtype": "bfloat16"}),           # narrow-k1 path
        ((128, 512), {"row_radices": (128, 4)}),             # fallback (R<8)
        ((256, 256), {"k1_tile": 256}),                      # single-stage row
        ((1024, 64), {}),                # K1 gridslice (slice-major twiddle)
    ]:
        outs = {}
        for eng in ("stacked", "gridslice", "gridslice16"):
            plan = tfft.create_plan(
                n, precision="float32",
                tuning={"strategy": "four_step", "four_step_split": split,
                        "engine": eng, **extra},
            )
            o_re, o_im = tfft.fft_split(re, im, plan)
            outs[eng] = (np.asarray(o_re), np.asarray(o_im))
        got = (outs["gridslice"][0].astype(np.float64)
               + 1j * outs["gridslice"][1].astype(np.float64))
        assert np.abs(got - want).max() < 1e-4, (split, extra)
        for eng in ("gridslice", "gridslice16"):
            assert np.array_equal(outs[eng][0], outs["stacked"][0]), (split, extra, eng)
            assert np.array_equal(outs[eng][1], outs["stacked"][1]), (split, extra, eng)


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


def test_planar_engine_matches_oracle():
    # Round-3 planar engine: separate re/im planes, twiddle-folded merged
    # [D_re; D_im] constants.  Must match the oracle at gate accuracy for
    # every structural case: single-stage, two-stage, >2-stage (kloop),
    # k > _MAX_KLOOP ('big' branch), and both fold variants.
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    for n, radices in [(256, (256,)), (4096, (64, 64)),
                       (1024, (16, 16, 4)), (16384, (64, 256))]:
        re = rng.standard_normal((n, 8)).astype(np.float32)
        im = rng.standard_normal((n, 8)).astype(np.float32)
        want = np.fft.fft(re + 1j * im, axis=0) / n
        from tensorfft_tpu.fft import stage_scales
        from tensorfft_tpu.ops.fused_pallas import fused_fft

        scales = stage_scales(radices, "forward", True)
        for engine in ("planar", "planar_vpu"):
            o_re, o_im = fused_fft(
                jnp.asarray(re, jnp.bfloat16), jnp.asarray(im, jnp.bfloat16),
                radices=radices, scales=scales, engine=engine,
            )
            got = (np.asarray(o_re, np.float64)
                   + 1j * np.asarray(o_im, np.float64))
            err = np.abs(got - want).mean()
            assert err < 1e-3, (n, radices, engine, err)


def test_pretwiddle_engine_matches_oracle():
    # Round-3 pretwiddle engine: each stage's twiddle is hoisted into the
    # PREVIOUS stage's epilogue as one broadcast multiply on the contiguous
    # output view (the stage breakdown located ~600 us of per-slice VPU
    # twiddle cost at the headline config).  Must match the oracle at gate
    # accuracy for every structural case: two-stage, >2-stage (chained
    # epilogues), k > _MAX_KLOOP ('big' branch), and mult3 composition.
    import jax.numpy as jnp

    from tensorfft_tpu.fft import stage_scales
    from tensorfft_tpu.ops.fused_pallas import fused_fft

    rng = np.random.default_rng(23)
    cases = [
        (256, (256,), {}),
        (4096, (64, 64), {}),
        (16384, (64, 256), {}),
        (1024, (16, 16, 4), {}),
        (65536, (128, 4, 128), {}),       # K=512 'big' stage epilogue
        (16384, (128, 128), {"complex_mult": "mult3"}),
    ]
    for n, radices, kw in cases:
        re = rng.standard_normal((n, 8)).astype(np.float32)
        im = rng.standard_normal((n, 8)).astype(np.float32)
        want = np.fft.fft(re + 1j * im, axis=0) / n
        scales = stage_scales(radices, "forward", True)
        o_re, o_im = fused_fft(
            jnp.asarray(re, jnp.bfloat16), jnp.asarray(im, jnp.bfloat16),
            radices=radices, scales=scales, engine="pretwiddle", **kw,
        )
        got = (np.asarray(o_re, np.float64)
               + 1j * np.asarray(o_im, np.float64))
        err = np.abs(got - want).mean()
        assert err < 1e-3, (n, radices, kw, err)


def test_gridslice_engine_matches_stacked_and_oracle():
    # Round-3 gridslice engine: the LAST stage's K-way sublane interleave
    # (the ~615 us jnp.stack at the headline config) is deferred to the
    # output DMA via a second grid dimension storing per-slice (R, 1, T)
    # blocks of an (R, S, B) output.  Must be BIT-identical to the stacked
    # engine (same math, different store path) across the structural cases:
    # kloop last stage, grouped p==1 last stage, mult3, bf16 state, batch
    # padding, and the unsupported-shape gate.
    import jax.numpy as jnp

    from tensorfft_tpu.fft import stage_scales
    from tensorfft_tpu.ops.fused_pallas import fused_fft, gridslice_layout

    rng = np.random.default_rng(31)
    cases = [
        (4096, (32, 128), 130, {}),                 # kloop last + padding
        (16384, (64, 256), 8, {}),                  # headline shape
        (8192, (64, 128), 8, {"grouped": True}),    # grouped p==1 last
        (4096, (32, 128), 8, {"complex_mult": "mult3"}),
        (16384, (64, 256), 8, {"state_dtype": "bfloat16"}),
        (4096, (32, 128), 8, {"engine": "gridslice8"}),
        (16384, (64, 256), 8, {"engine": "gridslice16"}),
    ]
    for n, radices, b, kw in cases:
        kw = dict(kw)
        engine = kw.pop("engine", "gridslice")
        assert gridslice_layout(radices, kw.get("grouped", False)) == (
            n // radices[-1])
        re = rng.standard_normal((n, b)).astype(np.float32)
        im = rng.standard_normal((n, b)).astype(np.float32)
        want = np.fft.fft(re + 1j * im, axis=0) / n
        scales = stage_scales(radices, "forward", True)
        o_re, o_im = fused_fft(
            jnp.asarray(re), jnp.asarray(im), radices=radices, scales=scales,
            algorithm="exact", engine=engine, **kw)
        s_re, s_im = fused_fft(
            jnp.asarray(re), jnp.asarray(im), radices=radices, scales=scales,
            algorithm="exact", engine="stacked", **kw)
        np.testing.assert_array_equal(np.asarray(o_re), np.asarray(s_re))
        np.testing.assert_array_equal(np.asarray(o_im), np.asarray(s_im))
        got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
        tol = 1e-4 if kw.get("state_dtype") == "bfloat16" else 1e-6
        assert np.abs(got - want).mean() < tol, (n, radices, kw)
    # Unsupported shapes must be rejected loudly, and gated out of the
    # tuner's candidate set by gridslice_layout returning None.
    assert gridslice_layout((16, 16, 64), False) is None  # 'big' last stage
    with pytest.raises(ValueError, match="gridslice"):
        fused_fft(jnp.zeros((16384, 8), jnp.float32),
                  jnp.zeros((16384, 8), jnp.float32),
                  radices=(16, 16, 64),
                  scales=stage_scales((16, 16, 64), "forward", True),
                  engine="gridslice")


def test_engine_knobs_through_public_paths():
    # The engine knob must reach every dispatch path: the fused public path,
    # the four-step passes, and fft2 — each at gate accuracy (float32 policy
    # so the check is tight).
    import tensorfft_tpu as tfft

    rng = np.random.default_rng(29)
    for engine in ("planar", "pretwiddle"):
        n = 1 << 16
        re = rng.standard_normal((2, n)).astype(np.float32)
        im = rng.standard_normal((2, n)).astype(np.float32)
        want = np.fft.fft(re + 1j * im, axis=-1) / n
        plan = tfft.create_plan(
            n, precision="float32",
            tuning={"strategy": "four_step", "four_step_split": (256, 256),
                    "engine": engine})
        o_re, o_im = tfft.fft_split(re, im, plan)
        got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
        assert np.abs(got - want).max() < 1e-4, (engine,)

        h = w = 256
        re2 = rng.standard_normal((1, h, w)).astype(np.float32)
        im2 = rng.standard_normal((1, h, w)).astype(np.float32)
        want2 = np.fft.fft2(re2 + 1j * im2, axes=(1, 2)) / (h * w)
        from tensorfft_tpu.ops.four_step_pallas import fft2_fused

        o2_re, o2_im = fft2_fused(
            np.asarray(re2, np.float32), np.asarray(im2, np.float32),
            radices1=(h,), radices2=(w,),
            scales1=(1.0 / h,), scales2=(1.0 / w,), sign=-1,
            algorithm="bf16x3", engine=engine)
        got2 = (np.asarray(o2_re, np.float64)
                + 1j * np.asarray(o2_im, np.float64))
        assert np.abs(got2 - want2).max() < 1e-4, (engine,)


def test_first_dot_compensation_small_n():
    # Round-2 verdict item 5: the bf16 small-N gate margin.  The compensated
    # first stage (matrix-side hi+lo split) must strictly reduce deviation
    # at N<=1024 and be the auto default exactly there.
    import tensorfft_tpu as tfft
    from tensorfft_tpu.testing import deviation, fft_oracle, make_test_signal

    assert tfft.create_plan(256).first_dot == "bf16ax2"
    assert tfft.create_plan(1024).first_dot == "bf16ax2"
    assert tfft.create_plan(2048).first_dot == "default"
    assert tfft.create_plan(256, precision="float32").first_dot == "default"

    for n in (256, 1024):
        devs = {}
        for fd in ("default", "bf16ax2"):
            avg = []
            for i in range(3):
                re, im = make_test_signal(n, 42 * (i + 1), 42 * 42 * (i + 1),
                                          cutoff=256)
                plan = tfft.create_plan(n, tuning={"first_dot": fd})
                got = tfft.fft_split(re, im, plan)
                avg.append(deviation(
                    (np.asarray(got[0], np.float64),
                     np.asarray(got[1], np.float64)),
                    fft_oracle(re, im)).average)
            devs[fd] = float(np.mean(avg))
        assert devs["bf16ax2"] < devs["default"], (n, devs)
        assert devs["bf16ax2"] <= 1e-3, (n, devs)  # gate with extra headroom


def test_interleave_downcast_bit_identical():
    # interleave_downcast casts the LAST stage's slices to the storage dtype
    # BEFORE the K-way interleave stack.  astype commutes with the
    # permutation, so outputs must be BIT-identical to the default across
    # the structural last-stage kinds (kloop, grouped p==1, mult3, 'big',
    # single-stage 'first') — the knob may only change Mosaic's lowering,
    # never values.
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    cases = [
        (4096, (32, 128), 130, {}),                # kloop last + padding
        (16384, (64, 256), 8, {}),                 # headline shape
        (8192, (64, 128), 8, {"grouped": True}),   # grouped p==1 last
        (4096, (32, 128), 8, {"complex_mult": "mult3"}),
        (4096, (16, 16, 16), 8, {}),               # 'big' last stage
        (256, (256,), 8, {}),                      # 'first' is also last
    ]
    for n, radices, b, kw in cases:
        re = rng.standard_normal((n, b)).astype(np.float32)
        im = rng.standard_normal((n, b)).astype(np.float32)
        scales = stage_scales(radices, "forward", True)
        args = dict(radices=radices, scales=scales, sign=-1,
                    algorithm="bf16", interpret=True, **kw)
        import jax.numpy as jnp
        re_b = jnp.asarray(re, jnp.bfloat16)
        im_b = jnp.asarray(im, jnp.bfloat16)
        d_re, d_im = fused_pallas.fused_fft(
            re_b, im_b, interleave_downcast=True, **args)
        s_re, s_im = fused_pallas.fused_fft(re_b, im_b, **args)
        assert d_re.dtype == jnp.bfloat16
        np.testing.assert_array_equal(np.asarray(d_re), np.asarray(s_re))
        np.testing.assert_array_equal(np.asarray(d_im), np.asarray(s_im))
        # and still correct vs the oracle (bf16 storage tolerance)
        want = np.fft.fft(re.astype(np.float64)
                          + 1j * im.astype(np.float64), axis=0) / n
        got = np.asarray(d_re, np.float64) + 1j * np.asarray(d_im, np.float64)
        assert np.abs(got - want).max() < 3e-2, (n, radices, kw)


def test_interleave_downcast_through_public_api():
    # Plan knob -> fused dispatch plumbing, plus validation and the tuner's
    # RunConfig/tuning-dict round trip.
    import dataclasses as _dc

    from tensorfft_tpu.tuning.tuner import RunConfig, _config_from_entry

    n, b = 1024, 32
    re, im = make_test_signal(n, 42, 1764)
    re_b = np.broadcast_to(re, (b, n)).copy()
    im_b = np.broadcast_to(im, (b, n)).copy()
    plan_d = tfft.create_plan(n, tuning={"interleave_downcast": True})
    assert plan_d.interleave_downcast is True
    got_d = tfft.fft_split(re_b, im_b, plan_d)
    got_s = tfft.fft_split(re_b, im_b, tfft.create_plan(n))
    np.testing.assert_array_equal(np.asarray(got_d[0]), np.asarray(got_s[0]))
    np.testing.assert_array_equal(np.asarray(got_d[1]), np.asarray(got_s[1]))

    with pytest.raises(ValueError, match="interleave_downcast"):
        tfft.create_plan(n, tuning={"interleave_downcast": True}) and None
        _dc.replace(plan_d, interleave_downcast="yes")

    cfg = RunConfig(strategy="fused", radices=(32, 32),
                    interleave_downcast=True)
    t = cfg.as_tuning()
    assert t["interleave_downcast"] is True
    assert _config_from_entry(t).interleave_downcast is True
    assert "interleave_downcast" not in RunConfig(
        strategy="fused", radices=(32, 32)).as_tuning()


def test_grouped_mult3_matches_grouped_block_and_oracle():
    """Round-4: complex_mult='mult3' INSIDE the grouped twiddle-fold.

    p == 1 grouped stages (radix >= 128) run as three RxR real matmuls on
    the folded per-slice tables (_grouped_g3_table) — 25% fewer padded MACs
    than the (2R, 2R) block fold, which is where the N=16384 headline is
    MXU-bound.  Not bit-identical to the block fold (different summation
    order), so the contract is gate-grade oracle accuracy plus agreement
    with the block-fold grouped engine at storage-rounding tolerance.
    Covers: fused headline shape, gridslice composition (emit_slices with
    mult3 slices), packed p >= 2 stages staying on the block path, and a
    four-step pass.
    """
    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import stage_scales
    from tensorfft_tpu.ops.fused_pallas import (
        _grouped_mult3, _stage_kinds, fused_fft)

    # Gate sanity: only p == 1, radix >= 128 grouped stages flip.
    kinds = list(_stage_kinds((64, 256), grouped=True))
    assert kinds[1][0] == "grouped" and kinds[1][3] == 1
    assert _grouped_mult3("grouped", 256, 1, "mult3")
    assert not _grouped_mult3("grouped", 32, 2, "mult3")  # packed stays block
    assert not _grouped_mult3("grouped", 256, 1, "block")
    assert not _grouped_mult3("kloop", 256, 1, "mult3")

    rng = np.random.default_rng(41)
    for n, radices, b, engine in [
        (16384, (64, 256), 8, "stacked"),    # the headline winner structure
        (16384, (64, 256), 8, "gridslice"),  # emit_slices composition
        (8192, (64, 128), 8, "stacked"),
        (1024, (8, 128), 8, "stacked"),      # p=1 radix-128 grouped stage
        (1024, (128, 8), 8, "stacked"),      # p=8 packed stage: stays block
    ]:
        re = rng.standard_normal((n, b)).astype(np.float32)
        im = rng.standard_normal((n, b)).astype(np.float32)
        want = np.fft.fft(re + 1j * im, axis=0) / n
        scales = stage_scales(radices, "forward", True)
        outs = {}
        for cm in ("block", "mult3"):
            o_re, o_im = fused_fft(
                jnp.asarray(re, jnp.bfloat16), jnp.asarray(im, jnp.bfloat16),
                radices=radices, scales=scales, grouped=True,
                complex_mult=cm, engine=engine,
            )
            outs[cm] = (np.asarray(o_re, np.float64)
                        + 1j * np.asarray(o_im, np.float64))
            err = np.abs(outs[cm] - want).mean()
            assert err < 1e-3, (n, radices, engine, cm, err)
        # Same math to storage rounding: bf16 outputs differ at most ~1 ulp.
        d = np.abs(outs["mult3"] - outs["block"]).max()
        scale = np.abs(outs["block"]).max()
        assert d <= 0.02 * scale, (n, radices, engine, d, scale)

    # Four-step pass with a grouped+mult3 row pass (shared stage_loop).
    n = 1 << 16
    re = rng.standard_normal((2, n)).astype(np.float32)
    im = rng.standard_normal((2, n)).astype(np.float32)
    want = np.fft.fft(re + 1j * im, axis=-1) / n
    plan = tfft.create_plan(
        n, precision="float32",
        tuning={"strategy": "four_step", "four_step_split": (128, 512),
                "col_radices": (128,), "row_radices": (4, 128),
                "grouped": True, "complex_mult": "mult3"},
    )
    o_re, o_im = tfft.fft_split(re, im, plan)
    got = np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64)
    assert np.abs(got - want).max() < 1e-4


def test_four_step_passes_knob_composes():
    # The per-pass floor-attribution knob (benchmarks/exp_four_step_floor.py):
    # passes="k1" returns the column pass's intermediate and passes="k2"
    # consumes its input as that intermediate, so k2(k1(x)) must be
    # BIT-identical to the production passes="both" — across both engine
    # branches (stacked and deferred-interleave gridslice).
    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import four_step_call_kwargs
    from tensorfft_tpu.ops.four_step_pallas import four_step_fft

    rng = np.random.default_rng(7)
    n = 4096
    re = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
    for tuning in (
        {"four_step_split": (64, 64)},
        {"four_step_split": (64, 64), "engine": "gridslice", "grouped": True},
    ):
        plan = tfft.create_plan(n, precision="float32",
                                strategy="four_step", tuning=tuning)
        kw = four_step_call_kwargs(plan, True)
        full = four_step_fft(re, im, **kw)
        comp = four_step_fft(
            *four_step_fft(re, im, **kw, passes="k1"), **kw, passes="k2")
        assert jnp.abs(comp[0] - full[0]).max() == 0, tuning
        assert jnp.abs(comp[1] - full[1]).max() == 0, tuning
