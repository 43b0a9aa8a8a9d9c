"""End-to-end conformance pipelines.

Mirror of the reference FFTTest.cu: FullSingleFFTComputation (the canonical
plan -> execute -> compare pipeline, FFTTest.cu:24-88), TestFullFFT (runs the
library and the fp64 oracle on the same seeded signal and checks the three
deviation thresholds, :240-295), and the UnitTest.cu sweep parameters
(N = 256..16^5, 10 seeded runs, thresholds avg 1e-3 / sigma 1e-2 / max 0.5,
UnitTest.cu:8-16).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from tensorfft_tpu.testing import datagen, metrics, oracle

__all__ = [
    "full_single_fft_computation",
    "test_full_fft",
    "run_unit_sweep",
    "REFERENCE_SWEEP",
]

# UnitTest.cu:8-12 parameters.
REFERENCE_SWEEP = dict(
    start_fft_length=256,
    end_fft_length=16 ** 5,
    runs_per_fft_length=10,
    highest_harmonic=20,
)


def full_single_fft_computation(
    fft_length: int,
    weights_re: np.ndarray,
    weights_im: np.ndarray,
    plan=None,
    **plan_kwargs,
) -> Tuple[np.ndarray, np.ndarray]:
    """The canonical end-to-end pipeline (FFTTest.cu:24-88 analog):
    generate signal -> plan -> execute on device -> fetch split result."""
    import tensorfft_tpu as tfft

    re = datagen.sine_superposition(fft_length, weights_re)
    im = datagen.sine_superposition(fft_length, weights_im)
    if plan is None:
        plan = tfft.create_plan(fft_length, **plan_kwargs)
    o_re, o_im = tfft.fft_split(re, im, plan)
    return np.asarray(o_re, np.float64), np.asarray(o_im, np.float64)


def test_full_fft(
    fft_length: int,
    average_deviation_threshold: float = metrics.REFERENCE_AVG_THRESHOLD,
    sigma_deviation_threshold: float = metrics.REFERENCE_SIGMA_THRESHOLD,
    max_deviation_threshold: float = metrics.REFERENCE_MAX_THRESHOLD,
    weights_re: Optional[np.ndarray] = None,
    weights_im: Optional[np.ndarray] = None,
    plan=None,
    **plan_kwargs,
) -> Tuple[bool, metrics.Deviation]:
    """TestFullFFT analog (FFTTest.cu:240-295): run library + oracle on the
    same signal, compare at the thresholds.  Returns (passed, deviation)."""
    if weights_re is None:
        weights_re = datagen.get_random_weights(20, 42)
    if weights_im is None:
        weights_im = datagen.get_random_weights(20, 42 * 42)
    got = full_single_fft_computation(
        fft_length, weights_re, weights_im, plan=plan, **plan_kwargs
    )
    re = datagen.sine_superposition(fft_length, weights_re)
    im = datagen.sine_superposition(fft_length, weights_im)
    want = oracle.fft_oracle(re, im)
    d = metrics.deviation(got, want)
    ok = d.passes_reference_gate(
        average_deviation_threshold,
        sigma_deviation_threshold,
        max_deviation_threshold,
    )
    return ok, d


def run_unit_sweep(
    start_fft_length: int = REFERENCE_SWEEP["start_fft_length"],
    end_fft_length: int = REFERENCE_SWEEP["end_fft_length"],
    runs_per_fft_length: int = REFERENCE_SWEEP["runs_per_fft_length"],
    highest_harmonic: int = REFERENCE_SWEEP["highest_harmonic"],
    precision: str = "bfloat16",
    verbose: bool = True,
    tuning=None,
    run_offset: int = 0,
) -> bool:
    """UnitTest.cu main() analog: full sweep, abort on first failure.

    Seeds 42*i / 42*42*i per run exactly as UnitTest.cu:21-24.

    ``tuning="auto"`` runs every length under its autotuner-cache winner
    (grouped/descending-radix/bf16-state configs included), so the gate
    certifies the configurations production plans actually use.

    ``run_offset`` starts the seed index at ``i = run_offset`` so the
    expensive tail lengths (2^26..2^28, where the fp64 oracle dominates
    wall time) can run ONE SEED PER PROCESS — a tunnel wedge then costs one
    seed, not the whole ten-seed protocol.
    """
    weights = [
        (
            datagen.get_random_weights(highest_harmonic, 42 * i),
            datagen.get_random_weights(highest_harmonic, 42 * 42 * i),
        )
        for i in range(run_offset, run_offset + runs_per_fft_length)
    ]
    n = start_fft_length
    while n <= end_fft_length:
        if verbose:
            print(f"Testing fft_length: {n}")
        for j in range(runs_per_fft_length):
            ok, d = test_full_fft(
                n, weights_re=weights[j][0], weights_im=weights[j][1],
                precision=precision, tuning=tuning,
            )
            if not ok:
                print(f"Error! Test at fft_length: {n} failed! {d}")
                return False
        n *= 2
    if verbose:
        print("All tests passed!")
    return True
