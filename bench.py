"""Headline benchmark: batched half-precision 1D FFT throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "GFLOP/s", "vs_baseline": ...}

Headline config = BASELINE.md row 1 (batch=4096, N=16384, bf16 storage); the
secondary N=4096 config (BASELINE config 1 family) is reported alongside in
"secondary".  GFLOP/s uses the standard 5*N*log2(N) complex-FFT flop
convention (what cuFFT reports).  vs_baseline = speedup over the plain-XLA
staged path compiled from the same math (the "library without custom kernels"
baseline; jnp.fft cannot run on this TPU backend — no complex support).

Measurement is decision-grade (round-1 verdict: single chain_measure windows
drift by tens of percent on the shared relay): each config interleaves the
fused path and the staged baseline round-by-round via
testing.timer.chain_compare (A_low, B_low, A_high, B_high per round, median
of per-round slopes, reference methodology anchor: Bench.h:121-149's
100-sample mean±σ), and the reported sigma is the across-round spread.
Three consecutive runs land within the interleaved-median's sigma (~±10%).
"""
import argparse
import json
import sys

import numpy as np


def _measure_config(n, batch, precision, smoke):
    import jax
    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import _fft_split_jit
    from tensorfft_tpu.testing.timer import chain_compare

    rng = np.random.default_rng(0)
    storage = tfft.Precision(precision).storage_dtype
    re = jnp.asarray(rng.standard_normal((batch, n)), storage)
    im = jnp.asarray(rng.standard_normal((batch, n)), storage)

    # "auto" consults the committed autotuner cache (reference-workflow parity:
    # its bench reads TunerResults.dat back through CreatePlan, Plan.h:197-255).
    plan = tfft.create_plan(n, precision=precision, tuning="auto",
                            batch_hint=batch)
    plan_base = tfft.create_plan(n, precision=precision, strategy="staged")

    from tensorfft_tpu.tuning.tuner import chain_step_for_plan

    # Layout-stationary chain step (four-step would otherwise pay a spurious
    # XLA relayout per chain iteration; divisor accounts for fwd+inv steps).
    fused, divisor = chain_step_for_plan(plan)
    staged = lambda a, b: _fft_split_jit(a, b, plan_base, True)

    # Cross-window drift on the shared relay reaches tens of percent even
    # for interleaved pairs (identical configs measured 215 vs 366 us in
    # separate windows), so take the median over several windows; sigma is
    # the across-window spread — the honest reproducibility bar.
    kwargs = dict(iters_low=1, iters_high=3, reps=2) if smoke else {}
    windows = 1 if smoke else 3
    ts, tbs = [], []
    for _ in range(windows):
        r, rb = chain_compare(fused, staged, (re, im), **kwargs)
        if not np.isnan(r.average_time_ns):
            ts.append(r.average_time_ns / divisor)
        if not np.isnan(rb.average_time_ns):
            tbs.append(rb.average_time_ns)
    import dataclasses

    ts = ts or [float("nan")]
    tbs = tbs or [float("nan")]
    r = dataclasses.replace(
        r,
        average_time_ns=float(np.median(ts)),
        std_deviation_ns=float(np.std(ts)),
    )
    rb = dataclasses.replace(rb, average_time_ns=float(np.median(tbs)))

    flops = 5.0 * n * float(np.log2(n)) * batch
    gflops = flops / max(r.average_time_ns, 1e-9)

    from tensorfft_tpu.utils import fft_roofline_seconds

    itemsize = jnp.dtype(storage).itemsize
    if plan.resolve_strategy().value == "four_step":
        passes = 2
        radices = tuple(plan.col_radices) + tuple(plan.row_radices)
    else:
        passes = 1
        radices = plan.radices
    roofline_s = fft_roofline_seconds(n, batch, radices, itemsize, passes=passes)

    return {
        "n": n,
        "batch": batch,
        "gflops": round(gflops, 1),
        "time_us": round(r.average_time_ns / 1e3, 1),
        "sigma_us": round(r.std_deviation_ns / 1e3, 1),
        "baseline_time_us": round(rb.average_time_ns / 1e3, 1),
        "vs_baseline": round(rb.average_time_ns / max(r.average_time_ns, 1e-9), 3),
        "strategy": plan.resolve_strategy().value,
        "radices": list(plan.radices),
        "roofline_fraction": round(roofline_s / (r.average_time_ns / 1e9), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384,
                    help="headline transform length (BASELINE.md row 1)")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--secondary-n", type=int, default=4096,
                    help="also-reported config; 0 disables")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + interpret-friendly (CI)")
    args = ap.parse_args()

    if args.smoke:
        args.n, args.batch, args.secondary_n = 256, 256, 0

    import jax

    head = _measure_config(args.n, args.batch, args.precision, args.smoke)
    secondary = None
    if args.secondary_n:
        secondary = _measure_config(
            args.secondary_n, args.batch, args.precision, args.smoke
        )

    result = {
        "metric": "batched_1d_fft_throughput",
        "value": head["gflops"],
        "unit": "GFLOP/s",
        "vs_baseline": head["vs_baseline"],
        "config": {
            "n": head["n"],
            "batch": head["batch"],
            "precision": args.precision,
            "strategy": head["strategy"],
            "radices": head["radices"],
            "flop_convention": "5*N*log2(N) per transform",
        },
        "time_us": head["time_us"],
        "sigma_us": head["sigma_us"],
        "baseline_time_us": head["baseline_time_us"],
        "baseline": "staged-XLA same-math path (jnp.fft unsupported on this TPU backend)",
        "roofline_fraction": head["roofline_fraction"],
        "measurement": "interleaved chain_compare medians (decision-grade)",
        "platform": jax.devices()[0].platform,
    }
    if secondary is not None:
        result["secondary"] = secondary
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
