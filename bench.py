"""Headline benchmark: batched half-precision 1D FFT throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "GFLOP/s", "vs_baseline": ...}

Config (BASELINE.json config 2 family): batch=4096, N=4096, bf16 storage,
fused Pallas kernel.  GFLOP/s uses the standard 5*N*log2(N) complex-FFT flop
convention (what cuFFT reports).  vs_baseline = speedup over the plain-XLA
staged path compiled from the same math (the "library without custom kernels"
baseline; jnp.fft cannot run on this TPU backend — no complex support).

Timing uses the chained-slope method (tensorfft_tpu.testing.timer
.chain_measure): on the axon remote-relay backend, block_until_ready resolves
before device execution, so naive wall timing reads out physically impossible
numbers (>100x roofline).  Slopes of two fori_loop chain lengths ending in a
scalar fetch cancel dispatch/fetch latency; validated at 88% of bf16 matmul
peak and 92% of HBM bandwidth on v5e.

Extra keys in the JSON line: config, times, roofline fraction.
"""
import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + interpret-friendly (CI)")
    args = ap.parse_args()

    if args.smoke:
        args.n, args.batch = 256, 256

    import jax
    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import _fft_split_jit
    from tensorfft_tpu.testing.timer import chain_measure

    n, batch = args.n, args.batch
    rng = np.random.default_rng(0)
    storage = tfft.Precision(args.precision).storage_dtype
    re = jnp.asarray(rng.standard_normal((batch, n)), storage)
    im = jnp.asarray(rng.standard_normal((batch, n)), storage)

    # "auto" consults the committed autotuner cache (reference-workflow parity:
    # its bench reads TunerResults.dat back through CreatePlan, Plan.h:197-255).
    plan = tfft.create_plan(n, precision=args.precision, tuning="auto")
    plan_base = tfft.create_plan(n, precision=args.precision, strategy="staged")

    fused = lambda a, b: _fft_split_jit(a, b, plan, True)
    staged = lambda a, b: _fft_split_jit(a, b, plan_base, True)

    if args.smoke:
        r = chain_measure(fused, (re, im), iters_low=1, iters_high=3, reps=2)
        rb = chain_measure(staged, (re, im), iters_low=1, iters_high=3, reps=2)
    else:
        r = chain_measure(fused, (re, im))
        rb = chain_measure(staged, (re, im))

    flops = 5.0 * n * float(np.log2(n)) * batch
    gflops = flops / max(r.average_time_ns, 1e-9)

    # Speed-of-light model: HBM traffic bound vs padded block-complex MXU
    # bound (see tensorfft_tpu/utils/device.py).
    from tensorfft_tpu.utils import fft_roofline_seconds

    itemsize = jnp.dtype(storage).itemsize
    if plan.resolve_strategy().value == "four_step":
        passes = 2
        radices = tuple(plan.col_radices) + tuple(plan.row_radices)
    else:
        passes = 1
        radices = plan.radices
    roofline_s = fft_roofline_seconds(n, batch, radices, itemsize, passes=passes)
    roofline_fraction = roofline_s / (r.average_time_ns / 1e9)

    result = {
        "metric": "batched_1d_fft_throughput",
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(rb.average_time_ns / r.average_time_ns, 3),
        "config": {
            "n": n,
            "batch": batch,
            "precision": args.precision,
            "strategy": plan.resolve_strategy().value,
            "radices": list(plan.radices),
            "flop_convention": "5*N*log2(N) per transform",
        },
        "time_us": round(r.average_time_ns / 1e3, 1),
        "baseline_time_us": round(rb.average_time_ns / 1e3, 1),
        "baseline": "staged-XLA same-math path (jnp.fft unsupported on this TPU backend)",
        "roofline_fraction": round(roofline_fraction, 3),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
