"""A/B: public fused path (XLA transposes + transform-major kernel) vs the
batch-major fused kernel, decision-grade via chain_compare.

VERDICT.md round-1 weak #2: fused_fft_batch_major was written to absorb the
(B,N)->(N,B) XLA transposes into the kernel but never dispatched from fft.py.
This measures whether it should be, per (n, batch) config, on the real chip.
"""
import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ns", type=int, nargs="*",
                    default=[4096, 8192, 16384])
    args = ap.parse_args()

    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import _fft_split_jit, stage_scales
    from tensorfft_tpu.ops import four_step_pallas
    from tensorfft_tpu.testing.timer import chain_compare

    rng = np.random.default_rng(0)
    for n in args.ns:
        plan = tfft.create_plan(n, precision="bfloat16", tuning="auto")
        re = jnp.asarray(rng.standard_normal((args.batch, n)), jnp.bfloat16)
        im = jnp.asarray(rng.standard_normal((args.batch, n)), jnp.bfloat16)
        scales = stage_scales(plan.radices, plan.scaling, True)

        a = lambda x, y: _fft_split_jit(x, y, plan, True)
        b = lambda x, y: four_step_pallas.fused_fft_batch_major(
            x, y, radices=plan.radices, scales=scales,
            algorithm=plan.precision.dot_algorithm, grouped=plan.grouped,
        )
        ra, rb = chain_compare(a, b, (re, im))
        flops = 5.0 * n * float(np.log2(n)) * args.batch
        print(json.dumps({
            "n": n, "batch": args.batch, "radices": list(plan.radices),
            "transform_major_us": round(ra.average_time_ns / 1e3, 1),
            "batch_major_us": round(rb.average_time_ns / 1e3, 1),
            "transform_major_gflops": round(flops / ra.average_time_ns, 1),
            "batch_major_gflops": round(flops / rb.average_time_ns, 1),
            "speedup": round(ra.average_time_ns / rb.average_time_ns, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
