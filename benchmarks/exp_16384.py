"""N=16384 headline attack: which stage-2 formulation wins?

Current fused (128,128) runs stage 2 as a kloop of 128 narrow matmuls
(256x256 @ 256x128) — per-matmul overhead suspected at k=128.  Variants:
  big        — one wide matmul behind a sublane swap (_MAX_KLOOP patched)
  four_step  — two-pass Bailey (128,128) with the layout-stationary timing
  n4096      — fused N=4096 for scale (same window)
All chain_compare'd against the incumbent fused kloop path.
"""
import json

import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import _fft_split_jit
    from tensorfft_tpu.ops import fused_pallas
    from tensorfft_tpu.testing.timer import chain_compare
    from tensorfft_tpu.tuning.tuner import chain_step_for_plan

    n, batch = 16384, 4096
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((batch, n)), jnp.bfloat16)
    im = jnp.asarray(rng.standard_normal((batch, n)), jnp.bfloat16)
    flops = 5.0 * n * float(np.log2(n)) * batch

    plan = tfft.create_plan(n, precision="bfloat16", tuning="auto")
    base = lambda a, b: _fft_split_jit(a, b, plan, True)

    # Variant: force the 'big' branch for k=128 stages by lowering the kloop
    # threshold (trace-time constant; recompiles under a distinct jit key
    # because we pass radices as a new tuple object... actually same key —
    # so we patch and build a manually-keyed wrapper via interpret flag No:
    # simplest is to call fused_fft directly after patching; jit cache key
    # includes the python callable identity of the kernel lambda, which is
    # fresh per call site version. To be safe we use different radices
    # object? radices equal compare — patch BEFORE first big call only.)
    results = {}

    # 1. four_step vs fused (both through public machinery).
    plan4 = tfft.create_plan(
        n, precision="bfloat16",
        tuning={"strategy": "four_step", "four_step_split": (128, 128)},
    )
    step4, div4 = chain_step_for_plan(plan4)
    ra, rb = chain_compare(base, step4, (re, im))
    results["four_step_128x128"] = {
        "fused_us": round(ra.average_time_ns / 1e3, 1),
        "variant_us": round(rb.average_time_ns / div4 / 1e3, 1),
        "fused_gflops": round(flops / ra.average_time_ns, 1),
        "variant_gflops": round(flops * div4 / rb.average_time_ns, 1),
    }
    print(json.dumps({"pair": "four_step", **results["four_step_128x128"]}),
          flush=True)

    # 2. 'big' stage-2 branch: patch the kloop threshold and rebuild the jit
    # (fresh lambda => fresh trace).
    old = fused_pallas._MAX_KLOOP
    fused_pallas._MAX_KLOOP = 64
    try:
        from tensorfft_tpu.fft import stage_scales

        scales = stage_scales(plan.radices, plan.scaling, True)

        def big(a, b):
            o_re, o_im = fused_pallas.fused_fft(
                a.T, b.T, radices=plan.radices, scales=scales,
                lane_tile=plan.lane_tile, algorithm="bf16",
            )
            return o_re.T, o_im.T

        import jax

        big_j = jax.jit(big)
        ra, rb = chain_compare(base, big_j, (re, im))
        results["big_stage2"] = {
            "fused_us": round(ra.average_time_ns / 1e3, 1),
            "variant_us": round(rb.average_time_ns / 1e3, 1),
            "fused_gflops": round(flops / ra.average_time_ns, 1),
            "variant_gflops": round(flops / rb.average_time_ns, 1),
        }
        print(json.dumps({"pair": "big_stage2", **results["big_stage2"]}),
              flush=True)
    finally:
        fused_pallas._MAX_KLOOP = old

    # 3. N=4096 fused in the same window, for cross-window scale.
    n2 = 4096
    re2 = jnp.asarray(rng.standard_normal((batch, n2)), jnp.bfloat16)
    im2 = jnp.asarray(rng.standard_normal((batch, n2)), jnp.bfloat16)
    plan2 = tfft.create_plan(n2, precision="bfloat16", tuning="auto")
    small = lambda a, b: _fft_split_jit(a, b, plan2, True)
    flops2 = 5.0 * n2 * float(np.log2(n2)) * batch
    from tensorfft_tpu.testing.timer import chain_measure

    r2 = chain_measure(small, (re2, im2))
    print(json.dumps({
        "pair": "n4096_same_process",
        "n4096_us": round(r2.average_time_ns / 1e3, 1),
        "n4096_gflops": round(flops2 / r2.average_time_ns, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
