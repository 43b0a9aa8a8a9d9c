"""A/B: fp32 vs bf16 inter-stage state in the fused kernel, plus accuracy.

Also re-checks batch_major (now with the cheaper storage-dtype transpose)
against transform_major at the same configs.
"""
import argparse
import json

import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ns", type=int, nargs="*", default=[4096, 16384])
    args = ap.parse_args()

    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import _fft_split_jit
    from tensorfft_tpu.testing import deviation, fft_oracle, make_test_signal
    from tensorfft_tpu.testing.timer import chain_compare

    rng = np.random.default_rng(0)
    for n in args.ns:
        plan32 = tfft.create_plan(n, precision="bfloat16", tuning="auto")
        entry = {"state_dtype": "bfloat16"}
        plan16 = tfft.create_plan(
            n, precision="bfloat16",
            tuning={**({"radices": plan32.radices} if plan32.radices else {}),
                    "strategy": plan32.resolve_strategy().value,
                    "lane_tile": plan32.lane_tile,
                    **({"grouped": True} if plan32.grouped else {}),
                    **({"four_step_split": plan32.four_step_split}
                       if plan32.four_step_split else {}),
                    **entry},
        )
        re = jnp.asarray(rng.standard_normal((args.batch, n)), jnp.bfloat16)
        im = jnp.asarray(rng.standard_normal((args.batch, n)), jnp.bfloat16)

        a = lambda x, y: _fft_split_jit(x, y, plan32, True)
        b = lambda x, y: _fft_split_jit(x, y, plan16, True)
        ra, rb = chain_compare(a, b, (re, im))
        flops = 5.0 * n * float(np.log2(n)) * args.batch

        # Accuracy of the bf16-state path vs the fp64 oracle.
        sre, sim = make_test_signal(n, 42, 1764)
        g = _fft_split_jit(jnp.asarray(sre, jnp.bfloat16),
                           jnp.asarray(sim, jnp.bfloat16), plan16, True)
        d = deviation(
            (np.asarray(g[0], np.float64), np.asarray(g[1], np.float64)),
            fft_oracle(sre, sim),
        )
        print(json.dumps({
            "n": n, "batch": args.batch,
            "f32_state_us": round(ra.average_time_ns / 1e3, 1),
            "bf16_state_us": round(rb.average_time_ns / 1e3, 1),
            "f32_gflops": round(flops / ra.average_time_ns, 1),
            "bf16_gflops": round(flops / rb.average_time_ns, 1),
            "speedup": round(ra.average_time_ns / rb.average_time_ns, 3),
            "bf16_state_err": {"avg": float(d.average),
                               "sigma": float(d.sigma),
                               "max": float(d.maximum)},
            "gate": bool(d.passes_reference_gate()),
        }), flush=True)


if __name__ == "__main__":
    main()
