"""Round-3 diagnostic: attribute four-step time per pass and per engine.

The large-N four-step range runs 1.6-2.4x over its two-pass HBM floor (cache
2^22..2^24: 1333-1955 us vs ~816), and the fused-kernel stage breakdown
(exp_stage_breakdown.py) fingered the last-stage sublane interleave — which
the K2 row pass pays per block at n2 = 4096..8192, and K1 at n1 up to 16384.
This measures, chain_compare'd (decision-grade, interleaved):

the composed layout-stationary four-step step (fwd + swapped-inverse,
divisor 2 — tuning.tuner.chain_step_for_plan) under engine variants against
the cached incumbent: gridslice / gridslice16 (deferred interleave on both
passes), k1_tile=256 (wide K2 lane panels), and bf16 state combinations.

Usage: python benchmarks/exp_four_step_engines.py --n 16777216 --batch 1
Prints one JSON line per comparison; reference anchor ComputeFFT.h:89-120
(the per-stage global-memory round trips this path amortizes away).
"""
import argparse
import json

import numpy as np

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 24)
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 2^24 elements total")
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--variants", type=str, default="",
                    help="comma list of engine[:knob] variants; default all")
    args = ap.parse_args()

    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.testing.timer import chain_compare
    from tensorfft_tpu.tuning.tuner import chain_step_for_plan

    n = args.n
    b = args.batch or max(1, (1 << 24) // n)
    storage = tfft.Precision(args.precision).storage_dtype
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((b, n)), storage)
    im = jnp.asarray(rng.standard_normal((b, n)), storage)

    base = tfft.create_plan(n, precision=args.precision, tuning="auto",
                            batch_hint=b)
    if base.four_step_split is None:
        raise SystemExit(f"N={n} resolves to a fused plan; nothing to do")
    # Reconstruct the FULL cached incumbent (engine/k1_tile/state_dtype/
    # complex_mult included) so "incumbent_us" measures what production
    # actually runs, not a stripped twin.
    base_tuning = {
        "strategy": "four_step",
        "four_step_split": base.four_step_split,
        "col_radices": base.col_radices,
        "row_radices": base.row_radices,
        **({"grouped": True} if base.grouped else {}),
        **({"engine": base.engine} if base.engine != "stacked" else {}),
        **({"k1_tile": base.k1_tile} if base.k1_tile != 128 else {}),
        **({"state_dtype": base.state_dtype}
           if base.state_dtype != "float32" else {}),
        **({"complex_mult": base.complex_mult}
           if base.complex_mult != "block" else {}),
    }

    variants = [
        ("gridslice", {"engine": "gridslice"}),
        ("gridslice16", {"engine": "gridslice16"}),
        ("gs16_k256", {"engine": "gridslice16", "k1_tile": 256}),
        ("gs16_bf16", {"engine": "gridslice16", "state_dtype": "bfloat16"}),
        ("k256", {"k1_tile": 256}),
        ("stacked", {"engine": "stacked", "k1_tile": 128}),
    ]
    if args.variants:
        keep = set(args.variants.split(","))
        variants = [v for v in variants if v[0] in keep]

    inc_plan = tfft.create_plan(n, precision=args.precision,
                                tuning=base_tuning)
    step_inc, div_inc = chain_step_for_plan(inc_plan)
    for name, extra in variants:
        if tfft.create_plan(
                n, precision=args.precision,
                tuning={**base_tuning, **extra}) == inc_plan:
            continue  # variant identical to the incumbent — nothing to learn
        try:
            plan_v = tfft.create_plan(n, precision=args.precision,
                                      tuning={**base_tuning, **extra})
            step_v, div_v = chain_step_for_plan(plan_v)
            r_inc, r_v = chain_compare(step_inc, step_v, (re, im))
        except Exception as e:  # compile failure is a result, not a crash
            print(json.dumps({"n": n, "batch": b, "variant": name,
                              "error": str(e)[:200]}), flush=True)
            continue
        t_inc = r_inc.average_time_ns / div_inc / 1e3
        t_v = r_v.average_time_ns / div_v / 1e3
        print(json.dumps({
            "n": n, "batch": b, "variant": name,
            "split": list(inc_plan.four_step_split),
            "incumbent_us": round(t_inc, 1), "variant_us": round(t_v, 1),
            "speedup": round(t_inc / t_v, 3) if t_v else None,
        }), flush=True)


if __name__ == "__main__":
    main()
