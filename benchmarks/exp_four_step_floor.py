"""Per-pass floor attribution for the four-step range (round-5, verdict 4).

The 2^17..2^20 challenge retunes test whether a better STRUCTURE exists; this
experiment decides whether the ~2.0-2.2 TFLOP/s plateau is the two-pass bound
binding, by decomposing the composed production step into decision-grade
per-pass costs at the cached incumbent plan of each length:

  copy  — aliased passthrough Pallas copy on the (b, n) planes (read + cast
          + write = ONE HBM round trip; twice this is the two-pass floor)
  k1    — column pass alone: fwd K1 under split (n1, n2) composed with the
          swapped-split inverse's K1 (layout-stationary, divisor 2; uses the
          four_step_fft(passes="k1") measurement knob)
  k2    — row pass alone, same composition (passes="k2": the raw input
          stands in for the intermediate — garbage values, identical
          shapes/dataflow)
  both  — the production composed step (tuning.tuner.chain_step_for_plan)

If k1 + k2 ≈ both, the passes are additive (no inter-pass relayout artifact
— the round-1 composed-chain inflation) and the attribution is
  both = 2 x copy_floor x (per-pass in-kernel inefficiency),
the same in-kernel decomposition the fused kernel's ledger used
(results/RESULTS.md R4-S16).  Reference anchor: ComputeFFT.h:89-120 — the
per-stage global-memory round trips the four-step amortizes into two passes.

Usage: python benchmarks/exp_four_step_floor.py --n 131072 [--batch B]
Prints one JSON line per length (plus a fresh-interpreter note: run one
length per process on the relay).
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 17)
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 2^24 total elements")
    ap.add_argument("--precision", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import four_step_call_kwargs
    from tensorfft_tpu.ops.four_step_pallas import four_step_fft
    from tensorfft_tpu.testing.timer import chain_compare
    from tensorfft_tpu.tuning.tuner import chain_step_for_plan

    n = args.n
    b = args.batch or max(1, (1 << 24) // n)
    storage = tfft.Precision(args.precision).storage_dtype
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((b, n)), storage)
    im = jnp.asarray(rng.standard_normal((b, n)), storage)

    plan = tfft.create_plan(n, precision=args.precision, tuning="auto",
                            batch_hint=b)
    if plan.four_step_split is None:
        raise SystemExit(f"N={n} resolves to a fused plan; nothing to do")
    n1, n2 = plan.four_step_split

    # The swapped-split inverse whose K1 reads the forward output's physical
    # layout (exactly chain_step_for_plan's layout-stationary composition).
    inv_plan = tfft.create_plan(
        n, precision=args.precision, strategy="four_step",
        lane_tile=plan.lane_tile,
        tuning={
            "four_step_split": (n2, n1),
            "col_radices": plan.row_radices,
            "row_radices": plan.col_radices,
            **({"grouped": True} if plan.grouped else {}),
            **({"engine": plan.engine} if plan.engine != "stacked" else {}),
            **({"k1_tile": plan.k1_tile} if plan.k1_tile != 128 else {}),
            **({"state_dtype": plan.state_dtype}
               if plan.state_dtype != "float32" else {}),
            **({"complex_mult": plan.complex_mult}
               if plan.complex_mult != "block" else {}),
        },
    )
    kw_f = four_step_call_kwargs(plan, True)
    kw_i = four_step_call_kwargs(inv_plan, False)

    def pass_step(which):
        def step(a, c):
            a, c = four_step_fft(a, c, **kw_f, passes=which)
            return four_step_fft(a, c, **kw_i, passes=which)
        return jax.jit(step)

    # Aliased passthrough copy floor on the same (b, n) planes: one read +
    # f32 cast + write per plane (the fused ledger's floor definition).
    lane_block = 8192
    while n % lane_block:
        lane_block //= 2

    def copy_kernel(re_ref, im_ref, o_re, o_im):
        o_re[:] = re_ref[:].astype(jnp.float32).astype(o_re.dtype)
        o_im[:] = im_ref[:].astype(jnp.float32).astype(o_im.dtype)

    spec = pl.BlockSpec((b, lane_block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    copy_step = jax.jit(lambda a, c: pl.pallas_call(
        copy_kernel,
        grid=(n // lane_block,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((b, n), storage),
                   jax.ShapeDtypeStruct((b, n), storage)),
        input_output_aliases={0: 0, 1: 1},
    )(a, c))

    step_both, div_both = chain_step_for_plan(plan)
    variants = [
        ("copy", copy_step, 1),
        ("k1", pass_step("k1"), 2),
        ("k2", pass_step("k2"), 2),
    ]
    row = {"n": n, "batch": b, "split": [n1, n2],
           "plan": plan.resolve_strategy().value}
    for name, step, div in variants:
        r_both, r_v = chain_compare(step_both, step, (re, im))
        t_both = r_both.average_time_ns / div_both / 1e3
        t_v = r_v.average_time_ns / div / 1e3
        row.setdefault("both_us", []).append(round(t_both, 1))
        row[f"{name}_us"] = round(t_v, 1)
    both_med = float(np.median(row["both_us"]))
    row["both_us"] = round(both_med, 1)
    row["additivity"] = round((row["k1_us"] + row["k2_us"]) / both_med, 3)
    row["two_pass_floor_us"] = round(2 * row["copy_us"], 1)
    row["vs_two_pass_floor"] = round(both_med / (2 * row["copy_us"]), 3)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
