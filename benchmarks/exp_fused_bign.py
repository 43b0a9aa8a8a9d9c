"""Probe: whole-transform fused kernel PAST the max_fused_length cap.

Four-step at 2^15 (553 us, batch=128) runs ~7x over its one-pass HBM floor;
a single fused VMEM pass at N=32768/65536 is now plausible with bf16 state
(halves the resident state) and the gridslice store path (the output goes
through per-slice scratch instead of a second stacked copy).  This measures
ONE explicit fused config against the cached four-step incumbent via an
interleaved chain_compare.

Mosaic is known to STALL (not raise) at VMEM scale — run one config per
process under timeout (CLAUDE.md tunnel discipline):
  python benchmarks/exp_fused_bign.py --n 32768 --radices 128,256 \
      --engine gridslice --state-dtype bfloat16
Appends a JSON line to results/fused_bign.jsonl.
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--radices", default="128,256")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 2^22 elements / n (tuner convention)")
    ap.add_argument("--engine", default="gridslice")
    ap.add_argument("--state-dtype", default="bfloat16")
    ap.add_argument("--grouped", action="store_true")
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--out", default="results/fused_bign.jsonl")
    args = ap.parse_args()

    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.testing.timer import chain_compare
    from tensorfft_tpu.tuning.tuner import chain_step_for_plan

    n = args.n
    b = args.batch or max(1, (1 << 22) // n)
    radices = tuple(int(r) for r in args.radices.split(","))
    tuning = {
        "strategy": "fused", "radices": radices,
        "max_fused_length": n,
        **({"grouped": True} if args.grouped else {}),
        **({"state_dtype": args.state_dtype}
           if args.state_dtype != "float32" else {}),
        **({"engine": args.engine} if args.engine != "stacked" else {}),
    }
    cand = tfft.create_plan(n, precision=args.precision, tuning=tuning)
    inc = tfft.create_plan(n, precision=args.precision, tuning="auto",
                           batch_hint=b)

    rng = np.random.default_rng(0)
    storage = cand.precision.storage_dtype
    re = jnp.asarray(rng.standard_normal((b, n)), storage)
    im = jnp.asarray(rng.standard_normal((b, n)), storage)

    step_a, div_a = chain_step_for_plan(inc)
    step_b, div_b = chain_step_for_plan(cand)
    r_a, r_b = chain_compare(step_a, step_b, (re, im))
    t_a = r_a.average_time_ns / div_a / 1e3
    t_b = r_b.average_time_ns / div_b / 1e3
    flops = 5.0 * n * np.log2(n) * b
    row = {
        "n": n, "batch": b, "precision": args.precision,
        "incumbent": {"strategy": inc.resolve_strategy().value,
                      "split": inc.four_step_split,
                      "time_us": round(t_a, 2),
                      "gflops": round(flops / (t_a * 1e3), 1)},
        "fused": {"radices": list(radices), "engine": args.engine,
                  "state_dtype": args.state_dtype, "grouped": args.grouped,
                  "time_us": round(t_b, 2),
                  "gflops": round(flops / (t_b * 1e3), 1)},
        "winner": "fused" if t_b < t_a else "incumbent",
    }
    print(json.dumps(row))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
