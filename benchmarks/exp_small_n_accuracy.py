"""Small-N bf16 accuracy decomposition (round-2 verdict item 5).

The N=256 bf16 conformance margin was 14% (avg dev 8.58e-4 vs the 1e-3
gate).  This experiment decomposes the deviation into its sources and
measures the compensated first stage (plan knob first_dot='bf16ax2': the
constant DFT matrix is split into hi+lo bf16 terms, two MXU products, so the
first stage — no twiddle error, dominant at small N — runs at ~fp32 matrix
accuracy while the data operand stays the exact bf16 storage).

Rows per length (accuracy-curve protocol: cutoff-256 sine superpositions,
seeds 42i/42*42i, avg over runs):
  input_q   oracle(bf16(x)) vs oracle(x)    — input storage quantization
  output_q  bf16(oracle(x)) vs oracle(x)    — output storage quantization
  storage   bf16(oracle(bf16(x))) vs oracle — both (the bf16-policy floor:
            no compute improvement can go below this)
  default   full pipeline, first_dot=default
  bf16ax2   full pipeline, first_dot=bf16ax2

Usage: python benchmarks/exp_small_n_accuracy.py [--tpu-perf]
--tpu-perf additionally chain_compares default vs bf16ax2 at batch=4096 to
bound the perf cost.  Writes results/small_n_accuracy.dat(.json).
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", type=str, default="256,512,1024")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--cutoff", type=int, default=256)
    ap.add_argument("--tpu-perf", action="store_true")
    ap.add_argument("--out", default="results/small_n_accuracy.dat")
    args = ap.parse_args()

    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.testing import deviation, fft_oracle, make_test_signal

    rows = []
    for n in (int(s) for s in args.lengths.split(",")):
        acc = {k: [] for k in
               ("input_q", "output_q", "storage", "default", "bf16ax2")}
        for i in range(args.runs):
            re, im = make_test_signal(n, 42 * (i + 1), 42 * 42 * (i + 1),
                                      cutoff=args.cutoff)
            reb = np.asarray(jnp.asarray(re, jnp.bfloat16), np.float64)
            imb = np.asarray(jnp.asarray(im, jnp.bfloat16), np.float64)
            o_exact = fft_oracle(re, im)
            o_quant = fft_oracle(reb, imb)

            def bf16_round(pair):
                return tuple(
                    np.asarray(jnp.asarray(p, jnp.bfloat16), np.float64)
                    for p in pair
                )

            acc["input_q"].append(deviation(o_quant, o_exact).average)
            acc["output_q"].append(
                deviation(bf16_round(o_exact), o_exact).average)
            acc["storage"].append(
                deviation(bf16_round(o_quant), o_exact).average)
            for fd in ("default", "bf16ax2"):
                plan = tfft.create_plan(n, tuning={"first_dot": fd})
                got = tfft.fft_split(re, im, plan)
                d = deviation(
                    (np.asarray(got[0], np.float64),
                     np.asarray(got[1], np.float64)),
                    o_exact,
                )
                acc[fd].append(d.average)
        row = {"fft_length": n}
        row.update({k: float(np.mean(v)) for k, v in acc.items()})
        row["improvement"] = row["default"] / row["bf16ax2"]
        row["storage_fraction_of_bf16ax2"] = row["storage"] / row["bf16ax2"]
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.tpu_perf:
        from tensorfft_tpu.testing.timer import chain_compare
        from tensorfft_tpu.fft import _fft_split_jit

        rng = np.random.default_rng(0)
        for n in (int(s) for s in args.lengths.split(",")):
            b = 4096
            re = jnp.asarray(rng.standard_normal((b, n)), jnp.bfloat16)
            im = jnp.asarray(rng.standard_normal((b, n)), jnp.bfloat16)
            p_def = tfft.create_plan(n, tuning={"first_dot": "default"})
            p_cmp = tfft.create_plan(n, tuning={"first_dot": "bf16ax2"})
            r_def, r_cmp = chain_compare(
                lambda a, c: _fft_split_jit(a, c, p_def, True),
                lambda a, c: _fft_split_jit(a, c, p_cmp, True),
                (re, im),
            )
            cost = r_cmp.average_time_ns / r_def.average_time_ns - 1.0
            perf = {"fft_length": n, "batch": b,
                    "default_us": round(r_def.average_time_ns / 1e3, 2),
                    "bf16ax2_us": round(r_cmp.average_time_ns / 1e3, 2),
                    "perf_cost_pct": round(100 * cost, 1)}
            for row in rows:
                if row["fft_length"] == n:
                    row["perf"] = perf
            print(json.dumps(perf), flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        f.write("# fft_length input_q output_q storage default bf16ax2 "
                "improvement\n")
        for r in rows:
            f.write(f"{r['fft_length']} {r['input_q']:.4e} "
                    f"{r['output_q']:.4e} {r['storage']:.4e} "
                    f"{r['default']:.4e} {r['bf16ax2']:.4e} "
                    f"{r['improvement']:.3f}\n")
    Path(str(out) + ".json").write_text(json.dumps(rows, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
