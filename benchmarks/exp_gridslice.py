"""A/B the gridslice engine against the tuned incumbent at one length.

Round-3 in-kernel lever: the stage breakdown attributed ~615 us of the
N=16384/b=4096 fused kernel to the LAST stage's K-way sublane interleave
(jnp.stack axis=2).  engine='gridslice' defers that interleave to the
output DMA — slices park contiguously in scratch and a second grid
dimension stores each to its strided (R, S, B) HBM block
(ops/fused_pallas.gridslice_kernel_body).  Reference anchor: the whole
point of TensorFFT4096.cu:296-359 is restructuring the store path so more
work rides one memory pass.

One length per process (tunnel-wedge discipline):
  python benchmarks/exp_gridslice.py --n 16384 --batch 4096
Appends a JSON line to results/gridslice_ab.jsonl.
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--out", default="results/gridslice_ab.jsonl")
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.ops.fused_pallas import gridslice_layout
    from tensorfft_tpu.testing.timer import chain_compare
    from tensorfft_tpu.tuning.tuner import chain_step_for_plan

    n, b = args.n, args.batch
    inc = tfft.create_plan(n, precision=args.precision, tuning="auto",
                           batch_hint=b)
    if inc.resolve_strategy().value != "fused":
        print(f"n={n}: incumbent strategy {inc.resolve_strategy().value}, "
              "gridslice is fused-only — skipping")
        return
    if gridslice_layout(inc.radices, inc.grouped) is None:
        print(f"n={n}: radices {inc.radices} unsupported by gridslice")
        return
    s_total = gridslice_layout(inc.radices, inc.grouped)

    rng = np.random.default_rng(0)
    storage = inc.precision.storage_dtype
    re = jnp.asarray(rng.standard_normal((b, n)), storage)
    im = jnp.asarray(rng.standard_normal((b, n)), storage)

    flops = 5.0 * n * np.log2(n) * b
    step_a, div_a = chain_step_for_plan(inc)
    row = {"n": n, "batch": b, "precision": args.precision,
           "radices": list(inc.radices), "incumbent_engine": inc.engine}
    engines = ["gridslice"] + (["gridslice16"] if s_total % 16 == 0 else [])
    if inc.engine in engines:
        # tuner already adopted a gridslice variant: A/B the others plus
        # the stacked twin so the committed artifact still shows the delta
        engines = [e for e in engines if e != inc.engine] + ["stacked"]
    best = (inc.engine, None)
    for eng in engines:
        cand = dataclasses.replace(inc, engine=eng)
        step_b, div_b = chain_step_for_plan(cand)
        r_a, r_b = chain_compare(step_a, step_b, (re, im))
        t_a = r_a.average_time_ns / div_a / 1e3
        t_b = r_b.average_time_ns / div_b / 1e3
        row["incumbent"] = {
            "time_us": round(t_a, 2),
            "sigma_us": round(r_a.std_deviation_ns / div_a / 1e3, 2),
            "gflops": round(flops / (t_a * 1e3), 1)}
        row[eng] = {
            "time_us": round(t_b, 2),
            "sigma_us": round(r_b.std_deviation_ns / div_b / 1e3, 2),
            "gflops": round(flops / (t_b * 1e3), 1)}
        if t_b < t_a and (best[1] is None or t_b < best[1]):
            best = (eng, t_b)
    row["winner"] = best[0]
    print(json.dumps(row))
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
