"""2D FFT 4096x4096 perf + accuracy artifact (BASELINE config 3).

Round-2 verdict item 3a: fft2_fused existed and was CPU-tested but no TPU
timing or accuracy artifact for any 2D transform was committed.  This runs
the config-3 shape (4096 x 4096) through the production fftn path (two
fused Pallas passes, transposes absorbed into block specs —
ops/four_step_pallas.fft2_fused), checks it against fp64 numpy.fft.fft2 at
the reference gate, and chain-measures the time (the transform is
layout-stationary: (B, H, W) -> (B, H, W)).

FLOP convention: 5*H*W*(log2 H + log2 W) per 2D transform.

Usage: python benchmarks/exp_fft2_perf.py --h 4096 --w 4096 --batch 1
Writes results/fft2_perf.dat(.json).
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=4096)
    ap.add_argument("--w", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--out", default="results/fft2_perf.dat")
    args = ap.parse_args()

    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.testing import deviation
    from tensorfft_tpu.testing.timer import chain_measure

    h, w, b = args.h, args.w, args.batch
    from tensorfft_tpu.plan import Precision

    storage = Precision(args.precision).storage_dtype

    rng = np.random.default_rng(0)
    re64 = rng.standard_normal((b, h, w))
    im64 = rng.standard_normal((b, h, w))
    re = jnp.asarray(re64, storage)
    im = jnp.asarray(im64, storage)

    # Accuracy vs fp64 oracle (forward scaling 1/(H*W)).
    o_re, o_im = tfft.fftn_split(re, im, axes=(1, 2),
                                 precision=args.precision)
    want = np.fft.fft2(re64 + 1j * im64, axes=(1, 2)) / (h * w)
    got = (np.asarray(o_re, np.float64) + 1j * np.asarray(o_im, np.float64))
    d = deviation((got.real, got.imag), (want.real, want.imag))

    # Perf: layout-stationary chain of the forward 2D transform.
    def step(a, c):
        rr, ii = tfft.fftn_split(a, c, axes=(1, 2), precision=args.precision)
        return rr.astype(a.dtype), ii.astype(c.dtype)

    r = chain_measure(step, (re, im))
    t_us = r.average_time_ns / 1e3
    flops = 5.0 * h * w * (np.log2(h) + np.log2(w)) * b
    # Two fused passes = two HBM read+write rounds of both planes.
    hbm_bytes = 2 * 2 * 2 * b * h * w * np.dtype(
        np.float32 if args.precision != "bfloat16" else np.float16).itemsize
    row = {
        "h": h, "w": w, "batch": b, "precision": args.precision,
        "time_us": round(t_us, 1),
        "sigma_us": round(r.std_deviation_ns / 1e3, 1),
        "gflops": round(flops / r.average_time_ns, 1),
        "hbm_floor_us_819GBs": round(hbm_bytes / 819e9 * 1e6, 1),
        "avg_dev": d.average, "sigma_dev": d.sigma, "max_dev": d.maximum,
        "gate": bool(d.passes_reference_gate()),
    }
    print(json.dumps(row), flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        f.write("# h w batch time_us gflops avg_dev sigma_dev max_dev\n")
        f.write(f"{h} {w} {b} {row['time_us']} {row['gflops']} "
                f"{d.average:.4e} {d.sigma:.4e} {d.maximum:.4e}\n")
    Path(str(out) + ".json").write_text(json.dumps(row, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
