"""R2C/C2R perf + accuracy artifact at N=2^20 (BASELINE config 4).

Round-2 verdict item 3b: the rfft untangle step had never been measured on
TPU (and its original jnp.take formulation was a lane-dim gather, the
classic TPU slow path — since replaced by jnp.flip reverses, rfft.py).

Measurement: the R2C/C2R ROUNDTRIP (config 4's own target) chain_compare'd
against the bare C2C fwd+inv roundtrip of the half-length complex transform
it wraps, on identical (B, N)-real inputs — both steps are (B, N) -> (B, N),
so the interleaved comparison isolates exactly the pack/untangle overhead.

Accuracy: roundtrip max|x' - x| and forward vs numpy.fft.rfft (fp64), at
the reference gate thresholds.

Usage: python benchmarks/exp_rfft_perf.py --n 1048576 --batch 16
Writes results/rfft_perf.dat(.json).
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--out", default="results/rfft_perf.dat")
    args = ap.parse_args()

    import jax.numpy as jnp

    import tensorfft_tpu as tfft
    from tensorfft_tpu.fft import _fft_split_jit
    from tensorfft_tpu.rfft import irfft_split, rfft_split
    from tensorfft_tpu.testing.timer import chain_compare
    from tensorfft_tpu.testing import deviation

    n, b = args.n, args.batch
    m = n // 2
    plan = tfft.create_plan(m, precision=args.precision, tuning="auto",
                            batch_hint=b)
    storage = plan.precision.storage_dtype

    rng = np.random.default_rng(0)
    x64 = rng.standard_normal((b, n))
    x = jnp.asarray(x64, storage)

    # Accuracy first (one pass, fp64 oracle).
    f_re, f_im = rfft_split(x, plan)
    want = np.fft.rfft(x64, axis=-1) / n
    got = np.asarray(f_re, np.float64) + 1j * np.asarray(f_im, np.float64)
    d = deviation((got.real, got.imag), (want.real, want.imag))
    x_back = irfft_split(f_re, f_im, plan)
    rt_max = float(np.max(np.abs(np.asarray(x_back, np.float64) - x64)))

    # Perf: R2C/C2R roundtrip vs bare C2C roundtrip, identical signature.
    def rfft_roundtrip(xx):
        fr, fi = rfft_split(xx, plan)
        return (irfft_split(fr, fi, plan).astype(xx.dtype),)

    def c2c_roundtrip(xx):
        # Pack/interleave via the same Pallas kernels the rfft arm uses
        # (on TPU), so the arms differ ONLY by untangle+retangle — the
        # round-3 version used the XLA pack here, which (being ~2.9 ms of
        # structural ops itself) hid untangle cost inside a bloated base.
        import jax

        if jax.default_backend() == "tpu":
            from tensorfft_tpu.ops import rfft_pallas
            zr, zi = rfft_pallas.pack_split(xx)
            fr, fi = _fft_split_jit(zr, zi, plan, True)
            br, bi = _fft_split_jit(fr, fi, plan, False)
            return (rfft_pallas.interleave_split(br, bi).astype(xx.dtype),)
        from tensorfft_tpu.rfft import _deinterleave, _interleave
        zr, zi = _deinterleave(xx)
        fr, fi = _fft_split_jit(zr, zi, plan, True)
        br, bi = _fft_split_jit(fr, fi, plan, False)
        return (_interleave(br, bi).astype(xx.dtype),)

    r_rfft, r_c2c = chain_compare(rfft_roundtrip, c2c_roundtrip, (x,))
    t_rfft = r_rfft.average_time_ns
    t_c2c = r_c2c.average_time_ns
    overhead = t_rfft / t_c2c - 1.0
    # 5 N log2 N real-FFT FLOP convention (half the C2C of length N), per
    # roundtrip = 2 transforms.
    flops = 2 * 2.5 * n * float(np.log2(n)) * b
    row = {
        "n": n, "batch": b, "precision": args.precision,
        "m_c2c": m, "plan_strategy": plan.resolve_strategy().value,
        "roundtrip_us": round(t_rfft / 1e3, 1),
        "c2c_roundtrip_us": round(t_c2c / 1e3, 1),
        "untangle_overhead_pct": round(100 * overhead, 1),
        "gflops_roundtrip": round(flops / t_rfft, 1),
        "fwd_avg_dev": d.average, "fwd_sigma_dev": d.sigma,
        "fwd_max_dev": d.maximum,
        "roundtrip_max_err": rt_max,
        "gate": bool(d.passes_reference_gate()),
    }
    print(json.dumps(row), flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        f.write("# n batch roundtrip_us c2c_roundtrip_us overhead_pct "
                "fwd_avg_dev roundtrip_max_err\n")
        f.write(f"{n} {b} {row['roundtrip_us']} {row['c2c_roundtrip_us']} "
                f"{row['untangle_overhead_pct']} {row['fwd_avg_dev']:.4e} "
                f"{row['roundtrip_max_err']:.4e}\n")
    Path(str(out) + ".json").write_text(json.dumps(row, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
