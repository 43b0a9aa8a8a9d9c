"""Diagnose WHY single-pass fused configs fail past n=16384 on the TPU.

Every fused challenger at n=32768/65536 in the S2 structural sweeps recorded
``inf`` (results/tuner_data_{32768,65536}.dat) even though
``plan_works_on_device`` passes them and the CPU trace is clean — so the
failure is Mosaic-side (scoped-VMEM rejection or another compile error the
tuner's skip-on-exception path swallows, tuner.py:472-474).  This probe runs
ONE config per process (Mosaic stalls must cost one attempt, not a sweep),
prints the exact exception, and — when the config compiles — chain-measures
it against the four-step incumbent's cached time.

A single-pass fused win at 2^15..2^17 would halve HBM traffic vs four-step
(one read+write round instead of two) — the remaining lever on the round-2
verdict's open item 2 (>=2.5 TFLOP/s at mid-N).  Reference anchor: the
whole-transform fusion idea is TensorFFT4096.cu:296-359 taken past its
32 KiB-smem ceiling using the v5e's 128 MiB VMEM.

Usage (one config):
  python benchmarks/exp_fused_midn_probe.py --n 32768 --radices 32,32,32 \
      --state-dtype bfloat16 --vmem-mib 100
"""
import argparse
import json
import sys
import traceback
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--radices", required=True,
                    help="comma-separated, e.g. 32,32,32")
    ap.add_argument("--state-dtype", default="float32")
    ap.add_argument("--vmem-mib", type=int, default=100,
                    help="scoped-VMEM request (module default 100)")
    ap.add_argument("--batch-elems", type=int, default=1 << 24)
    ap.add_argument("--kloop-width", type=int, default=0,
                    help="kloop lane-panel width override (0 = default)")
    ap.add_argument("--lane-tile", type=int, default=128)
    ap.add_argument("--measure", action="store_true",
                    help="chain-measure when the config compiles")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tensorfft_tpu.fft import stage_scales
    from tensorfft_tpu.ops import fused_pallas

    # The kernel reads the limit from its module global at trace time, so
    # patching here sizes this probe's scoped-VMEM request.
    fused_pallas.KERNEL_VMEM_LIMIT_BYTES = args.vmem_mib * 2**20

    n = args.n
    radices = tuple(int(r) for r in args.radices.split(","))
    assert int(np.prod(radices)) == n, (radices, n)
    batch = max(1, args.batch_elems // n)
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((n, batch)), jnp.bfloat16)
    im = jnp.asarray(rng.standard_normal((n, batch)), jnp.bfloat16)
    scales = stage_scales(radices, "forward", True)

    kw = {}
    if args.kloop_width:
        kw["kloop_width"] = args.kloop_width
    run = lambda a, b: fused_pallas.fused_fft(
        a, b, radices=radices, scales=scales, sign=-1, algorithm="bf16",
        interpret=False, state_dtype=args.state_dtype,
        lane_tile=args.lane_tile, **kw)

    result = {"n": n, "radices": list(radices),
              "state_dtype": args.state_dtype, "vmem_mib": args.vmem_mib,
              "batch": batch, "lane_tile": args.lane_tile,
              "kloop_width": args.kloop_width or "default"}
    try:
        o_re, o_im = run(re, im)
        o_re.block_until_ready()
    except Exception as e:
        msg = f"{type(e).__name__}: {e}"
        result["status"] = "COMPILE/RUN FAIL"
        result["error"] = msg[:600]
        print(json.dumps(result))
        traceback.print_exc(limit=3, file=sys.stderr)
        return 0  # diagnosis delivered

    # sanity: one column against the fp64 oracle
    want = np.fft.fft(np.asarray(re[:, 0], np.float64)
                      + 1j * np.asarray(im[:, 0], np.float64)) / n
    got = (np.asarray(o_re[:, 0], np.float64)
           + 1j * np.asarray(o_im[:, 0], np.float64))
    result["max_dev"] = float(np.abs(got - want).max())
    result["status"] = "ok"

    if args.measure:
        from tensorfft_tpu.testing.timer import chain_measure

        r = chain_measure(run, (re, im))
        t_us = r.average_time_ns / 1e3
        flops = 5.0 * n * np.log2(n) * batch
        result["time_us"] = round(t_us, 2)
        result["sigma_us"] = round(r.std_deviation_ns / 1e3, 2)
        result["gflops"] = round(flops / max(r.average_time_ns, 1e-9), 1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
