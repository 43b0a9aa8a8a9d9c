"""Infrastructure-level checks: bench smoke, driver entry points, twiddle
table accuracy (TwiddleTest.cu analog), device specs."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_bench_smoke_emits_json():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--smoke"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "batched_1d_fft_throughput"
    assert rec["value"] > 0
    assert "vs_baseline" in rec and rec["unit"] == "GFLOP/s"


def test_graft_entry_compiles():
    import jax

    sys.path.insert(0, str(REPO))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (256, 4096)


def test_twiddle_table_accuracy():
    """TwiddleTest.cu analog: the reference compared cos/cosf/hcos twiddle
    accuracy on device (TwiddleTest.cu:9-125).  Here: the fp32-rounded tables
    must be within 1 ulp of the fp64 values, and the bf16 block matrices
    within bf16 resolution."""
    from tensorfft_tpu import dft

    re64, im64 = dft._dft_matrix_f64(64, -1)
    re32, im32 = dft.dft_matrix(64, dtype=np.float32)
    assert np.abs(re32.astype(np.float64) - re64).max() < 6e-8
    assert np.abs(im32.astype(np.float64) - im64).max() < 6e-8
    w32 = dft.stage_twiddle(64, 512, dtype=np.float32)
    w64 = dft._stage_twiddle_f64(64, 512, -1)
    assert np.abs(w32[0].astype(np.float64) - w64[0]).max() < 6e-8


def test_device_spec_and_roofline():
    from tensorfft_tpu.utils import device_spec, fft_roofline_seconds

    spec = device_spec()
    assert spec.platform in ("cpu", "tpu")
    t = fft_roofline_seconds(4096, 4096, (64, 64), 2)
    assert t > 0
    # MXU-bound for huge radix vs HBM-bound for tiny ones
    t_small = fft_roofline_seconds(4096, 4096, (2,) * 12, 2)
    assert t_small >= t or spec.platform == "cpu"


def test_plan_auto_tuning_lookup():
    import tensorfft_tpu as tfft

    # On CPU there is no cache entry: "auto" must degrade to defaults.
    plan = tfft.create_plan(4096, tuning="auto")
    assert plan.fft_length == 4096


def test_profile_trace_graceful():
    import jax.numpy as jnp

    from tensorfft_tpu.testing.profiling import annotate, profile_trace

    with profile_trace("/tmp/tfft_test_trace", label="unit"):
        x = jnp.ones(8) + 1
        x.block_until_ready()

    @annotate("unit-fn")
    def f(v):
        return v * 2

    assert float(f(jnp.float32(2.0))) == 4.0


def test_write_log(tmp_path):
    from tensorfft_tpu.testing.io import write_log

    p = tmp_path / "log.txt"
    write_log(p, ["a", "b\n"])
    write_log(p, ["c"])
    assert p.read_text() == "a\nb\nc\n"


def test_overlap_perf_model():
    # ICI roofline + pipelining model (round-1 verdict #10): BASELINE
    # config 5 is 512^3 pencil-decomposed 3D FFT on v5p-16.  The model must
    # (a) predict comm in the ICI-roofline ballpark, (b) recommend overlap
    # when comm and compute are comparable, and (c) recommend none when one
    # side dominates by orders of magnitude.
    from tensorfft_tpu.utils.device import (
        DeviceSpec,
        all_to_all_seconds,
        overlap_estimate,
    )

    v5p = DeviceSpec("tpu", "v5p", 459e12, 2765e9, 64 * 2**20,
                     ici_bandwidth=540e9)
    # 512^3 split-complex f32: 8 bytes/point, 16 chips.
    local_bytes = (512 ** 3 // 16) * 8
    t_comm = all_to_all_seconds(local_bytes, 16, v5p)
    assert 100e-6 < t_comm < 250e-6  # ~145 us at 80% of 540 GB/s egress

    # Balanced comm/compute: overlap should win substantially.
    est = overlap_estimate(local_bytes, 16, compute_seconds=t_comm, spec=v5p)
    assert est.chunks > 1
    assert est.speedup > 1.4  # 2-stage fill bound caps balanced overlap ~1.45x

    # Compute-dominated (tiny message): overlap can't help; chunk latency
    # makes c=1 optimal or near-optimal.
    est2 = overlap_estimate(1 << 10, 16, compute_seconds=1e-3, spec=v5p)
    assert est2.speedup < 1.05

    # Single device: no comm at all.
    assert all_to_all_seconds(local_bytes, 1, v5p) == 0.0

    # The committed config-5 prediction band (results/RESULTS.md): across
    # ICI efficiency 0.6-0.9 the model keeps recommending c=4 and the
    # per-phase speedup stays in ~1.3-1.4x — the acceptance envelope for a
    # future real v5p-16 run.
    compute = 130e-6
    for eff, comm_lo, comm_hi in [(0.9, 120e-6, 140e-6),
                                  (0.8, 135e-6, 155e-6),
                                  (0.6, 180e-6, 210e-6)]:
        tc = all_to_all_seconds(local_bytes, 16, v5p, efficiency=eff)
        assert comm_lo < tc < comm_hi, (eff, tc)
        est_e = overlap_estimate(local_bytes, 16, compute_seconds=compute,
                                 spec=v5p, efficiency=eff)
        assert est_e.chunks == 4, (eff, est_e)
        assert 1.25 < est_e.speedup < 1.45, (eff, est_e.speedup)


def test_chain_span_calibration():
    # Auto-calibration targets ~target_seconds of device work per chain and
    # respects floors/caps; explicit spans disable it (back-compat for smoke
    # modes and CI).  Relay jitter on a 32-iteration span was the round-1/2
    # source of 16-70% cross-window drift; calibrated spans measure the same
    # config at <1% sigma on v5e.
    from tensorfft_tpu.testing.timer import _calibrate_spans, chain_measure

    fake_1us = lambda k: k * 1000.0  # perfect 1 us/iter chain
    # The warm high chain is promoted to the low arm (one extra compile).
    assert _calibrate_spans(fake_1us, 4, 36, 0.0005) == (36, 500)
    # Huge target hits the iteration cap.
    assert _calibrate_spans(fake_1us, 4, 36, 100.0) == (36, 8192)
    # Already-long-enough steps keep the floor spans.
    fake_10ms = lambda k: k * 1e7
    assert _calibrate_spans(fake_10ms, 4, 36, 0.2) == (4, 36)

    import jax
    import jax.numpy as jnp

    x = jnp.ones((64, 64), jnp.float32)
    step = jax.jit(lambda a: (a * 1.000001,))
    r = chain_measure(step, (x,), reps=2, target_seconds=0.02)
    assert r.average_time_ns > 0 and r.samples == 2
