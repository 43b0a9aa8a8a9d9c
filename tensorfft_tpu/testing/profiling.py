"""Profiler integration.

The reference's only profiling support is wall-clock timers plus dedicated
binaries to aim nvprof/nsight at (CuFFTExample.cu:1 "Used to profile").  The
TPU-native equivalents are jax.profiler traces (viewable in XProf/perfetto /
TensorBoard) wrapped here with graceful degradation: remote-relay backends may
not support on-device tracing, in which case the context manager is a no-op
that still reports wall time.
"""
from __future__ import annotations

import contextlib
import time

__all__ = ["profile_trace", "annotate"]


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/tensorfft_trace", label: str = "tfft"):
    """Capture a jax.profiler trace around the body if the backend allows.

    Usage:
        with profile_trace("/tmp/trace"):
            out = fft_split(re, im, plan)
            jax.block_until_ready(out)
    """
    import jax

    t0 = time.perf_counter_ns()
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # relay backends may reject tracing
        print(f"[profile_trace] tracing unavailable ({e}); timing only")
    try:
        with jax.profiler.TraceAnnotation(label) if started else contextlib.nullcontext():
            yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"[profile_trace] trace written to {log_dir}")
            except Exception as e:
                print(f"[profile_trace] stop_trace failed: {e}")
        dt = (time.perf_counter_ns() - t0) / 1e6
        print(f"[profile_trace] {label}: {dt:.3f} ms wall")


def annotate(label: str):
    """TraceAnnotation decorator for hot functions (no-op off-trace)."""
    import functools

    import jax

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with jax.profiler.TraceAnnotation(label):
                return fn(*args, **kwargs)

        return wrapped

    return deco
