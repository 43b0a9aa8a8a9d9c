"""Wall-clock measurement utilities.

Mirror of the reference Timer.h (ScopeTimer/IntervallTimer over
std::chrono::high_resolution_clock, Timer.h:8-93) and the Benchmark
measurement loop (Bench.h:74-150): warmup iterations, then `samples` timed
runs of the compute path only, returning mean and sigma in nanoseconds.  The
reference brackets kernels with cudaDeviceSynchronize; the JAX analog is
jax.block_until_ready on the outputs.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Sequence

import numpy as np

__all__ = ["IntervalTimer", "ScopeTimer", "BenchResult", "measure"]


class IntervalTimer:
    """Reference IntervallTimer parity (Timer.h:44-93)."""

    def __init__(self):
        self.start()

    def start(self):
        self._t0 = time.perf_counter_ns()

    def get_time_in_nanoseconds(self) -> int:
        return time.perf_counter_ns() - self._t0

    def get_time_in_microseconds(self) -> float:
        return self.get_time_in_nanoseconds() / 1e3

    def get_time_in_milliseconds(self) -> float:
        return self.get_time_in_nanoseconds() / 1e6


class ScopeTimer:
    """Context manager printing elapsed time at scope exit (Timer.h:8-42)."""

    def __init__(self, label: str = "scope", unit: str = "ms"):
        self.label = label
        self.unit = unit

    def __enter__(self):
        self._timer = IntervalTimer()
        return self._timer

    def __exit__(self, *exc):
        ns = self._timer.get_time_in_nanoseconds()
        scale = {"ns": 1, "us": 1e3, "ms": 1e6, "s": 1e9}[self.unit]
        print(f"[{self.label}] {ns / scale:.3f} {self.unit}")
        return False


@dataclasses.dataclass(frozen=True)
class BenchResult:
    """Reference BenchUtil.h BenchResult parity (average + sigma, ns)."""

    average_time_ns: float
    std_deviation_ns: float
    samples: int

    @property
    def average_time_ms(self) -> float:
        return self.average_time_ns / 1e6


def measure(
    fn: Callable,
    args: Sequence = (),
    warmup: int = 5,
    samples: int = 100,
) -> BenchResult:
    """Time fn(*args) with block_until_ready bracketing (Bench.h:121-142 analog).

    The first call includes compilation; warmup runs are discarded.

    WARNING: on remote-relay TPU backends (axon), block_until_ready can
    resolve before device execution; use :func:`chain_measure` there.
    """
    import jax

    for _ in range(max(warmup, 1)):
        out = fn(*args)
        jax.block_until_ready(out)
    times = np.empty(samples, dtype=np.float64)
    for i in range(samples):
        t0 = time.perf_counter_ns()
        out = fn(*args)
        jax.block_until_ready(out)
        times[i] = time.perf_counter_ns() - t0
    return BenchResult(
        average_time_ns=float(times.mean()),
        std_deviation_ns=float(times.std()),
        samples=samples,
    )


def _calibrate_spans(
    timed: Callable,
    iters_low: int,
    iters_high: int,
    target_seconds: float,
    max_iters: int = 8192,
) -> tuple:
    """Scale the chain so it runs ~``target_seconds`` of device work.

    The slope method cancels *constant* dispatch/fetch latency, but the
    relay's per-call jitter (tens of ms) lands directly on the slope
    numerator: with the stock 32-iteration span and a ~250 us step that is a
    double-digit-percent error, measured as 16-48% sigma across windows.
    Stretching the span until the chain itself runs hundreds of ms drowns the
    jitter: the same configs then repeat at 0.1-0.4% sigma, and the probe
    rates match sustained hardware rooflines (v5e: 82% of HBM peak for a pure
    copy, 94% of bf16 matmul peak — measured with this exact calibration).
    """
    t_lo = timed(iters_low)
    t_hi = timed(iters_high)
    slope_ns = (t_hi - t_lo) / (iters_high - iters_low)
    if not slope_ns > 0:  # noisy first pair — fall back to the gross rate
        slope_ns = t_hi / iters_high
    k_hi = int(target_seconds * 1e9 / max(slope_ns, 1.0))
    k_hi = max(iters_high, min(k_hi, max_iters))
    if k_hi == iters_high:  # step already long enough — keep warm spans
        return iters_low, iters_high
    # Promote the already-compiled warm chain to the low arm so calibration
    # costs ONE extra compile, not two (TPU chain compiles run tens of
    # seconds; a fresh k_lo would double that for no precision gain — the
    # high chain dominates both the span and the pair's wall time).
    return iters_high, k_hi


def chain_measure(
    step: Callable,
    args: Sequence,
    iters_low: Optional[int] = None,
    iters_high: Optional[int] = None,
    reps: int = 5,
    target_seconds: float = 0.2,
) -> BenchResult:
    """Per-iteration device time of ``step`` via the chained-slope method.

    ``step(*args)`` must return a tuple with the same structure/shapes/dtypes
    as ``args`` (so it can be iterated).  We compile ``lax.fori_loop`` chains
    of two lengths ending in a tiny scalar fetch, take the best-of-``reps``
    wall time of each, and report the slope.  The scalar fetch forces real
    device execution and the slope cancels dispatch/fetch/tunnel latency —
    required on remote-relay backends where block_until_ready resolves before
    the device has executed (measured artifacts exceeded hardware rooflines by
    >100x).

    By default the chain length is auto-calibrated so each chain runs
    ~``target_seconds`` of device work (see :func:`_calibrate_spans` — the
    stock 32-iteration span leaves the slope exposed to relay jitter, the
    round-1/round-2 source of 16-70% cross-window drift).  Passing explicit
    ``iters_low``/``iters_high`` pins the spans and disables calibration.
    Validated on v5e at 94% of bf16 matmul peak / 82% of HBM bandwidth
    against plain jnp.dot / elementwise chains (sustained rates; sigma <1%).
    """
    fixed = iters_low is not None or iters_high is not None
    iters_low = 4 if iters_low is None else iters_low
    iters_high = 36 if iters_high is None else iters_high
    timed = _make_chain_timer(step, args)

    # compile + warm both chain lengths
    timed(iters_low)
    timed(iters_high)

    if not fixed and target_seconds:
        new_lo, new_hi = _calibrate_spans(timed, iters_low, iters_high,
                                          target_seconds)
        if (new_lo, new_hi) != (iters_low, iters_high):
            iters_low, iters_high = new_lo, new_hi
            timed(iters_low)  # compile + warm the calibrated lengths
            timed(iters_high)

    # Interleave low/high runs so slow drift of the backend (shared relay,
    # thermal state) cancels within each adjacent pair; report the median of
    # the per-pair slopes and retry pairs whose slope is non-positive (pure
    # noise).  A single (min-low, min-high) slope was observed to swing by
    # +-50% and even go negative under relay load.
    slopes = []
    attempts = 0
    while len(slopes) < reps and attempts < 3 * reps:
        attempts += 1
        t_low = timed(iters_low)
        t_high = timed(iters_high)
        slope = (t_high - t_low) / (iters_high - iters_low)
        if slope > 0:
            slopes.append(slope)
    if not slopes:
        slopes = [float("nan")]
    per_iter = float(np.median(slopes))
    sigma = float(np.std(slopes))
    return BenchResult(
        average_time_ns=per_iter,
        std_deviation_ns=sigma,
        samples=len(slopes),
    )


def _make_chain_timer(step: Callable, args: Sequence):
    """Compile a fori_loop chain of ``step`` and return timed(k) -> ns."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=0)
    def chain(k, *a):
        def body(_, carry):
            return tuple(step(*carry))

        out = jax.lax.fori_loop(0, k, body, tuple(a))
        leaves = jax.tree_util.tree_leaves(out)
        acc = jnp.float32(0)
        for leaf in leaves:
            flat = leaf.reshape(-1)
            acc = acc + jnp.sum(flat[:8].astype(jnp.float32))
        return acc

    def timed(k):
        t0 = time.perf_counter_ns()
        float(chain(k, *args))
        return time.perf_counter_ns() - t0

    return timed


def chain_compare(
    step_a: Callable,
    step_b: Callable,
    args: Sequence,
    iters_low: Optional[int] = None,
    iters_high: Optional[int] = None,
    reps: int = 7,
    target_seconds: float = 0.2,
) -> tuple:
    """Decision-grade A/B comparison of two step functions on one input.

    chain_measure's slope method cancels dispatch latency WITHIN one
    measurement, but two separate chain_measure calls sit in different load
    windows of the shared relay, which drifts by tens of percent — identical
    code has measured 40% apart across windows.  Here every round times A and
    B back-to-back (A_low, B_low, A_high, B_high), so the drift is common
    mode within a round; the median over rounds is reported for each.

    Spans are auto-calibrated to ~``target_seconds`` of device work per chain
    (sized by the slower arm) unless explicit ``iters_low``/``iters_high``
    pin them — see :func:`_calibrate_spans` for why.

    Returns (BenchResult_a, BenchResult_b).
    """
    fixed = iters_low is not None or iters_high is not None
    iters_low = 4 if iters_low is None else iters_low
    iters_high = 36 if iters_high is None else iters_high
    timed_a = _make_chain_timer(step_a, args)
    timed_b = _make_chain_timer(step_b, args)
    # compile + warm all four chains
    for timed in (timed_a, timed_b):
        timed(iters_low)
        timed(iters_high)

    if not fixed and target_seconds:
        lo_a, hi_a = _calibrate_spans(timed_a, iters_low, iters_high,
                                      target_seconds)
        lo_b, hi_b = _calibrate_spans(timed_b, iters_low, iters_high,
                                      target_seconds)
        # One common span pair, sized by the slower arm, keeps the rounds
        # symmetric (sizing by the faster arm would stretch the slower chain
        # far past target and slow the sweep for no precision gain).  An arm
        # whose floor chain already exceeds target returns the floor pair
        # unchanged; taking an element-wise min against it would collapse the
        # OTHER arm back to the jitter-exposed floor (exactly the asymmetric
        # incumbent-vs-challenger case calibration exists for), so a lone
        # calibrated pair is adopted outright — the slow arm only gets
        # longer, which is safe.
        floor = (iters_low, iters_high)
        calibrated = [p for p in ((lo_a, hi_a), (lo_b, hi_b)) if p != floor]
        if len(calibrated) == 1:
            new_lo, new_hi = calibrated[0]
        else:
            new_lo, new_hi = min(lo_a, lo_b), min(hi_a, hi_b)
        if (new_lo, new_hi) != (iters_low, iters_high):
            iters_low, iters_high = new_lo, new_hi
            for timed in (timed_a, timed_b):
                timed(iters_low)
                timed(iters_high)

    slopes_a: list = []
    slopes_b: list = []
    attempts = 0
    span = iters_high - iters_low
    while min(len(slopes_a), len(slopes_b)) < reps and attempts < 3 * reps:
        attempts += 1
        a_low = timed_a(iters_low)
        b_low = timed_b(iters_low)
        a_high = timed_a(iters_high)
        b_high = timed_b(iters_high)
        sa = (a_high - a_low) / span
        sb = (b_high - b_low) / span
        if sa > 0:
            slopes_a.append(sa)
        if sb > 0:
            slopes_b.append(sb)

    def result(slopes):
        if not slopes:
            slopes = [float("nan")]
        return BenchResult(
            average_time_ns=float(np.median(slopes)),
            std_deviation_ns=float(np.std(slopes)),
            samples=len(slopes),
        )

    return result(slopes_a), result(slopes_b)
