"""Conformance/benchmark harness (mirror of reference src/testing/)."""

from tensorfft_tpu.testing.datagen import (
    get_random_weights,
    make_test_signal,
    sine_superposition,
)
from tensorfft_tpu.testing.metrics import (
    Deviation,
    deviation,
    REFERENCE_AVG_THRESHOLD,
    REFERENCE_MAX_THRESHOLD,
    REFERENCE_SIGMA_THRESHOLD,
)
from tensorfft_tpu.testing.oracle import fft_oracle, fftn_oracle, xla_baseline
from tensorfft_tpu.testing.timer import BenchResult, IntervalTimer, ScopeTimer, measure
