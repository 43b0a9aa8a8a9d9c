"""Deviation metrics between a result and the fp64 oracle.

Mirror of the reference AccuracyCalculator.h: GetLargestDeviation (:86-100),
ComputeAverageDeviation (:103-124, pairwise-cascade summation), and
ComputeSigmaOfDeviation (:126-148).  Deviations are computed elementwise over
the concatenated RE and IM planes (the reference iterates the 2N-element split
buffer), on the 1/N-scaled values.

The conformance thresholds are the reference unit-test gate
(UnitTest.cu:14-16): avg <= 1e-3, sigma <= 1e-2, max <= 0.5.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

__all__ = [
    "Deviation",
    "deviation",
    "REFERENCE_AVG_THRESHOLD",
    "REFERENCE_SIGMA_THRESHOLD",
    "REFERENCE_MAX_THRESHOLD",
]

REFERENCE_AVG_THRESHOLD = 1e-3
REFERENCE_SIGMA_THRESHOLD = 1e-2
REFERENCE_MAX_THRESHOLD = 0.5


@dataclasses.dataclass(frozen=True)
class Deviation:
    average: float
    sigma: float
    maximum: float

    def passes_reference_gate(
        self,
        avg_threshold: float = REFERENCE_AVG_THRESHOLD,
        sigma_threshold: float = REFERENCE_SIGMA_THRESHOLD,
        max_threshold: float = REFERENCE_MAX_THRESHOLD,
    ) -> bool:
        return (
            self.average <= avg_threshold
            and self.sigma <= sigma_threshold
            and self.maximum <= max_threshold
        )

    def __str__(self):
        return (
            f"Deviation(avg={self.average:.3e}, sigma={self.sigma:.3e}, "
            f"max={self.maximum:.3e})"
        )


def deviation(
    got: Tuple[np.ndarray, np.ndarray],
    want: Tuple[np.ndarray, np.ndarray],
) -> Deviation:
    """Average/sigma/max absolute deviation over the split RE+IM planes."""
    g = np.concatenate(
        [np.asarray(got[0], np.float64).ravel(), np.asarray(got[1], np.float64).ravel()]
    )
    w = np.concatenate(
        [np.asarray(want[0], np.float64).ravel(), np.asarray(want[1], np.float64).ravel()]
    )
    if g.shape != w.shape:
        raise ValueError(f"shape mismatch {g.shape} vs {w.shape}")
    dev = np.abs(g - w)
    avg = float(dev.mean())
    sigma = float(np.sqrt(np.mean((dev - avg) ** 2)))
    return Deviation(average=avg, sigma=sigma, maximum=float(dev.max()))
