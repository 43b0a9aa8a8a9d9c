"""Result/benchmark/accuracy file writers.

Mirror of the reference FileWriter.h: result dumps as ``x RE IM`` lines
(:19-169), accuracy tables (``Accuracy_Test.dat``, :206-225), benchmark tables
(``BenchResults.dat``, :271-310), and a log writer (:192-203).  The same
text formats are kept (eyeball/diff parity with the reference workflow) plus
JSON variants for tooling.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import numpy as np

__all__ = [
    "write_results_to_file",
    "read_results_from_file",
    "write_accuracy_table",
    "write_bench_table",
    "write_log",
]


def write_results_to_file(path, re, im):
    """``x RE IM`` per line (FileWriter.h:19-76 analog), split planar input."""
    re = np.asarray(re).ravel()
    im = np.asarray(im).ravel()
    with open(path, "w") as f:
        for x in range(len(re)):
            f.write(f"{x} {re[x]:.17g} {im[x]:.17g}\n")


def read_results_from_file(path):
    """Parse an ``x RE IM`` file back to split planar arrays
    (AccuracyCalculator.h:150-658 file-comparison analog)."""
    xs, res, ims = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 3:
                continue
            xs.append(int(parts[0]))
            res.append(float(parts[1]))
            ims.append(float(parts[2]))
    order = np.argsort(xs)
    return np.asarray(res)[order], np.asarray(ims)[order]


def write_accuracy_table(path, rows: Sequence[dict]):
    """Accuracy table (Accuracy_Test.dat analog, FileWriter.h:206-225).

    rows: dicts with fft_length/avg/sigma/max (extra keys land in the JSON
    sidecar).
    """
    with open(path, "w") as f:
        f.write("# fft_length avg_deviation sigma_deviation max_deviation\n")
        for r in rows:
            f.write(
                f"{r['fft_length']} {r['avg']:.8e} {r['sigma']:.8e} {r['max']:.8e}\n"
            )
    Path(str(path) + ".json").write_text(json.dumps(list(rows), indent=1))


def write_bench_table(path, rows: Sequence[dict]):
    """Benchmark table (BenchResults.dat analog, FileWriter.h:271-310)."""
    with open(path, "w") as f:
        f.write("# fft_length batch avg_time_us sigma_us gflops\n")
        for r in rows:
            f.write(
                f"{r['fft_length']} {r.get('batch', 1)} "
                f"{r['avg_time_us']:.3f} {r.get('sigma_us', 0.0):.3f} "
                f"{r.get('gflops', 0.0):.1f}\n"
            )
    Path(str(path) + ".json").write_text(json.dumps(list(rows), indent=1))


def write_log(path, messages: Sequence[str]):
    """Append log lines (FileWriter.h:192-203 analog)."""
    with open(path, "a") as f:
        for m in messages:
            f.write(m.rstrip("\n") + "\n")
