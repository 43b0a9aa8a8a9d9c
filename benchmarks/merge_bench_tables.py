"""Merge per-length bench tables into one sweep table.

The relay wedges under sustained load, so the round-3 bench sweep runs ONE
length per process (campaign pattern) into ``/tmp/bench_parts/bench_<N>.dat``;
this merges the parts' JSON sidecars back into a single BenchResults.dat
analog (sorted by fft_length, later parts win duplicate lengths).

Usage: python benchmarks/merge_bench_tables.py --out results/bench_sweep_tpu.dat /tmp/bench_parts/*.dat
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("parts", nargs="+", help="part .dat files (JSON sidecars "
                    "must sit next to them)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from tensorfft_tpu.testing.io import write_bench_table

    by_n = {}
    for part in args.parts:
        sidecar = Path(str(part) + ".json")
        if not sidecar.exists():
            print(f"skip {part}: no JSON sidecar", file=sys.stderr)
            continue
        for row in json.loads(sidecar.read_text()):
            by_n[int(row["fft_length"])] = row
    rows = [by_n[n] for n in sorted(by_n)]
    if not rows:
        sys.exit("no rows merged")
    write_bench_table(args.out, rows)
    print(f"{args.out}: {len(rows)} rows "
          f"(N = {rows[0]['fft_length']}..{rows[-1]['fft_length']})")


if __name__ == "__main__":
    main()
