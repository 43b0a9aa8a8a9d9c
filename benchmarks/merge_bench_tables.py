"""Merge per-length result tables (bench or accuracy) into one sweep table.

The relay wedges under sustained load, so round-3 sweeps run ONE length per
process (campaign pattern) into part files; this merges the parts' JSON
sidecars back into a single table (sorted by fft_length, later parts win
duplicate lengths).  It also splices refreshed rows into a committed curve:
pass the committed .dat first and the refreshed part(s) after it, e.g.

  python benchmarks/merge_bench_tables.py --kind bench \
      --out results/bench_sweep_tpu.dat /tmp/bench_parts/*.dat
  python benchmarks/merge_bench_tables.py --kind accuracy \
      --out results/accuracy_vs_n_bf16_tpu.dat \
      results/accuracy_vs_n_bf16_tpu.dat /tmp/small_n_refresh.dat
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("parts", nargs="+", help="part .dat files (JSON sidecars "
                    "must sit next to them); later files win duplicates")
    ap.add_argument("--kind", choices=("bench", "accuracy"), default="bench")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from tensorfft_tpu.testing.io import write_accuracy_table, write_bench_table

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
    writer = write_bench_table if args.kind == "bench" else write_accuracy_table
    writer(args.out, rows)
    print(f"{args.out}: {len(rows)} rows "
          f"(N = {rows[0]['fft_length']}..{rows[-1]['fft_length']})")


if __name__ == "__main__":
    main()
