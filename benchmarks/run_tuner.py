"""Autotuner sweep (TunerSingleFFT.cu:10-56 analog).

Tunes every power-of-two length in the range, persisting winners to the JSON
tuner cache (the TunerResults.dat analog) consumed by create_plan via
TunerCache.get / run_bench.py --use-cache.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=256)
    ap.add_argument("--end", type=int, default=1 << 27)
    ap.add_argument("--batch-elems", type=int, default=1 << 22)
    ap.add_argument("--batch", type=int, default=None,
                    help="fixed batch for every length (overrides "
                         "--batch-elems; tunes a batch-specific cache entry)")
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--cache", default=None)
    ap.add_argument("--dump-dir", default="results",
                    help="directory for per-config tuner_data_<N>.dat "
                         "audit tables (TunerData_<N>.dat analog)")
    ap.add_argument("--challenge-only", action="store_true",
                    help="skip the structural sweep; re-measure the cached "
                         "incumbent and run only the knob head-to-heads "
                         "(cheap retune after a shared-engine change)")
    ap.add_argument("--extra-configs", default=None,
                    help="JSON list of tuning dicts appended as explicit "
                         "structural challengers (e.g. a single-pass fused "
                         "candidate at a four-step incumbent's length)")
    ap.add_argument("--seed-precision", default=None,
                    help="with --challenge-only and no cached incumbent at "
                         "--precision, start from this policy's winner "
                         "structure (float32 tuning seeds from bfloat16)")
    ap.add_argument("--extras-only", action="store_true",
                    help="with --challenge-only: measure ONLY the incumbent "
                         "and --extra-configs (plus the incumbent guard), "
                         "skipping the knob-twin ladder — for deciding "
                         "explicit structural challengers whose knob twins "
                         "already have a committed challenge dump")
    ap.add_argument("--no-resume", action="store_true",
                    help="disable the per-measurement resume journal "
                         "(/tmp/tfft_tuner) that lets a killed sweep restart "
                         "where it died")
    args = ap.parse_args()
    if args.extras_only and not args.challenge_only:
        # Alone it would run a full structural sweep with every twin/engine
        # head-to-head guard disabled, crowning a raw sequential-sweep
        # minimum (round-4 advisor finding).
        ap.error("--extras-only requires --challenge-only")

    import json

    from tensorfft_tpu.tuning import TunerCache, tune
    from tensorfft_tpu.tuning.tuner import _config_from_entry

    extras = None
    if args.extra_configs:
        extras = [_config_from_entry(d)
                  for d in json.loads(args.extra_configs)]
    cache = TunerCache(args.cache) if args.cache else TunerCache()
    n = args.start
    while n <= args.end:
        batch = args.batch if args.batch else max(1, args.batch_elems // n)
        mode = "challenge" if args.challenge_only else "sweep"
        resume_path = (None if args.no_resume else
                       f"/tmp/tfft_tuner/resume_{mode}_n{n}_b{batch}_"
                       f"{args.precision}.jsonl")
        # challenge-only dumps go to tuner_data_<n>_challenge.dat so they
        # never clobber a full structural-sweep audit table — but they DO
        # get written (round-3 verdict item 8: every cache winner needs
        # committed per-config evidence).
        entry = tune(n, batch=batch, precision=args.precision, cache=cache,
                     dump_dir=args.dump_dir,
                     challenge_only=args.challenge_only,
                     resume_path=resume_path,
                     extra_configs=extras,
                     seed_precision=args.seed_precision,
                     skip_knob_challenges=args.extras_only,
                     dump_tag=f"_b{batch}" if args.batch else "")
        print(f"N={n:>9d}: best {entry}")
        cache.save()
        n *= 2
    print(f"cache: {cache.path} ({len(cache)} entries)")


if __name__ == "__main__":
    main()
