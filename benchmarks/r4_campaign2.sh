#!/bin/bash
# Round-4 TPU campaign, part 2 (after r4_campaign1b.sh).
#
# Wall-clock-budgeted restructure (the original eight full S8 sweeps would
# starve the conformance campaign):
#   S7   batch-keyed tuning entries (verdict item 6) — quick, and the
#        b=1024 entry improves the S10 sweep row
#   S8   four-step range: FULL structural sweeps at the verdict-named
#        2^17 and 2^20; challenge-only (with _challenge audit dumps) at
#        2^18, 2^19, 2^21..2^24 (items 4+8)
#   S6   float32 (bf16x3) policy tuning at 4096/16384 + bench + accuracy
#        (item 7)
#   S9   small-N accuracy refresh under bf16ax2 defaults (item 10)
#   S10  refreshed bench sweep at the retuned winners
#
# Usage: nohup bash benchmarks/r4_campaign2.sh > /tmp/r4_campaign/driver2.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r4_campaign
mkdir -p $LOG

probe() {
  timeout 240 python - <<'PYEOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
(x @ x).block_until_ready()
PYEOF
}

stage_begin() {
  echo "=== $1 ($(date -u +%H:%M:%S)) ==="
  until probe; do echo "[wait] tunnel dead; retry in 120s"; sleep 120; done
}

retry() {  # retry <tag> <timeout_s> <cmd...>
  local tag=$1 tmo=$2; shift 2
  if grep -q DONE "$LOG/$tag.done" 2>/dev/null; then
    echo "[skip] $tag (done)"; return 0
  fi
  for att in 1 2 3; do
    timeout "$tmo" "$@" > "$LOG/$tag.log" 2>&1 && {
      tail -2 "$LOG/$tag.log"; echo DONE > "$LOG/$tag.done"; return 0; }
    echo "[fail] $tag attempt $att rc=$?"; sleep 90
  done
  echo "[dead] $tag"; return 1
}

# ---------------------------------------------------------------- S7
stage_begin "S7 batch-keyed tuning entries"
retry "s7_16384_b1024" 2400 python benchmarks/run_tuner.py \
    --start 16384 --end 16384 --batch 1024 --challenge-only
retry "s7_2p20_b16" 2400 python benchmarks/run_tuner.py \
    --start 1048576 --end 1048576 --batch 16 --challenge-only

# ---------------------------------------------------------------- S8
stage_begin "S8 four-step range retunes + audit dumps"
# Full structural sweeps at the two verdict-named lengths (>=2.5 TFLOP/s
# ask names 2^17..2^20; 2^17 and 2^20 bracket the range):
for n in 131072 1048576; do
  retry "s8_full_$n" 5400 python benchmarks/run_tuner.py \
      --start $n --end $n --batch-elems $((1 << 24))
done
# Challenge-only retunes everywhere else in the four-step range — now
# writing tuner_data_<n>_challenge.dat audit dumps:
for n in 262144 524288 2097152 4194304 8388608 16777216; do
  retry "s8_chal_$n" 2700 python benchmarks/run_tuner.py \
      --start $n --end $n --batch-elems $((1 << 24)) --challenge-only
done

# ---------------------------------------------------------------- S6
stage_begin "S6 float32 policy tuning + bench + accuracy"
for n in 4096 16384; do
  retry "s6_tune_$n" 5400 python benchmarks/run_tuner.py \
      --start $n --end $n --batch 4096 --precision float32
done
retry "s6_bench" 1800 python benchmarks/run_bench.py --start 4096 --end 16384 \
    --precision float32 --use-cache --out results/bench_f32_tpu.dat
retry "s6_acc_f32" 2400 python benchmarks/run_accuracy.py \
    --start 256 --end 1048576 --precision float32 --tuning auto \
    --out results/accuracy_vs_n_f32_tpu.part.dat

# ---------------------------------------------------------------- S9
stage_begin "S9 small-N accuracy rows under bf16ax2 defaults"
retry "s9_acc_small" 2400 python benchmarks/run_accuracy.py \
    --start 256 --end 4096 --out results/accuracy_vs_n_bf16_tpu.part.dat

# ---------------------------------------------------------------- S10
stage_begin "S10 refreshed bench sweep (reference protocol range)"
retry "s10_bench" 5400 python benchmarks/run_bench.py --start 4096 \
    --end 33554432 --use-cache --out results/bench_sweep_tpu.part.dat

echo "=== campaign 2 complete ($(date -u +%H:%M:%S)) ==="
