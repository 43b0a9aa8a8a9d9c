#!/bin/bash
# Round-4 TPU campaign, part 2 (after r4_campaign.sh / the S1-S5 results).
#
#   S6   float32 (bf16x3) policy tuning at 4096/16384 + bench rows
#        (VERDICT item 7: the split-precision headline has no tuned plan)
#   S7   batch-keyed tuning entries at the bench-sweep batches
#        (item 6: b=1024 @ 16384, b=16 @ 2^20)
#   S8   four-step FULL sweeps 2^17..2^24 with audit dumps
#        (items 4+8: k1_tile/gridslice/planar challenges + TunerData parity)
#   S9   small-N accuracy curve refresh under the bf16ax2 defaults (item 10)
#   S10  refreshed bench sweep rows at the retuned winners
#
# Usage: nohup bash benchmarks/r4_campaign2.sh > /tmp/r4_campaign/driver2.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r4_campaign
mkdir -p $LOG

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
(x @ x).block_until_ready()
EOF
}

stage_begin() {
  echo "=== $1 ($(date -u +%H:%M:%S)) ==="
  until probe; do echo "[wait] tunnel dead; retry in 120s"; sleep 120; done
}

retry() {  # retry <tag> <timeout_s> <cmd...>
  local tag=$1 tmo=$2; shift 2
  for att in 1 2 3; do
    timeout "$tmo" "$@" > "$LOG/$tag.log" 2>&1 && { tail -2 "$LOG/$tag.log"; return 0; }
    echo "[fail] $tag attempt $att rc=$?"; sleep 90
  done
  echo "[dead] $tag"; return 1
}

# ---------------------------------------------------------------- S6
stage_begin "S6 float32 policy tuning + bench"
for n in 4096 16384; do
  retry "s6_tune_$n" 3000 python benchmarks/run_tuner.py \
      --start $n --end $n --batch 4096 --precision float32
done
retry "s6_bench" 1800 python benchmarks/run_bench.py --start 4096 --end 16384 \
    --precision float32 --use-cache --out results/bench_f32_tpu.dat
retry "s6_acc_f32" 2400 python benchmarks/run_accuracy.py \
    --start 256 --end 1048576 --precision float32 --tuning auto \
    --out results/accuracy_vs_n_f32_tpu.part.dat

# ---------------------------------------------------------------- S7
stage_begin "S7 batch-keyed tuning entries"
retry "s7_16384_b1024" 2400 python benchmarks/run_tuner.py \
    --start 16384 --end 16384 --batch 1024 --challenge-only
retry "s7_2p20_b16" 2400 python benchmarks/run_tuner.py \
    --start 1048576 --end 1048576 --batch 16 --challenge-only

# ---------------------------------------------------------------- S8
stage_begin "S8 four-step full sweeps 2^17..2^24 (audit dumps)"
# --batch-elems 2^24 matches the bench-protocol batches the cache entries
# were tuned at (b=128 @ 2^17 ... b=1 @ 2^24) — the run_tuner default (2^22)
# would silently retune at 4x smaller batches.
n=131072
while [ $n -le 16777216 ]; do
  retry "s8_tune_$n" 3600 python benchmarks/run_tuner.py \
      --start $n --end $n --batch-elems $((1 << 24))
  n=$((n * 2))
done

# ---------------------------------------------------------------- S9
stage_begin "S9 small-N accuracy rows under bf16ax2 defaults"
retry "s9_acc_small" 2400 python benchmarks/run_accuracy.py \
    --start 256 --end 4096 --out results/accuracy_vs_n_bf16_tpu.part.dat

# ---------------------------------------------------------------- S10
stage_begin "S10 refreshed bench sweep (reference protocol range)"
retry "s10_bench" 5400 python benchmarks/run_bench.py --start 4096 \
    --end 33554432 --use-cache --out results/bench_sweep_tpu.part.dat

echo "=== campaign 2 complete ($(date -u +%H:%M:%S)) ==="
