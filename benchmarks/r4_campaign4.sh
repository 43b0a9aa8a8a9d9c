#!/bin/bash
# Round-4 TPU campaign, part 4 (fresh VM session — /tmp wiped, so parts
# 2/3's done-files and journals are gone; this restructures the remaining
# verdict items quick-wins-first so a wall-clock cut costs the tail, not
# the head).
#
#   S7   batch-keyed tuning entries at the two bench-sweep batches that
#        differ from the blind entries' (16384@b1024, 8192@b2048) —
#        verdict item 6.  (2^20's blind entry is ALREADY tuned at b=16.)
#   SM   32768 single-pass fused decision: challenge-only + --extra-configs
#        puts the 120-MiB-cap fused candidates (midn probe: (256,128) bf16
#        548 us vs 564 four-step) through the decision machinery — item 3.
#   SF   float32 (bf16x3) policy tuning at 4096/16384, seeded from the
#        bfloat16 winners — item 7.
#   S9   small-N accuracy refresh under bf16ax2 defaults — item 10.
#   SB   float32 bench rows — item 7.
#   S14  bench refresh 4096..65536 (captures S7/SM wins).
#   S8   challenge retunes + audit dumps 2^17..2^24 — items 4/8.
#   S10  full bench sweep refresh.
#   S12  conformance tail 2^26..2^28, one seed per process — item 5.
#
# Usage: nohup bash benchmarks/r4_campaign4.sh > /tmp/r4_campaign/driver4.log 2>&1 &
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
retry "s7_16384_b1024" 2700 python benchmarks/run_tuner.py \
    --start 16384 --end 16384 --batch 1024 --challenge-only
retry "s7_8192_b2048" 2700 python benchmarks/run_tuner.py \
    --start 8192 --end 8192 --batch 2048 --challenge-only

# ---------------------------------------------------------------- S15
# The one untried headline lever (S1b3, queued in round-4 part 1b but never
# run): UNGROUPED broadcast-twiddle kloop at lane_tile=256 + bf16 state —
# 256 data columns per shared (2R, 2R) weight fill, half the grid steps,
# tiny tables (the grouped t256 twin died in the Mosaic allocator on its
# ~32-64 MiB fold tables).  Decision-grade via the tuner's extra-configs at
# the headline batch; a win rewrites the blind 16384 entry (b=4096
# promotes) and bench.py picks it up.
stage_begin "S15 16384 ungrouped t256 headline challengers"
retry "s15_16384_t256" 4800 python benchmarks/run_tuner.py \
    --start 16384 --end 16384 --batch 4096 --challenge-only \
    --extra-configs '[{"strategy":"fused","radices":[64,256],"lane_tile":256,"state_dtype":"bfloat16"},{"strategy":"fused","radices":[64,256],"lane_tile":256,"state_dtype":"bfloat16","kloop_width":512},{"strategy":"fused","radices":[256,64],"lane_tile":256,"state_dtype":"bfloat16"}]'

# ---------------------------------------------------------------- SM
stage_begin "SM 32768 fused-vs-four-step decision"
retry "sm_32768" 3600 python benchmarks/run_tuner.py \
    --start 32768 --end 32768 --batch-elems $((1 << 24)) --challenge-only \
    --extra-configs '[{"strategy":"fused","radices":[256,128],"max_fused_length":32768,"state_dtype":"bfloat16"},{"strategy":"fused","radices":[128,256],"max_fused_length":32768,"state_dtype":"bfloat16"}]'

# ---------------------------------------------------------------- SF
stage_begin "SF float32 policy tuning (seeded from bfloat16 winners)"
for n in 4096 16384; do
  retry "sf_f32_$n" 3600 python benchmarks/run_tuner.py \
      --start $n --end $n --batch 4096 --precision float32 \
      --challenge-only --seed-precision bfloat16
done

# ---------------------------------------------------------------- S9
stage_begin "S9 small-N accuracy rows under bf16ax2 defaults"
retry "s9_acc_small" 2400 python benchmarks/run_accuracy.py \
    --start 256 --end 4096 --tuning auto \
    --out results/accuracy_vs_n_bf16_tpu.part.dat

# ---------------------------------------------------------------- SB
stage_begin "SB float32 bench rows"
retry "sb_bench_f32" 2400 python benchmarks/run_bench.py --start 4096 \
    --end 16384 --precision float32 --use-cache \
    --out results/bench_f32_tpu.dat

# ---------------------------------------------------------------- S14
stage_begin "S14 bench refresh 4096..65536 (S7/SM winners)"
retry "s14_bench_small" 2400 python benchmarks/run_bench.py --start 4096 \
    --end 65536 --use-cache --out results/bench_sweep_tpu.part1.dat

# ---------------------------------------------------------------- S13
# Headline stability evidence under whatever winners the cache holds by
# now — three consecutive bench.py runs (before the long-tail stages so a
# wall-clock cut keeps them).
stage_begin "S13 bench.py x3"
if ! grep -q DONE "$LOG/s13.done" 2>/dev/null; then
  for i in 1 2 3; do
    for att in 1 2 3; do
      timeout 1800 python bench.py > "$LOG/s13_bench_$i.json" 2> "$LOG/s13_bench_$i.err" && break
      echo "[fail] bench run $i attempt $att"; sleep 90
    done
    tail -1 "$LOG/s13_bench_$i.json"
  done
  echo DONE > "$LOG/s13.done"
fi

# ---------------------------------------------------------------- S8
stage_begin "S8 four-step range challenge retunes + audit dumps"
for n in 131072 262144 524288 1048576 2097152 4194304 8388608 16777216; do
  retry "s8_chal_$n" 2700 python benchmarks/run_tuner.py \
      --start $n --end $n --batch-elems $((1 << 24)) --challenge-only
done

# ---------------------------------------------------------------- S10
stage_begin "S10 bench sweep refresh 2^17..2^25"
retry "s10_bench_tail" 5400 python benchmarks/run_bench.py --start 131072 \
    --end 33554432 --use-cache --out results/bench_sweep_tpu.part2.dat

# ---------------------------------------------------------------- S12
stage_begin "S12 gate tail 2^26..2^28, one seed per process"
for n in 67108864 134217728 268435456; do
  for seed in 0 1 2 3 4 5 6 7 8 9; do
    tag="s12_${n}_seed$seed"
    if grep -q "PASS" "$LOG/$tag.log" 2>/dev/null; then
      echo "[skip] $tag"; continue
    fi
    okd=0
    for att in 1 2; do
      if timeout 3000 python benchmarks/run_conformance.py --start $n --end $n \
          --runs 1 --run-offset $seed --tuning auto > "$LOG/$tag.log" 2>&1; then
        echo "PASS" >> "$LOG/$tag.log"; echo "[ok  ] $tag"; okd=1; break
      fi
      echo "[fail] $tag attempt $att"; sleep 90
    done
    [ $okd -eq 1 ] || echo "[dead] $tag"
  done
done

echo "=== campaign 4 complete ($(date -u +%H:%M:%S)) ==="
