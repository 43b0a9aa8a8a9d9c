#!/bin/bash
# Round-5 TPU campaign: close the round-4 verdict's measurement items,
# highest-stakes-first under a hard deadline.
#
#   C3   Headline falsification: grouped (128,128) challengers at
#        16384/b4096 (half the fold-table bytes of (64,256)) — verdict 3.
#   C2   32768 single-pass fused decision (land the measured round-4 win
#        in the cache) — verdict 2.
#   CF   float32 (bf16x3) UNGROUPED tuning at 4096/8192/16384 b=4096
#        (the grouped seed is now prefiltered by the fold-table budget,
#        never compiled) — verdict 1d.
#   CFB  float32 bench rows 4096..16384 under the new cache entries.
#   CFA  float32 accuracy rows at the headline lengths under tuning=auto
#        (gate-green evidence for the f32 policy as shipped).
#   C8   Batch-occupancy probe at 16384/b1024: wider-lane (t=256)
#        challengers where the grid is occupancy-limited (8 programs) —
#        verdict 8.
#   C4   Four-step challenge retunes 2^17..2^20 — verdict 4.
#   C5   Baseline (staged-XLA) perf sweep 4096..2^25 — verdict 5/6.
#   CB   Refresh tuned bench_sweep rows at lengths whose cache changed,
#        merged into the committed table.
#   C6   Conformance tail 2^26..2^28, one seed per process — verdict 6.
#   C7   jax.profiler trace capture attempt (artifact or documented
#        failure) — verdict 7.
#   C9   bench.py x3 headline stability runs — verdict 10.
#
# Usage: DEADLINE_EPOCH=... nohup bash benchmarks/r5_campaign.sh \
#            > /tmp/r5_campaign/driver.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r5_campaign
mkdir -p $LOG
DEADLINE=${DEADLINE_EPOCH:-$(($(date +%s) + 28800))}

past_deadline() { [ "$(date +%s)" -ge $((DEADLINE - 180)) ]; }

probe() {
  timeout 240 python - <<'PYEOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
(x @ x).block_until_ready()
PYEOF
}

stage_begin() {
  if past_deadline; then echo "=== DEADLINE; stop before $1 ==="; exit 0; fi
  echo "=== $1 ($(date -u +%H:%M:%S)) ==="
  until probe; do
    if past_deadline; then echo "=== DEADLINE (tunnel dead) ==="; exit 0; fi
    echo "[wait] tunnel dead; retry in 120s"; sleep 120
  done
}

retry() {  # retry <tag> <timeout_s> <cmd...>
  local tag=$1 tmo=$2; shift 2
  if grep -q DONE "$LOG/$tag.done" 2>/dev/null; then
    echo "[skip] $tag (done)"; return 0
  fi
  for att in 1 2 3; do
    if past_deadline; then echo "[stop] $tag (deadline)"; exit 0; fi
    local left=$((DEADLINE - $(date +%s) - 60))
    [ "$left" -lt "$tmo" ] && tmo=$left
    [ "$tmo" -lt 240 ] && { echo "[stop] $tag (no time)"; exit 0; }
    timeout "$tmo" "$@" > "$LOG/$tag.log" 2>&1 && {
      tail -2 "$LOG/$tag.log"; echo DONE > "$LOG/$tag.done"; return 0; }
    echo "[fail] $tag attempt $att rc=$?"; sleep 60
  done
  echo "[dead] $tag"; return 1
}

# ---------------------------------------------------------------- C3
stage_begin "C3 headline falsification: grouped (128,128) at 16384/b4096"
retry "c3_128128" 3600 python benchmarks/run_tuner.py \
    --start 16384 --end 16384 --batch 4096 --challenge-only --extras-only \
    --extra-configs '[{"strategy":"fused","radices":[128,128],"grouped":true},{"strategy":"fused","radices":[128,128],"grouped":true,"state_dtype":"bfloat16"},{"strategy":"fused","radices":[128,128],"grouped":true,"lane_tile":256,"state_dtype":"bfloat16"}]'

# ---------------------------------------------------------------- C2
stage_begin "C2 32768 single-pass fused decision"
retry "c2_32768" 3600 python benchmarks/run_tuner.py \
    --start 32768 --end 32768 --batch 512 --challenge-only --extras-only \
    --extra-configs '[{"strategy":"fused","radices":[256,128],"max_fused_length":32768,"state_dtype":"bfloat16"},{"strategy":"fused","radices":[128,256],"max_fused_length":32768,"state_dtype":"bfloat16"},{"strategy":"fused","radices":[256,128],"max_fused_length":32768,"state_dtype":"bfloat16","grouped":true}]'

# ---------------------------------------------------------------- CF
stage_begin "CF float32 ungrouped tuning 4096"
retry "cf_4096" 2700 python benchmarks/run_tuner.py \
    --start 4096 --end 4096 --batch 4096 --precision float32 \
    --challenge-only --extras-only --seed-precision bfloat16 \
    --extra-configs '[{"strategy":"fused","radices":[32,128]},{"strategy":"fused","radices":[64,64]},{"strategy":"fused","radices":[32,128],"kloop_width":256}]'
stage_begin "CF float32 ungrouped tuning 8192"
retry "cf_8192" 2700 python benchmarks/run_tuner.py \
    --start 8192 --end 8192 --batch 4096 --precision float32 \
    --challenge-only --extras-only --seed-precision bfloat16 \
    --extra-configs '[{"strategy":"fused","radices":[64,128]},{"strategy":"fused","radices":[128,64]}]'
stage_begin "CF float32 ungrouped tuning 16384"
retry "cf_16384" 2700 python benchmarks/run_tuner.py \
    --start 16384 --end 16384 --batch 4096 --precision float32 \
    --challenge-only --extras-only --seed-precision bfloat16 \
    --extra-configs '[{"strategy":"fused","radices":[64,256]},{"strategy":"fused","radices":[128,128]},{"strategy":"four_step","four_step_split":[128,128]}]'

# ---------------------------------------------------------------- CFB
stage_begin "CFB float32 bench rows"
retry "cfb_bench" 2400 python benchmarks/run_bench.py --start 4096 \
    --end 16384 --precision float32 --use-cache \
    --out results/bench_f32_tpu.dat

# ---------------------------------------------------------------- CFA
stage_begin "CFA float32 accuracy rows under tuning=auto"
retry "cfa_acc" 2400 python benchmarks/run_accuracy.py \
    --start 4096 --end 16384 --precision float32 --tuning auto \
    --out results/accuracy_f32_auto_tpu.dat

# ---------------------------------------------------------------- CF2
# The f32@16384 winner was crowned from a single deployable four-step
# config; challenge its split/knob twins before shipping it.
stage_begin "CF2 float32 16384 four-step knob challengers"
retry "cf2_16384" 2700 python benchmarks/run_tuner.py \
    --start 16384 --end 16384 --batch 4096 --precision float32 \
    --challenge-only --extras-only \
    --extra-configs '[{"strategy":"four_step","four_step_split":[64,256]},{"strategy":"four_step","four_step_split":[256,64]},{"strategy":"four_step","four_step_split":[128,128],"grouped":true},{"strategy":"four_step","four_step_split":[128,128],"k1_tile":256}]'

# ---------------------------------------------------------------- C8
stage_begin "C8 batch-occupancy probe 16384/b1024"
retry "c8_b1024" 3000 python benchmarks/run_tuner.py \
    --start 16384 --end 16384 --batch 1024 --challenge-only --extras-only \
    --extra-configs '[{"strategy":"fused","radices":[64,256],"grouped":true,"lane_tile":256,"state_dtype":"bfloat16"},{"strategy":"fused","radices":[128,128],"grouped":true,"lane_tile":256,"state_dtype":"bfloat16"},{"strategy":"four_step","four_step_split":[128,128]}]'

# ---------------------------------------------------------------- C4
stage_begin "C4 four-step challenge retunes 2^17..2^20"
for n in 131072 262144 524288 1048576; do
  stage_begin "C4 n=$n"
  retry "c4_chal_$n" 2700 python benchmarks/run_tuner.py \
      --start $n --end $n --batch-elems $((1 << 24)) --challenge-only
done

# ---------------------------------------------------------------- C5
stage_begin "C5 baseline staged-XLA perf sweep"
retry "c5_baseline" 5400 python benchmarks/run_bench.py \
    --start 4096 --end $((1 << 25)) --baseline staged \
    --out results/bench_sweep_baseline_tpu.dat

# ---------------------------------------------------------------- CB
stage_begin "CB refresh tuned bench rows at retuned lengths"
retry "cb_refresh" 3600 python benchmarks/run_bench.py \
    --start 16384 --end $((1 << 20)) --use-cache \
    --out results/bench_sweep_tpu.part.dat

# ---------------------------------------------------------------- C7
stage_begin "C7 profiler trace capture"
retry "c7_trace" 1200 python benchmarks/exp_profile_trace.py

# ---------------------------------------------------------------- C9
stage_begin "C9 bench.py x3"
if ! grep -q DONE "$LOG/c9.done" 2>/dev/null; then
  c9_ok=1
  for i in 1 2 3; do
    if past_deadline; then echo "[stop] c9 (deadline)"; exit 0; fi
    run_ok=0
    for att in 1 2 3; do
      timeout 1500 python bench.py > "$LOG/c9_bench_$i.json" 2> "$LOG/c9_bench_$i.err" && { run_ok=1; break; }
      echo "[fail] bench run $i attempt $att"; sleep 60
    done
    [ "$run_ok" = 1 ] || c9_ok=0
    tail -1 "$LOG/c9_bench_$i.json"
  done
  [ "$c9_ok" = 1 ] && echo DONE > "$LOG/c9.done"
fi

# ---------------------------------------------------------------- C6
stage_begin "C6 conformance tail 2^26..2^28, one seed per process"
# Seed-outer so a deadline cut leaves partial coverage at EVERY length
# (seed 0 at all three lengths beats 10 seeds of 2^26 alone).
for seed in 0 1 2 3 4 5 6 7 8 9; do
  for n in 67108864 134217728 268435456; do
    tag="c6_${n}_seed$seed"
    stage_begin "C6 n=$n seed=$seed"
    retry "$tag" 2700 python benchmarks/run_conformance.py \
        --start $n --end $n --runs 1 --run-offset $seed --tuning auto
  done
done

echo "=== campaign complete ($(date -u +%H:%M:%S)) ==="
