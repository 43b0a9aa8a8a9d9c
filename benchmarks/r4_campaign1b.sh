#!/bin/bash
# Round-4 TPU campaign, part 1b (after r4_campaign.sh; before part 2).
#
#   S1b2  retry the lane_tile=256 headline probes at the raised 120 MiB
#         scoped-VMEM limit (the 100 MiB cap, not Mosaic, killed the first
#         attempts — same root cause as the mid-N fused failures)
#   S2b   mid-N structural sweeps at 32768/65536: the fused challengers the
#         round-3 sweeps recorded as `inf` now compile (120 MiB); the
#         32768 probe already measured (256,128)+bf16 at 548 us = beats the
#         564 us four-step incumbent
#
# Usage: nohup bash benchmarks/r4_campaign1b.sh > /tmp/r4_campaign/driver1b.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r4_campaign
mkdir -p $LOG

run() {  # run <tag> <timeout_s> <cmd...>  — 3 attempts, 90 s cool-down
  local tag=$1 tmo=$2; shift 2
  local out="$LOG/$tag.json"
  if [ -s "$out" ] && grep -q '}' "$out"; then
    echo "[skip] $tag (done)"; return 0
  fi
  for att in 1 2 3; do
    echo "[run ] $tag attempt $att: $*"
    timeout "$tmo" "$@" > "$out.tmp" 2> "$LOG/$tag.err"
    rc=$?
    if [ $rc -eq 0 ] && grep -q '}' "$out.tmp"; then
      mv "$out.tmp" "$out"; cat "$out"; return 0
    fi
    echo "[fail] $tag rc=$rc; cooling down 90s"
    sleep 90
  done
  echo "[dead] $tag after 3 attempts"
  mv "$out.tmp" "$out.failed" 2>/dev/null || true
  return 1
}

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

# ---------------------------------------------------------------- S1b2
stage_begin "S1b2 lane_tile=256 probes at 120 MiB VMEM"
for v in g_block_t256_b16 g_block_t256 g_gs_t256; do
  run "s1b2_$v" 1150 python benchmarks/exp_stage_breakdown.py \
      --n 16384 --batch 4096 --variants "$v"
done

# ---------------------------------------------------------------- S2b
stage_begin "S2b mid-N structural sweeps (fused now compiles at 120 MiB)"
for spec in "32768 512" "65536 256"; do
  set -- $spec
  n=$1; b=$2
  for att in 1 2 3; do
    timeout 5400 python benchmarks/run_tuner.py --start $n --end $n \
        --batch $b > "$LOG/s2b_$n.log" 2>&1 && break
    echo "[fail] s2b_$n attempt $att"; sleep 90
  done
  tail -2 "$LOG/s2b_$n.log"
done

echo "=== campaign 1b complete ($(date -u +%H:%M:%S)) ==="

# ------------------------------------------------------------- S2c (EOF
# append, running-script-safe): headline challenge retunes under the NEW
# joint lane_tile=256 + bf16-state fused twin (tuner.py round-4 addition —
# the S1 attribution's weight-fill lever that keeps the grouped fold).
stage_begin "S2c headline challenge retunes (wide-lane fused twin)"
for n in 8192 16384; do
  for att in 1 2 3; do
    timeout 2400 python benchmarks/run_tuner.py --start $n --end $n \
        --batch 4096 --challenge-only > "$LOG/s2c_$n.log" 2>&1 && break
    echo "[fail] s2c_$n attempt $att"; sleep 90
  done
  tail -2 "$LOG/s2c_$n.log"
done

echo "=== campaign 1b (with S2c) complete ($(date -u +%H:%M:%S)) ==="

# ------------------------------------------------------------- S1b3 (EOF
# append): ungrouped t256 — the grouped t256 probes die in the allocator
# (fold tables ~32-64 MiB); the broadcast-twiddle kloop's tables are tiny,
# so wide lanes fit with bf16 state.
stage_begin "S1b3 ungrouped lane_tile=256 probes"
for v in kloop_t256_b16 kloop_t256_b16_w512; do
  run "s1b3_$v" 1150 python benchmarks/exp_stage_breakdown.py \
      --n 16384 --batch 4096 --variants "$v"
done
echo "=== campaign 1b (with S1b3) complete ($(date -u +%H:%M:%S)) ==="

# ------------------------------------------------------------- S2b2 (EOF
# append): re-sweep 32768 under the candidate fix that adds big-first
# two-stage orders — the midn probe's (256,128)+bf16 winner (548 us) was
# missing from the enumeration the S2b sweep ran with.
stage_begin "S2b2 32768 re-sweep with (256,128) candidates"
for att in 1 2 3; do
  timeout 5400 python benchmarks/run_tuner.py --start 32768 --end 32768 \
      --batch 512 > "$LOG/s2b2_32768.log" 2>&1 && break
  echo "[fail] s2b2_32768 attempt $att"; sleep 90
done
tail -2 "$LOG/s2b2_32768.log"
echo "=== campaign 1b (with S2b2) complete ($(date -u +%H:%M:%S)) ==="
