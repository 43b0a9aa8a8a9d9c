#!/bin/bash
# Round-4 TPU campaign, part 5 (second fresh VM session — campaign 4
# completed only S7 before the session ended; /tmp state is wiped again).
# Remaining verdict items, highest-value-first under a hard deadline so a
# wall-clock cut costs the tail:
#
#   S15x  UNGROUPED lane_tile=256 + bf16-state headline challengers at
#         16384/b4096 via the new --extras-only mode (the S16 VMEM-traffic
#         model's one untested prediction) — verdict item 1.
#   SF16  float32 (bf16x3) policy tuning at 16384, seeded from the
#         bfloat16 winner — verdict item 7.
#   SB    float32 bench rows 4096..16384 — item 7.
#   S9    small-N accuracy refresh under bf16ax2 defaults — item 10.
#   SF4   float32 tuning at 4096 — item 7.
#   S13   bench.py x3 stability runs.
#   SM    32768 fused-vs-four-step decision at the 120 MiB cap — item 3.
#   S8    four-step challenge retunes + audit dumps 2^17..2^24 — items 4/8.
#   S12   conformance tail 2^26..2^28 — item 5.
#
# DEADLINE_EPOCH: no new attempt starts within 180 s of it; the script
# exits so the round-end driver bench never races a second TPU client.
#
# Usage: DEADLINE_EPOCH=... nohup bash benchmarks/r4_campaign5.sh \
#            > /tmp/r4_campaign/driver5.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r4_campaign
mkdir -p $LOG
DEADLINE=${DEADLINE_EPOCH:-$(($(date +%s) + 3000))}

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

# ---------------------------------------------------------------- S15x
stage_begin "S15x 16384 ungrouped-t256 extras-only challengers"
retry "s15x_16384_t256" 2700 python benchmarks/run_tuner.py \
    --start 16384 --end 16384 --batch 4096 --challenge-only --extras-only \
    --extra-configs '[{"strategy":"fused","radices":[64,256],"lane_tile":256,"state_dtype":"bfloat16"},{"strategy":"fused","radices":[64,256],"lane_tile":256,"state_dtype":"bfloat16","kloop_width":512},{"strategy":"fused","radices":[256,64],"lane_tile":256,"state_dtype":"bfloat16"}]'

# ---------------------------------------------------------------- SF16
stage_begin "SF16 float32 policy tuning at 16384"
retry "sf_f32_16384" 3000 python benchmarks/run_tuner.py \
    --start 16384 --end 16384 --batch 4096 --precision float32 \
    --challenge-only --seed-precision bfloat16

# ---------------------------------------------------------------- SB
stage_begin "SB float32 bench rows"
retry "sb_bench_f32" 1800 python benchmarks/run_bench.py --start 4096 \
    --end 16384 --precision float32 --use-cache \
    --out results/bench_f32_tpu.dat

# ---------------------------------------------------------------- S9
stage_begin "S9 small-N accuracy rows under bf16ax2 defaults"
retry "s9_acc_small" 2400 python benchmarks/run_accuracy.py \
    --start 256 --end 4096 --tuning auto \
    --out results/accuracy_vs_n_bf16_tpu.part.dat

# ---------------------------------------------------------------- SF4
stage_begin "SF4 float32 policy tuning at 4096"
retry "sf_f32_4096" 2400 python benchmarks/run_tuner.py \
    --start 4096 --end 4096 --batch 4096 --precision float32 \
    --challenge-only --seed-precision bfloat16

# ---------------------------------------------------------------- S13
stage_begin "S13 bench.py x3"
if ! grep -q DONE "$LOG/s13.done" 2>/dev/null; then
  s13_ok=1
  for i in 1 2 3; do
    if past_deadline; then echo "[stop] s13 (deadline)"; exit 0; fi
    run_ok=0
    for att in 1 2 3; do
      timeout 1500 python bench.py > "$LOG/s13_bench_$i.json" 2> "$LOG/s13_bench_$i.err" && { run_ok=1; break; }
      echo "[fail] bench run $i attempt $att"; sleep 60
    done
    [ "$run_ok" = 1 ] || s13_ok=0
    tail -1 "$LOG/s13_bench_$i.json"
  done
  # only mark done when all three runs produced output, so a relaunch
  # retries a fully-failed stage instead of skipping it silently
  [ "$s13_ok" = 1 ] && echo DONE > "$LOG/s13.done"
fi

# ---------------------------------------------------------------- SM
stage_begin "SM 32768 fused-vs-four-step decision"
retry "sm_32768" 3600 python benchmarks/run_tuner.py \
    --start 32768 --end 32768 --batch-elems $((1 << 24)) --challenge-only \
    --extra-configs '[{"strategy":"fused","radices":[256,128],"max_fused_length":32768,"state_dtype":"bfloat16"},{"strategy":"fused","radices":[128,256],"max_fused_length":32768,"state_dtype":"bfloat16"}]'

# ---------------------------------------------------------------- S8
stage_begin "S8 four-step range challenge retunes + audit dumps"
for n in 131072 262144 524288 1048576 2097152 4194304 8388608 16777216; do
  stage_begin "S8 n=$n"
  retry "s8_chal_$n" 2700 python benchmarks/run_tuner.py \
      --start $n --end $n --batch-elems $((1 << 24)) --challenge-only
done

# ---------------------------------------------------------------- S12
stage_begin "S12 gate tail 2^26..2^28, one seed per process"
for n in 67108864 134217728 268435456; do
  for seed in 0 1 2 3 4 5 6 7 8 9; do
    tag="s12_${n}_seed$seed"
    if grep -q "PASS" "$LOG/$tag.log" 2>/dev/null; then
      echo "[skip] $tag"; continue
    fi
    if past_deadline; then echo "[stop] $tag (deadline)"; exit 0; fi
    okd=0
    for att in 1 2; do
      if timeout 3000 python benchmarks/run_conformance.py --start $n --end $n \
          --runs 1 --run-offset $seed --tuning auto > "$LOG/$tag.log" 2>&1; then
        echo "PASS" >> "$LOG/$tag.log"; echo "[ok  ] $tag"; okd=1; break
      fi
      echo "[fail] $tag attempt $att"; sleep 60
    done
    [ $okd -eq 1 ] || echo "[dead] $tag"
  done
done

echo "=== campaign 5 complete ($(date -u +%H:%M:%S)) ==="
