#!/bin/bash
# Round-4 TPU measurement campaign (fire-and-forget; see CLAUDE.md tunnel
# discipline: ONE measurement per process, timeout + retry, resumable
# journals, poison detection after two dead attempts).
#
# Stages (VERDICT round-3 "next round" items):
#   S1  headline breakdown under the final winner + grouped-mult3 variants
#   S2  challenge-only retunes 4096/8192/16384 at b=4096 (mult3-in-grouped
#       is now REAL — the incumbent itself changed, so the twin must decide)
#   S3  rfft epilogue per-kernel floors (+ knob probes)
#   S4  rfft_perf re-measure (fused pack/interleave landed)
#   S5  mid-N fused probe matrix (exact Mosaic exception per config)
#
# Usage: nohup bash benchmarks/r4_campaign.sh > /tmp/r4_campaign/driver.log 2>&1 &
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

probe() {  # cheap op proving the tunnel is alive before a long stage
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

# ---------------------------------------------------------------- S1
stage_begin "S1 headline breakdown (grouped structure)"
for v in copy s1 g_block g_m3 g_full g_movement g_nostack \
         g_m3_full g_m3_movement g_m3_nostack \
         g_gridslice g_gridslice16 g_m3_gridslice; do
  run "s1_$v" 1150 python benchmarks/exp_stage_breakdown.py \
      --n 16384 --batch 4096 --variants "$v"
done

# ---------------------------------------------------------------- S2
stage_begin "S2 challenge retunes 4096..16384 b=4096"
for n in 4096 8192 16384; do
  for att in 1 2 3; do
    timeout 2400 python benchmarks/run_tuner.py --start $n --end $n \
        --batch 4096 --challenge-only > "$LOG/s2_$n.log" 2>&1 && break
    echo "[fail] s2_$n attempt $att"; sleep 90
  done
  tail -2 "$LOG/s2_$n.log"
done

# ---------------------------------------------------------------- S3
stage_begin "S3 rfft epilogue kernel floors"
for w in pack_rt untangle_rt; do
  run "s3_${w}_default" 1150 python benchmarks/exp_rfft_kernels.py --which $w
  run "s3_${w}_lt512"   1150 python benchmarks/exp_rfft_kernels.py --which $w --lane-tile 512
  run "s3_${w}_bt8192"  1150 python benchmarks/exp_rfft_kernels.py --which $w --block-target 8192
  run "s3_${w}_sr512"   1150 python benchmarks/exp_rfft_kernels.py --which $w --stack-rows 512
  # Bigger big-blocks: if per-grid-step DMA issue overhead dominates (129
  # steps at the defaults), these quarter the step count.
  run "s3_${w}_bt8k_sr2k"  1150 python benchmarks/exp_rfft_kernels.py \
      --which $w --block-target 8192 --stack-rows 2048
  run "s3_${w}_bt16k_sr4k" 1150 python benchmarks/exp_rfft_kernels.py \
      --which $w --block-target 16384 --stack-rows 4096
done

# ---------------------------------------------------------------- S4
stage_begin "S4 rfft_perf re-measure (fused pack/interleave)"
for att in 1 2 3; do
  timeout 1800 python benchmarks/exp_rfft_perf.py > "$LOG/s4_rfft_perf.log" 2>&1 && break
  echo "[fail] s4 attempt $att"; sleep 90
done
tail -3 "$LOG/s4_rfft_perf.log"

# ---------------------------------------------------------------- S5
stage_begin "S5 mid-N fused probe matrix"
for cfg in "32768 128,256 float32" "32768 128,256 bfloat16" \
           "32768 32,32,32 bfloat16" "65536 256,256 bfloat16" \
           "65536 16,64,64 bfloat16" "131072 8,128,128 bfloat16"; do
  set -- $cfg
  n=$1; rad=$2; sd=$3
  tag="s5_${n}_$(echo $rad | tr ',' x)_$sd"
  run "$tag" 1150 python benchmarks/exp_fused_midn_probe.py \
      --n "$n" --radices "$rad" --state-dtype "$sd" --measure
done

echo "=== campaign complete ($(date -u +%H:%M:%S)) ==="

# ------------------------------------------------------------- S1b (appended
# mid-campaign, byte-safe: pure EOF append).  Wider-lane-panel probes from
# the S1 attribution: the grouped stage-2 matmuls are weight-fill-bound at
# t=128 (only ~20% MXU utilization); t=256 doubles the columns per weight
# stream.  Never swept at 16384 (the fused search space caps lane_tile
# at n<=4096 for Mosaic-stall safety) — probe with timeouts instead.
stage_begin "S1b lane_tile=256 probes"
for v in g_block_t256 g_block_t256_b16 g_gs_t256; do
  run "s1b_$v" 1150 python benchmarks/exp_stage_breakdown.py \
      --n 16384 --batch 4096 --variants "$v"
done

# ------------------------------------------------------------- S1c (EOF
# append): shared-weight column widening — the kloop packs w/128 slices per
# stage-2 matmul (one weight fill per w columns instead of per 128),
# trading the grouped twiddle-fold for 2-4x fewer MXU weight fills.
stage_begin "S1c kloop width probes"
for v in kloop_w256 kloop_w512 kloop_w1024 kloop_w512_m3; do
  run "s1c_$v" 1150 python benchmarks/exp_stage_breakdown.py \
      --n 16384 --batch 4096 --variants "$v"
done

# ------------------------------------------------------------- S1d (EOF
# append): wide shared-weight matmuls with LANE-SPLIT back to 3D slices —
# fill amortization without the 5D-stack penalty (see exp_stage_breakdown
# make_kloop_wide).
stage_begin "S1d kloop wide + lane-split probes"
for v in kws2 kws4 kws8 kws16; do
  run "s1d_$v" 1150 python benchmarks/exp_stage_breakdown.py \
      --n 16384 --batch 4096 --variants "$v"
done
