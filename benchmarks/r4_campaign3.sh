#!/bin/bash
# Round-4 TPU campaign, part 3: conformance.
#
#   S11  fast gate re-cert 256..2^20 under the (possibly retuned) winners
#        (the reference UnitTest.cu range, 10 seeds per length)
#   S12  gate tail 2^26..2^28, ONE SEED PER PROCESS (--run-offset) — the
#        fp64 oracle + tunnel transfer dominate; a wedge costs one seed
#   S13  three consecutive bench.py runs (headline stability evidence)
#
# Usage: nohup bash benchmarks/r4_campaign3.sh > /tmp/r4_campaign/driver3.log 2>&1 &
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

# ---------------------------------------------------------------- S11
stage_begin "S11 gate re-cert 256..2^20 (tuned winners)"
: > $LOG/s11_recert.log
ok11=1
n=256
while [ $n -le 1048576 ]; do
  done_flag=0
  for att in 1 2 3; do
    if timeout 2400 python benchmarks/run_conformance.py --start $n --end $n \
        --tuning auto >> $LOG/s11_recert.log 2>&1; then done_flag=1; break; fi
    echo "[fail] s11 n=$n attempt $att"; sleep 90
  done
  [ $done_flag -eq 1 ] || { echo "[dead] s11 n=$n"; ok11=0; }
  n=$((n * 2))
done
[ $ok11 -eq 1 ] && echo "S11: all lengths green" || echo "S11: FAILURES (see log)"

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

# ---------------------------------------------------------------- S13
stage_begin "S13 bench.py x3"
for i in 1 2 3; do
  for att in 1 2 3; do
    timeout 1800 python bench.py > "$LOG/s13_bench_$i.json" 2> "$LOG/s13_bench_$i.err" && break
    echo "[fail] bench run $i attempt $att"; sleep 90
  done
  tail -1 "$LOG/s13_bench_$i.json"
done

echo "=== campaign 3 complete ($(date -u +%H:%M:%S)) ==="
