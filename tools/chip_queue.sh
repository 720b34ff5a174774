#!/bin/bash
# Round-4 chip worklist — run SEQUENTIALLY when the axon relay is up
# (CLAUDE.md: two concurrent remote compiles serialize and both look hung).
# Each job logs under runs/chip_r4/ and is individually bounded.
#
#   bash tools/chip_queue.sh [job...]      # default: all jobs in order
#
# Jobs: bench e2e depth12 depth14 bwd serve profile
set -u
cd "$(dirname "$0")/.."
OUT=${CHIP_OUT:-runs/chip_r5}
mkdir -p "$OUT"

probe() {
  timeout 120 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

run_job() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) -> $OUT/$name.log"
  if ! probe; then echo "=== relay DOWN, skipping $name"; return 1; fi
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc"; tail -3 "$OUT/$name.log"
  return $rc
}

JOBS=${*:-"bench e2e depth12 depth14 bwd serve profile"}
for j in $JOBS; do
  case "$j" in
    bench)   run_job bench   2400 python bench.py ;;
    flat_t)  run_job flat_t  2400 python tools/flat_t_bench.py ;;
    cond)    run_job cond    2400 python tools/cond_decompose.py ;;
    e2e)     run_job e2e     3000 python tools/e2e_flagship_smoke.py 4 ;;
    depth12) run_job depth12 2400 python tools/train_bench.py 12 adamw nested ;;
    depth14) run_job depth14 2400 python tools/train_bench.py 14 adamw nested ;;
    depth16) run_job depth16 2400 python tools/train_bench.py 16 adamw nested ;;
    bwd)     run_job bwd     1800 python tools/bwd_bench.py ;;
    serve)   run_job serve   1800 python tools/serve_batch_bench.py ;;
    profile) run_job profile 1800 python tools/profile_step.py ;;
    *) echo "unknown job $j" ;;
  esac
done
