#!/bin/bash
# r04 benchmark campaign.  Every step runs from an immutable snapshot of
# HEAD (tools/snapshot_run.sh refuses dirty trees and checks out a detached
# worktree) — the r03 sweep raced live source edits and recorded a spurious
# verification FAIL; that failure mode is now structurally impossible.
set -u
cd "$(dirname "$0")/.."
L="$PWD/bench_logs/r04"
mkdir -p "$L"

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "[r04] === $name ($(date +%H:%M:%S)) ==="
  timeout "$t" tools/snapshot_run.sh "$@" > "$L/$name.log" 2> "$L/$name.err"
  echo "[r04] $name rc=$? ($(date +%H:%M:%S))"
}

# real heterogeneous file: reuse the r03 tarball imprint if present
if [ ! -f "$L/real.bin" ] && [ -f "bench_logs/r03/real.bin" ]; then
  cp bench_logs/r03/real.bin "$L/real.bin"
fi

run headline     2400 python bench.py --size $((1<<28))
run secondary    5400 python tools/secondary_bench.py
run bench_1g_r09 2400 python bench.py --size $((1<<30)) --redundancy 0.9
run bench_1g_r01 2400 python bench.py --size $((1<<30)) --redundancy 0.1
run bench_ratio  2000 python bench.py --size $((1<<26)) --redundancy 0.9 --optimize ratio
if [ -f "$L/real.bin" ]; then
  run bench_real 2000 python bench.py --input "$L/real.bin"
fi
run fuzz_tpu     2400 python tools/fuzz.py --tpu --iters 10 --seed 2042

echo "[r04] campaign complete ($(date +%H:%M:%S))"
