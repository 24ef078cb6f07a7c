#!/bin/bash
# r03b: clean-tree reruns after the round's kernel work landed (grouped
# chain, tiered stale-min anchors, single-dispatch placement).  The first
# r03 sweep's 1 GB rows raced source edits and its secondary step was
# dispatch-floor-bound; these reruns supersede them.
set -u
cd "$(dirname "$0")/.."
L="bench_logs/r03"
mkdir -p "$L"

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "[sweep] === $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "$L/$name.log" 2> "$L/$name.err"
  echo "[sweep] $name rc=$? ($(date +%H:%M:%S))"
}

run secondary2 2400 python tools/secondary_bench.py
run bench_1g_r09b 1800 python bench.py --size $((1<<30)) --redundancy 0.9
run bench_1g_r01b 1800 python bench.py --size $((1<<30)) --redundancy 0.1
run bench_real_auto2 1500 python bench.py --input "$L/real.bin"
run bench_ratio2 1500 python bench.py --size $((1<<26)) --redundancy 0.9 --optimize ratio
run fuzz_tpu2 1800 python tools/fuzz.py --tpu --iters 12 --seed 1042

echo "[sweep] r03b complete ($(date +%H:%M:%S))"
