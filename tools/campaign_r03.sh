#!/bin/bash
# r03 TPU campaign: recorded compiled-TPU fuzz evidence, secondary-path
# GB/s, real-file rotate=auto, ratio-mode streaming encode, max_len=8
# pure-probe decode.  Sequential — one chip.  Headline (bench.py default)
# runs separately first.
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

# 1. compiled-TPU differential fuzz (recorded correctness evidence for the
#    compiled kernels, incl. the auto-rot encode paths)
run fuzz_tpu 2400 python tools/fuzz.py --tpu --iters 24 --seed 42

# 2. secondary paths (gap-pallas, selfsync, yamamoto, method A/B)
run secondary 1800 python tools/secondary_bench.py

# 3. real heterogeneous file: rotate=auto must match the better of on/off
run bench_real_auto 1200 python bench.py --input "$L/real.bin"

# 4. ratio mode (k=16384, streaming 1-pass pack)
run bench_ratio 1200 python bench.py --size $((1<<26)) --redundancy 0.9 --optimize ratio

# 5. max_len=8 table: pure LUT-probe decode is the library path
run bench_probe8 1200 python bench.py --size $((1<<26)) --max-len 8

echo "[sweep] r03 campaign complete ($(date +%H:%M:%S))"
