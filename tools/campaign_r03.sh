#!/bin/bash
# r03 TPU campaign: real-file rotate=auto + tiered anchors, ratio-mode
# streaming encode, recorded compiled-TPU fuzz evidence, 1 GB entropy
# configs, secondary-path GB/s, max_len=8 decode.  Sequential — one chip.
# Headline (bench.py default) runs separately first; logs land in
# bench_logs/r03/ and the keepers are committed to docs/TPU_RUNS.md.
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

# 0. real heterogeneous file fixture (source tar cycled to 64 MB)
if [ ! -f "$L/real.bin" ]; then
  tar cf "$L/real.tar" --exclude=.git --exclude=__pycache__ --exclude=bench_logs \
    -C /root repo reference 2>/dev/null
  python - "$L" <<'EOF'
import sys, pathlib
d = pathlib.Path(sys.argv[1])
raw = (d / "real.tar").read_bytes()
reps = -(-(64 << 20) // len(raw))
(d / "real.bin").write_bytes((raw * reps)[: 64 << 20])
EOF
fi

# 1. real file: rotate=auto + tiered mu/laggard anchors must keep decode
#    at the rotated band and encode one-pass
run bench_real_auto 1500 python bench.py --input "$L/real.bin"

# 2. ratio mode (k=16384, streaming 1-pass pack, tiered anchors)
run bench_ratio 1500 python bench.py --size $((1<<26)) --redundancy 0.9 --optimize ratio

# 3. compiled-TPU differential fuzz (recorded correctness evidence for the
#    compiled kernels, incl. anchor escalation + grouped chain)
run fuzz_tpu 2400 python tools/fuzz.py --tpu --iters 16 --seed 42

# 4. 1 GB entropy configs (BASELINE.md refresh)
run bench_1g_r09 1800 python bench.py --size $((1<<30)) --redundancy 0.9
run bench_1g_r01 1800 python bench.py --size $((1<<30)) --redundancy 0.1

# 5. secondary paths (gap-pallas, selfsync, yamamoto, method A/B)
run secondary 1800 python tools/secondary_bench.py

# 6. max_len=8 table: short-chain decode ceiling + probe A/B
run bench_probe8 1500 python bench.py --size $((1<<26)) --max-len 8

echo "[sweep] r03 campaign complete ($(date +%H:%M:%S))"
