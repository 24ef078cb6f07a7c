#!/bin/bash
# Trimmed r02 TPU campaign (1h budget): recorded compiled-TPU fuzz evidence,
# secondary-path GB/s, real-file lane-rotation A/B.  Sequential — one chip.
set -u
cd "$(dirname "$0")/.."
L="bench_logs/r02"
mkdir -p "$L"

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "[sweep] === $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > "$L/$name.log" 2> "$L/$name.err"
  echo "[sweep] $name rc=$? ($(date +%H:%M:%S))"
}

# 1. compiled-TPU differential fuzz (recorded correctness evidence)
run fuzz_tpu 1500 python tools/fuzz.py --tpu --iters 12 --seed 42

# 2. secondary paths (gap-pallas, selfsync, yamamoto, method A/B)
run secondary 1500 python tools/secondary_bench.py

# 3. real heterogeneous file (lane-rotation A/B)
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
run bench_real_rot 900 python bench.py --input "$L/real.bin"
run bench_real_norot 900 python bench.py --input "$L/real.bin" --rotate off

# 4. ratio-mode e-band A/B (streaming 1-pass vs certified 2-pass at k=16384)
run bench_ratio 900 python bench.py --size $((1<<26)) --redundancy 0.9 --optimize ratio
run bench_ratio_eb64 900 python bench.py --size $((1<<26)) --redundancy 0.9 --optimize ratio --e-band 64

echo "[sweep] trimmed campaign complete ($(date +%H:%M:%S))"
