#!/bin/bash
# Round TPU measurement campaign: waits for the tunnel, then runs the
# compiled-TPU fuzz soak, the headline bench configs, the real-file A/B,
# and the secondary-path bench, logging everything under bench_logs/.
#
# Run under tmux (multi-hour); every step is timeout-guarded so one wedge
# doesn't take down the campaign.  Never kills by pattern.
set -u
cd "$(dirname "$0")/.."
R="${1:-r02}"
L="bench_logs/$R"
mkdir -p "$L"

echo "[sweep] waiting for the TPU tunnel..."
for i in $(seq 1 720); do
  if timeout 100 python -c "
import jax, jax.numpy as jnp
x=jnp.ones((128,128)); (x@x).block_until_ready()" 2>/dev/null; then
    echo "[sweep] TPU alive at $(date +%H:%M:%S)"; break
  fi
  [ "$i" = 720 ] && { echo "[sweep] tunnel never came back"; exit 1; }
  sleep 30
done

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "[sweep] === $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" > >(tee "$L/$name.log") 2> >(tee "$L/$name.err" >&2)
  echo "[sweep] $name rc=$? ($(date +%H:%M:%S))"
}

# 1. compiled-TPU differential fuzz (recorded correctness evidence)
run fuzz_tpu 3600 python tools/fuzz.py --tpu --iters 30 --seed 42

# 2. headline configs (driver-default first)
run bench_256m_r05 1800 python bench.py
run bench_1g_r09 2400 python bench.py --size $((1<<30)) --redundancy 0.9
run bench_1g_r01 2400 python bench.py --size $((1<<30)) --redundancy 0.1
run bench_ratio 1800 python bench.py --size $((1<<26)) --redundancy 0.9 --optimize ratio
# e-band A/B: at ratio-mode k the default 32-pair emission window violates on
# skewed data (falls back to two-pass); a wider window keeps the 1-pass
# streaming encode — measure whether 1-pass@wide beats the certified two-pass
run bench_ratio_eb64 1800 python bench.py --size $((1<<26)) --redundancy 0.9 --optimize ratio --e-band 64
run bench_ratio_eb96 1800 python bench.py --size $((1<<26)) --redundancy 0.9 --optimize ratio --e-band 96

# 3. real heterogeneous file (lane-rotation A/B)
if [ ! -f "$L/real.bin" ]; then
  tar cf "$L/real.tar" --exclude=.git --exclude=__pycache__ --exclude=bench_logs \
    -C /root repo reference 2>/dev/null
  # cycle to >= 64 MB so the harness gets multiple tiles
  python - "$L" <<'EOF'
import sys, pathlib
d = pathlib.Path(sys.argv[1])
raw = (d / "real.tar").read_bytes()
reps = -(-(64 << 20) // len(raw))
(d / "real.bin").write_bytes((raw * reps)[: 64 << 20])
EOF
fi
run bench_real_rot 1800 python bench.py --input "$L/real.bin"
run bench_real_norot 1800 python bench.py --input "$L/real.bin" --rotate off

# 4. secondary paths (gap-pallas, selfsync, yamamoto, method A/B)
run secondary 3600 python tools/secondary_bench.py

# 5. 4 GB HBM-scale config last (highest OOM risk)
run bench_4g_r05 3600 python bench.py --size $((1<<32))

echo "[sweep] campaign complete ($(date +%H:%M:%S)); logs in $L"
