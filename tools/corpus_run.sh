#!/bin/bash
# Real-data corpus sweep (VERDICT r5 item 6): every corpus file through the
# ILS flagship (bench.py --input, rotate=auto) and the gap/yamamoto paths
# (secondary_bench --input).  Run from an immutable snapshot
# (tools/snapshot_run.sh) on the TPU host; one file at a time (the tunnel
# serializes clients).  Logs to bench_logs/r05/corpus/.
set -u
OUT=${1:-bench_logs/r05/corpus}
CORPUS=${2:-/root/corpus}
mkdir -p "$OUT"
for f in src.tar binary.bin text.bin precomp.bin zeros.bin blocky.bin; do
  name="${f%%.*}"
  echo "=== $name (ILS) ==="
  timeout 3000 python -u bench.py --input "$CORPUS/$f" --reps 8 \
    > "$OUT/ils_$name.log" 2> "$OUT/ils_$name.err"
  tail -1 "$OUT/ils_$name.log"
  echo "=== $name (gap + yamamoto) ==="
  timeout 3600 python -u tools/secondary_bench.py --input "$CORPUS/$f" \
    --size $((1<<25)) --configs gap_pallas,yamamoto \
    > "$OUT/sec_$name.log" 2> "$OUT/sec_$name.err"
  cat "$OUT/sec_$name.log"
done
