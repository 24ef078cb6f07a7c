#!/bin/bash
# r5 continuation after the yamamoto profile detour: the remaining
# priority items (stream proof, entropy spread, corpus sweep).
set -u
cd "$(dirname "$0")/.."
L=bench_logs/r05
mkdir -p "$L"
run() {
  name=$1; to=$2; shift 2
  echo "=== $name: $*" >&2
  timeout "$to" python -u "$@" > "$L/$name.log" 2> "$L/$name.err"
  echo "--- $name exit=$? ---" >&2
  tail -3 "$L/$name.log"
}
echo "=== stream proof ===" >&2
timeout 2400 bash tools/stream_proof.sh > "$L/stream_run.log" 2>&1
tail -8 "$L/stream.log" 2>/dev/null
run gap5        1500 tools/secondary_bench.py --size $((1<<26)) --configs gap_pallas
run gap_r09     1500 tools/secondary_bench.py --size $((1<<26)) --redundancy 0.9 --configs gap_pallas,htc1_encode
run gap_r01     1500 tools/secondary_bench.py --size $((1<<26)) --redundancy 0.1 --configs gap_pallas,htc1_encode
for f in src.tar blocky.bin precomp.bin text.bin binary.bin zeros.bin; do
  name="${f%%.*}"
  echo "=== corpus $name (ILS) ===" >&2
  timeout 1500 python -u bench.py --input "/root/corpus/$f" --reps 8 \
    > "$L/corpus_ils_$name.log" 2> "$L/corpus_ils_$name.err"
  tail -1 "$L/corpus_ils_$name.log"
done
for f in src.tar blocky.bin precomp.bin; do
  name="${f%%.*}"
  echo "=== corpus $name (gap+yamamoto) ===" >&2
  timeout 1800 python -u tools/secondary_bench.py --input "/root/corpus/$f" \
    --size $((1<<25)) --configs gap_pallas,yamamoto \
    > "$L/corpus_sec_$name.log" 2> "$L/corpus_sec_$name.err"
  tail -3 "$L/corpus_sec_$name.log"
done
echo "=== session5c done ===" >&2
