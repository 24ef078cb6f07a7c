#!/bin/bash
# r5 TPU measurement session, take 2 (post-outage re-run, wall-clock
# constrained): priority-ordered so the highest-value numbers land first.
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
# 1. gap/HTC1 device encode (VERDICT item 1: >= 1 GB/s evidence)
run htc1_enc5   1500 tools/secondary_bench.py --size $((1<<26)) --configs htc1_encode
# 2. yamamoto foreign decode with the tier-4 merge (item 3: >= 3 GB/s)
#    + selfsync bench number in the same process
run sec_sy5     1800 tools/secondary_bench.py --size $((1<<26)) --configs yamamoto,selfsync
# 3. selfsync nibble-pack A/B (item 4)
run selfsync_sp5 1500 tools/ab_selfsync.py --size $((1<<26))
# 4. gap decode re-measure (entropy r=0.5)
run gap5        1200 tools/secondary_bench.py --size $((1<<26)) --configs gap_pallas
# 5. stream proof >= 1 GB (item 5)
echo "=== stream proof ===" >&2
timeout 2400 bash tools/stream_proof.sh > "$L/stream_run.log" 2>&1
tail -8 "$L/stream.log" 2>/dev/null
# 6. encode stage split (iterating evidence for item 1)
run genc_split5 1500 tools/ab_genc.py --size $((1<<26))
# 7. entropy spread for the gap paths
run gap_r09     1500 tools/secondary_bench.py --size $((1<<26)) --redundancy 0.9 --configs gap_pallas,htc1_encode
run gap_r01     1500 tools/secondary_bench.py --size $((1<<26)) --redundancy 0.1 --configs gap_pallas,htc1_encode
# 8. corpus sweep (item 6) — ILS flagship over all six files, then the
#    secondary paths over the three most informative ones
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
echo "=== session5b done ===" >&2
