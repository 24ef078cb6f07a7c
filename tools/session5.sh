#!/bin/bash
# r5 TPU measurement session (retry after the 00:24-01:40 tunnel outage):
# encode stage split + headline, selfsync split + bench, yamamoto bench.
set -u
cd "$(dirname "$0")/.."
L=bench_logs/r05
run() {
  name=$1; shift
  echo "=== $name: $*" >&2
  timeout 3600 python -u "$@" > "$L/$name.log" 2> "$L/$name.err"
  echo "--- $name exit=$? ---" >&2
  cat "$L/$name.log"
}
run genc_split4   tools/ab_genc.py --size $((1<<26))
run htc1_enc4     tools/secondary_bench.py --size $((1<<26)) --configs htc1_encode
run sec_sy4       tools/secondary_bench.py --size $((1<<26)) --configs yamamoto,selfsync
run selfsync_sp4  tools/ab_selfsync.py --size $((1<<26))
run gap4          tools/secondary_bench.py --size $((1<<26)) --configs gap_pallas
echo "=== stream proof ===" >&2
timeout 3600 bash tools/stream_proof.sh > "$L/stream_run.log" 2>&1
tail -6 "$L/stream.log" 2>/dev/null
run gap_r09       tools/secondary_bench.py --size $((1<<26)) --redundancy 0.9 --configs gap_pallas,htc1_encode
run gap_r01       tools/secondary_bench.py --size $((1<<26)) --redundancy 0.1 --configs gap_pallas,htc1_encode
echo "=== corpus sweep ===" >&2
timeout $((4*3600)) bash tools/corpus_run.sh "$L/corpus" /root/corpus \
  > "$L/corpus_run.log" 2>&1 || true
grep -h '"metric"' "$L"/corpus/*.log 2>/dev/null | tail -20
