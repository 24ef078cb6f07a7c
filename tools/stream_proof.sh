#!/bin/bash
# Section-streamed big-stream proof on the single chip (VERDICT r5 item 5;
# BASELINE config-5 substitute): a file LARGER than one jit's working set
# through `encode --stream` / `decode --stream` with bounded host memory,
# verified byte-exact.  Records wall numbers + peak RSS to
# bench_logs/r05/stream.log.
set -eu
cd "$(dirname "$0")/.."
L=bench_logs/r05
SIZE=${1:-$((5 * (1 << 28)))}   # 1.25 GB
SEC=${2:-$((1 << 28))}          # 256 MB sections -> >= 5 streamed sections
D=${STREAM_TMP:-$(mktemp -d)}
mkdir -p "$D"
if [ -x /usr/bin/time ]; then MTIME="/usr/bin/time -v"; else MTIME=""; fi
rss() { grep -E "Maximum resident|wall clock" "$1" || true; }
{
  echo "stream proof: size=$SIZE section_bytes=$SEC tmp=$D"
  python -u -m huffman_tpu.cli generate --size "$SIZE" --redundancy 0.5 \
    -o "$D/data.bin"
  $MTIME python -u -m huffman_tpu.cli encode "$D/data.bin" \
    -o "$D/data.ils" --stream --section-bytes "$SEC" 2> "$D/enc_time.txt"
  rss "$D/enc_time.txt"
  $MTIME python -u -m huffman_tpu.cli decode "$D/data.ils" \
    -o "$D/out.bin" --stream 2> "$D/dec_time.txt"
  rss "$D/dec_time.txt"
  cmp "$D/data.bin" "$D/out.bin" && echo "STREAM-ROUNDTRIP-OK"
  ls -la "$D"
  rm -rf "$D"
} 2>&1 | tee "$L/stream.log"
