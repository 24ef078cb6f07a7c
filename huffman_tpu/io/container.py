"""HTC1 — the framework's native container format.

Binary layout (little-endian), modeled on the role of the Yamamoto container
(`Huffman_coding_Gap_arrays/encoder/src/huff.cpp:186-204`) but block-oriented
and carrying per-segment symbol counts so decode is one pass:

    magic            4s   b"HTC1"
    version          u8   2   (v2 adds the crc32 field; v1 readable)
    flags            u8   bit0: segments carry counts
    log2_seg_bits    u8
    max_len          u8
    n_sym            u16
    crc32            u32  (v2+) over every block's seg metadata + payload
    n_sym x (symbol u8, length u8)      # canonical order (len asc, sym asc)
    original_size    u64
    block_bytes      u32
    n_blocks         u32
    n_blocks x total_bits u64
    then per block:
      seg metadata   u16 x ceil(total_bits/seg_bits): (count << 4) | gap
      payload        u32 x ceil(total_bits/32)

Metadata overhead is 16 bits per seg_bits=1024 payload bits (1.56%) versus
the reference's 4 bits per 128 (3.125%) — strictly smaller streams AND a
counting-pass-free decoder.
"""

from __future__ import annotations

import struct

import numpy as np

from ..constants import GAP_BITS
from ..core.canonical import CodeTable, canonical_code_table
from ..models.gap_codec import Compressed

__all__ = [
    "write_container",
    "read_container",
    "container_size",
    "write_ils_container",
    "read_ils_container",
    "ils_container_size",
    "container_kind",
]

MAGIC = b"HTC1"
ILS_MAGIC = b"ILS1"
_HEADER = struct.Struct("<4sBBBBH")
_SIZES = struct.Struct("<QII")
_ILS_HEADER = struct.Struct("<4sBBHQBI")  # trailing u32: crc32 of payloads
_ILS_SECTION = struct.Struct("<IIiIII")


def container_kind(buf: bytes) -> str:
    """"htc1" | "ils1" from the magic, else ValueError."""
    head = bytes(buf[:4])
    if head == MAGIC:
        return "htc1"
    if head == ILS_MAGIC:
        return "ils1"
    raise ValueError("unknown container magic")


def _table_entries(table: CodeTable) -> np.ndarray:
    syms = table.symtab
    out = np.empty((len(syms), 2), np.uint8)
    out[:, 0] = syms
    out[:, 1] = table.lengths[syms]
    return out


def _htc_block_parts(comp: Compressed):
    for words, gaps, counts in zip(
        comp.block_words, comp.block_gaps, comp.block_counts
    ):
        meta = (counts.astype(np.uint16) << GAP_BITS) | gaps.astype(np.uint16)
        yield meta.tobytes()
        yield words.astype(np.uint32).tobytes()


def _htc_crc(comp: Compressed, parts=None) -> int:
    import zlib

    crc = zlib.crc32(str(comp.original_size).encode())
    for part in parts if parts is not None else _htc_block_parts(comp):
        crc = zlib.crc32(part, crc)
    return crc & 0xFFFFFFFF


def container_size(comp: Compressed) -> int:
    n_sym = comp.table.num_symbols
    size = _HEADER.size + 4 + 2 * n_sym + _SIZES.size + 8 * comp.n_blocks
    for tb in comp.block_total_bits:
        n_segs = -(-tb // comp.seg_bits)
        n_words = -(-tb // 32)
        size += 2 * n_segs + 4 * n_words
    return size


def write_container(comp: Compressed) -> bytes:
    seg_bits = comp.seg_bits
    log2_seg = seg_bits.bit_length() - 1
    assert 1 << log2_seg == seg_bits
    blocks = list(_htc_block_parts(comp))  # materialize once: CRC + body
    parts = [
        _HEADER.pack(
            MAGIC, 2, 1, log2_seg, comp.table.max_len, comp.table.num_symbols
        ),
        struct.pack("<I", _htc_crc(comp, blocks)),
        _table_entries(comp.table).tobytes(),
        _SIZES.pack(comp.original_size, comp.block_bytes, comp.n_blocks),
        np.asarray(comp.block_total_bits, np.uint64).tobytes(),
    ]
    parts.extend(blocks)
    return b"".join(parts)


def read_container(buf: bytes) -> Compressed:
    mv = memoryview(buf)
    if len(buf) < _HEADER.size or bytes(mv[:4]) != MAGIC:
        raise ValueError("not an HTC1 container (bad magic)")
    magic, version, flags, log2_seg, max_len, n_sym = _HEADER.unpack_from(mv, 0)
    if version not in (1, 2):
        raise ValueError(f"unsupported container version {version}")
    off = _HEADER.size
    crc_stored = None
    if version >= 2:
        (crc_stored,) = struct.unpack_from("<I", mv, off)
        off += 4
    entries = np.frombuffer(mv, np.uint8, 2 * n_sym, off).reshape(n_sym, 2)
    off += 2 * n_sym
    lengths = np.zeros(256, np.uint8)
    lengths[entries[:, 0]] = entries[:, 1]
    table = canonical_code_table(lengths, max_len)

    original_size, block_bytes, n_blocks = _SIZES.unpack_from(mv, off)
    off += _SIZES.size
    total_bits = np.frombuffer(mv, np.uint64, n_blocks, off).astype(np.int64)
    off += 8 * n_blocks

    seg_bits = 1 << log2_seg
    comp = Compressed(
        table=table,
        seg_bits=seg_bits,
        original_size=int(original_size),
        block_bytes=int(block_bytes),
        block_words=[],
        block_total_bits=[int(t) for t in total_bits],
        block_gaps=[],
        block_counts=[],
    )
    for tb in comp.block_total_bits:
        n_segs = -(-tb // seg_bits)
        n_words = -(-tb // 32)
        if off + 2 * n_segs + 4 * n_words > len(buf):
            raise ValueError("truncated HTC1 container")
        meta = np.frombuffer(mv, np.uint16, n_segs, off)
        off += 2 * n_segs
        comp.block_gaps.append((meta & ((1 << GAP_BITS) - 1)).astype(np.uint8))
        comp.block_counts.append((meta >> GAP_BITS).astype(np.int32))
        comp.block_words.append(np.frombuffer(mv, np.uint32, n_words, off).copy())
        off += 4 * n_words
    if off != len(buf):
        raise ValueError(f"container has {len(buf) - off} trailing bytes")
    if crc_stored is not None and _htc_crc(comp) != crc_stored:
        raise ValueError("HTC1 container payload checksum mismatch")
    return comp


# ----------------------------------------------------------------------
# ILS1 — interleaved-stream container (flagship format)
# ----------------------------------------------------------------------
# Layout (little-endian):
#   magic          4s  b"ILS1"
#   version        u8  4   (v2 = pair-granular schedule: snum/boffs/w_band
#                           in word pairs, streams padded to even words;
#                           v3 = band anchors per ILS_WIN-body window:
#                           boffs is n_tiles * n_win(k) entries;
#                           v4 = per-section flags word: bit0 = lane
#                           rotation, bits 8-11 = ILS_ROT_SUB and bits
#                           12-19 = ILS_ROT_LANE when bit0 is set (the
#                           rotation constants are format parameters; a
#                           reader whose layout differs must reject, and
#                           a v3 reader must not decode a rotated section)
#   max_len        u8
#   n_sym          u16
#   original_size  u64
#   n_sections     u8
#   n_sym x (symbol u8, length u8)     # canonical order
#   per section:
#     k u32, snum u32, flags i32 (v3: reserved 0), w_band u32, w_cap u32,
#     n_tiles u32
#     n_tiles x w_tile u32
#     n_tiles x n_win(k) x boff i32   # windowed decode band anchors
#     payload u32 x (sum(w_tiles) * 1024)
#
# Metadata is ~4 bytes per tile (megabytes of payload); the size overhead of
# the format lives in the per-stream zero padding to each tile's max word
# count, certified and measured by the encoder (core/ils_ref.py).


def _ils_crc(comp) -> int:
    import zlib

    crc = zlib.crc32(str(comp.original_size).encode())
    for sec in comp.sections:
        crc = zlib.crc32(np.ascontiguousarray(sec.payload, np.uint32), crc)
    return crc & 0xFFFFFFFF


def ils_container_size(comp) -> int:
    from ..core.ils_ref import ils_n_win

    size = _ILS_HEADER.size + 2 * comp.table.num_symbols
    for sec in comp.sections:
        p = sec.params
        size += (
            _ILS_SECTION.size
            + 4 * p.n_tiles * (1 + ils_n_win(p.k))
            + sec.payload.nbytes
        )
    return size


def write_ils_container(comp) -> bytes:
    from ..models.ils_codec import IlsCompressed

    assert isinstance(comp, IlsCompressed)
    # v3 readers reject v4, which any rotated section requires; plain
    # sections keep writing v3 for older readers
    version = 4 if any(sec.params.rot for sec in comp.sections) else 3
    parts = [
        _ILS_HEADER.pack(
            ILS_MAGIC,
            version,
            comp.table.max_len,
            comp.table.num_symbols,
            comp.original_size,
            len(comp.sections),
            _ils_crc(comp),
        ),
        _table_entries(comp.table).tobytes(),
    ]
    from ..core.ils_ref import ILS_ROT_LANE, ILS_ROT_SUB

    rot_flags = 1 | (ILS_ROT_SUB << 8) | (ILS_ROT_LANE << 12)
    for sec in comp.sections:
        p = sec.params
        parts.append(
            _ILS_SECTION.pack(
                p.k, p.snum, rot_flags if p.rot else 0, p.w_band, p.w_cap,
                p.n_tiles
            )
        )
        parts.append(p.w_tiles.astype(np.uint32).tobytes())
        parts.append(p.boffs.astype(np.int32).tobytes())
        parts.append(np.ascontiguousarray(sec.payload, np.uint32).tobytes())
    return b"".join(parts)


class IlsStreamWriter:
    """Incrementally write an ILS1 container, one section at a time.

    The bounded-host-memory encode path (VERDICT r5 item 5): a stream
    larger than one jit's working set encodes section by section — each
    section's metadata + payload is appended to the (seekable) file as soon
    as the device produces it, and the header (section count, version, CRC)
    is patched on `close()`.  Byte-identical to `write_ils_container` of
    the same sections (pinned by tests)."""

    def __init__(self, fileobj, table, original_size: int):
        import zlib

        self.f = fileobj
        self.table = table
        self.original_size = int(original_size)
        self.n_sections = 0
        self.any_rot = False
        self.crc = zlib.crc32(str(self.original_size).encode())
        self._hdr_pos = self.f.tell()
        self.f.write(b"\0" * _ILS_HEADER.size)
        self.f.write(_table_entries(table).tobytes())

    def write_section(self, sec) -> None:
        import zlib

        from ..core.ils_ref import ILS_ROT_LANE, ILS_ROT_SUB

        p = sec.params
        rot_flags = 1 | (ILS_ROT_SUB << 8) | (ILS_ROT_LANE << 12)
        self.f.write(
            _ILS_SECTION.pack(
                p.k, p.snum, rot_flags if p.rot else 0, p.w_band, p.w_cap,
                p.n_tiles,
            )
        )
        self.f.write(p.w_tiles.astype(np.uint32).tobytes())
        self.f.write(p.boffs.astype(np.int32).tobytes())
        payload = np.ascontiguousarray(sec.payload, np.uint32)
        self.crc = zlib.crc32(payload, self.crc)
        self.f.write(payload.tobytes())
        self.any_rot = self.any_rot or bool(p.rot)
        self.n_sections += 1

    def close(self) -> None:
        end = self.f.tell()
        self.f.seek(self._hdr_pos)
        self.f.write(
            _ILS_HEADER.pack(
                ILS_MAGIC,
                4 if self.any_rot else 3,
                self.table.max_len,
                self.table.num_symbols,
                self.original_size,
                self.n_sections,
                self.crc & 0xFFFFFFFF,
            )
        )
        self.f.seek(end)


class IlsStreamReader:
    """Incrementally read an ILS1 container, one section at a time.

    `read_section()` returns the next `IlsSection` (None past the last);
    the payload CRC accumulates as sections stream and `close()` raises on
    mismatch — callers that stream decoded output to disk should surface
    that error AFTER their last write, mirroring `read_ils_container`'s
    whole-buffer check."""

    def __init__(self, fileobj):
        import zlib

        self.f = fileobj
        hdr = self.f.read(_ILS_HEADER.size)
        if len(hdr) < _ILS_HEADER.size or hdr[:4] != ILS_MAGIC:
            raise ValueError("not an ILS1 container (bad magic)")
        (_, self.version, max_len, n_sym, self.original_size,
         self.n_sections, self._crc_stored) = _ILS_HEADER.unpack(hdr)
        if self.version not in (3, 4):
            raise ValueError(
                f"unsupported ILS container version {self.version}"
            )
        ebuf = self.f.read(2 * n_sym)
        if len(ebuf) < 2 * n_sym:
            raise ValueError("truncated ILS1 container")
        entries = np.frombuffer(ebuf, np.uint8).reshape(n_sym, 2)
        lengths = np.zeros(256, np.uint8)
        lengths[entries[:, 0]] = entries[:, 1]
        self.table = canonical_code_table(lengths, max_len)
        self._read = 0
        self.crc = zlib.crc32(str(int(self.original_size)).encode())

    def read_section(self):
        import zlib

        from ..core.ils_ref import (
            ILS_LANES,
            ILS_ROT_LANE,
            ILS_ROT_SUB,
            IlsParams,
            ils_n_win,
        )
        from ..ops.ils import IlsSection

        if self._read >= self.n_sections:
            return None
        shdr = self.f.read(_ILS_SECTION.size)
        if len(shdr) < _ILS_SECTION.size:
            raise ValueError("truncated ILS1 container")
        k, snum, flags, w_band, w_cap, n_tiles = _ILS_SECTION.unpack(shdr)
        rot_flags = 1 | (ILS_ROT_SUB << 8) | (ILS_ROT_LANE << 12)
        if self.version == 3 and flags:
            raise ValueError(f"unknown ILS section flags {flags:#x}")
        if self.version >= 4 and flags not in (0, rot_flags):
            raise ValueError(
                f"unsupported ILS section flags {flags:#x} (this reader "
                f"implements rotation constants sub={ILS_ROT_SUB}, "
                f"lane={ILS_ROT_LANE})"
            )
        n_win = ils_n_win(int(k))
        meta = self.f.read(4 * n_tiles * (1 + n_win))
        if len(meta) < 4 * n_tiles * (1 + n_win):
            raise ValueError("truncated ILS1 container")
        w_tiles = np.frombuffer(meta, np.uint32, n_tiles).astype(np.int32)
        boffs = (
            np.frombuffer(meta, np.int32, n_tiles * n_win, 4 * n_tiles)
            .reshape(n_tiles, n_win)
            .copy()
        )
        total_rows = int(w_tiles.sum())
        praw = self.f.read(4 * total_rows * ILS_LANES)
        if len(praw) < 4 * total_rows * ILS_LANES:
            raise ValueError("truncated ILS1 container")
        payload = (
            np.frombuffer(praw, np.uint32)
            .reshape(total_rows, ILS_LANES)
            .copy()
        )
        self.crc = zlib.crc32(payload, self.crc)
        self._read += 1
        return IlsSection(
            params=IlsParams(
                k=int(k), snum=int(snum), boffs=boffs, w_band=int(w_band),
                w_cap=int(w_cap), w_tiles=w_tiles, n_tiles=int(n_tiles),
                rot=bool(flags & 1),
            ),
            payload=payload,
        )

    def close(self) -> None:
        if self._read != self.n_sections:
            raise ValueError("close() before all sections were read")
        if self.f.read(1):
            raise ValueError("container has trailing bytes")
        if (self.crc & 0xFFFFFFFF) != self._crc_stored:
            raise ValueError("ILS1 container payload checksum mismatch")


def read_ils_container(buf: bytes):
    from ..core.ils_ref import (
        ILS_LANES,
        ILS_ROT_LANE,
        ILS_ROT_SUB,
        IlsParams,
        ils_n_win,
    )
    from ..models.ils_codec import IlsCompressed
    from ..ops.ils import IlsSection

    mv = memoryview(buf)
    if len(buf) < _ILS_HEADER.size or bytes(mv[:4]) != ILS_MAGIC:
        raise ValueError("not an ILS1 container (bad magic)")
    (_, version, max_len, n_sym, original_size, n_sections,
     crc_stored) = _ILS_HEADER.unpack_from(mv, 0)
    if version not in (3, 4):
        raise ValueError(f"unsupported ILS container version {version}")
    off = _ILS_HEADER.size
    entries = np.frombuffer(mv, np.uint8, 2 * n_sym, off).reshape(n_sym, 2)
    off += 2 * n_sym
    lengths = np.zeros(256, np.uint8)
    lengths[entries[:, 0]] = entries[:, 1]
    table = canonical_code_table(lengths, max_len)

    sections = []
    for _ in range(n_sections):
        if off + _ILS_SECTION.size > len(buf):
            raise ValueError("truncated ILS1 container")
        k, snum, flags, w_band, w_cap, n_tiles = _ILS_SECTION.unpack_from(
            mv, off
        )
        rot_flags = 1 | (ILS_ROT_SUB << 8) | (ILS_ROT_LANE << 12)
        if version == 3 and flags:
            # v3 reserves the flags word as zero — rejecting here catches a
            # metadata bit flip the payload CRC cannot see
            raise ValueError(f"unknown ILS section flags {flags:#x}")
        if version >= 4 and flags not in (0, rot_flags):
            # rotated sections record their rotation constants; a layout
            # this library's kernels don't implement must be rejected, not
            # silently mis-decoded
            raise ValueError(
                f"unsupported ILS section flags {flags:#x} (this reader "
                f"implements rotation constants sub={ILS_ROT_SUB}, "
                f"lane={ILS_ROT_LANE})"
            )
        off += _ILS_SECTION.size
        w_tiles = np.frombuffer(mv, np.uint32, n_tiles, off).astype(np.int32)
        off += 4 * n_tiles
        n_win = ils_n_win(int(k))
        boffs = (
            np.frombuffer(mv, np.int32, n_tiles * n_win, off)
            .reshape(n_tiles, n_win)
            .copy()
        )
        off += 4 * n_tiles * n_win
        total_rows = int(w_tiles.sum())
        n_words = total_rows * ILS_LANES
        if off + 4 * n_words > len(buf):
            raise ValueError("truncated ILS1 container")
        payload = (
            np.frombuffer(mv, np.uint32, n_words, off).reshape(total_rows, ILS_LANES)
        ).copy()
        off += 4 * n_words
        params = IlsParams(
            k=int(k),
            snum=int(snum),
            boffs=boffs,
            w_band=int(w_band),
            w_cap=int(w_cap),
            w_tiles=w_tiles,
            n_tiles=int(n_tiles),
            rot=bool(flags & 1),
        )
        sections.append(IlsSection(params=params, payload=payload))
    if off != len(buf):
        raise ValueError(f"container has {len(buf) - off} trailing bytes")
    comp = IlsCompressed(
        table=table, original_size=int(original_size), sections=sections
    )
    if _ils_crc(comp) != crc_stored:
        raise ValueError("ILS1 container payload checksum mismatch")
    return comp
