"""Self-synchronizing decoder — decode raw Huffman streams with NO metadata.

Capability parity with the reference's CUHD decoder (`gpuhd/`): given only a
canonical code table and the packed bit stream (no gap array, no counts —
e.g. a stream produced by a foreign encoder such as `sequential.cpp`),
recover all codeword boundaries and decode data-parallel.

TPU-native pipeline (contrast `gpuhd/src/cuhd_gpu_decoder.cu:422-523`):

1. **Transition pass** (Pallas, `ops/pallas/selfsync_kernels.py`): every
   subsequence decoded from all 16 possible entry offsets, lengths only —
   replaces CUHD's speculative phase 1/2 re-decode + host convergence loop
   with an exact, single-dispatch computation.
2. **Composition scan** (XLA): each subsequence is a [16] -> [16]
   transition FUNCTION; ``jax.lax.associative_scan`` composes them
   (``(a then b)(s) = b[a(s)]``, expanded gather-free as 16 selects) in
   O(log n) vector steps, yielding every subsequence's true entry state —
   the role of CUHD's thrust::exclusive_scan (`:497-505`) and sync
   iteration combined, exact in int32 at any stream length.
3. **Decode pass**: ONE fused dispatch (`fused_planned_decode`) — the
   gap-array ranks kernel consumes (entry, count) per subsequence exactly
   as if an encoder-side gap array existed, and the banded placement kernel
   concatenates the ragged output on device, with its index arrays computed
   from the device counts (only the plan's ~14 scalars touch the host).
   Decode-side placement is this path's cost — streams produced by THIS
   framework carry ILS schedules instead and never pay it.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.canonical import CodeTable, chain_spec
from ..ops.pallas.selfsync_kernels import SYNC_STATES, sync_transitions
from ..ops.pallas.decode_kernel import (
    decode_ranks_pallas,
    fused_planned_decode,
)
from ..ops.tables import DecSpec, device_dec_table

__all__ = [
    "selfsync_decode_words",
    "selfsync_decode_device",
    "selfsync_decode_bytes",
    "is_canonical",
]

_SEG_BITS = 1024


def _cdiv(a, b):
    return -(-a // b)


def _compose_scan(exits: jnp.ndarray) -> jnp.ndarray:
    """Inclusive scan of transition composition over exit states ONLY.

    exits: (n, 16) int.  Returns entry (n,) int32: the true entry state of
    each subsequence.  A subsequence is a FUNCTION [16] -> [16] (entry
    state -> exit state); the scan composes functions:
    ``(a then b)(s) = b[a(s)]``, with the 16-entry application expanded as
    16 where-selects — gather-free, exact in int32, and (n, 16)-sized all
    the way up.  (The earlier formulation scanned 16x16 one-hot matrices on
    the MXU; exact too, but its (n, 16, 16) fp32 prefix arrays cost 16x the
    memory and its batched-matmul HLO stalled the remote compiler for 30+
    minutes at n = 1M subsequences — 128 MB streams.)  Symbol counts are
    deliberately NOT carried through the scan: prefix counts accumulate to
    the stream total, which exceeds fp32's 2^24 above ~16 MB decoded; they
    are derived afterwards by an exact integer ``take_along_axis`` +
    ``cumsum`` over the selected per-subsequence counts (the role of
    thrust::exclusive_scan in the reference, `cuhd_gpu_decoder.cu:497-505`,
    which is likewise exact).
    """
    f = exits.astype(jnp.int32)  # (n, 16): f[i, s] = exit state of subseq i
    n = exits.shape[0]
    # pad to a power of two with IDENTITY transitions: associative_scan's
    # odd/even recursion at ragged lengths emits a slice zoo that stalled
    # the remote compiler indefinitely at n ~ 800K (the padded scan
    # compiles in seconds); identity tail entries never affect prefixes
    np2 = 1 << max(n - 1, 1).bit_length()
    if np2 != n:
        ident = jnp.broadcast_to(
            jnp.arange(SYNC_STATES, dtype=jnp.int32)[None],
            (np2 - n, SYNC_STATES),
        )
        f = jnp.concatenate([f, ident], axis=0)

    def combine(a, b):
        acc = jnp.zeros_like(a)
        for k in range(SYNC_STATES):
            acc = acc + jnp.where(a == k, b[:, k : k + 1], 0)
        return acc

    pg = jax.lax.associative_scan(combine, f, axis=0)
    exit_state = pg[:, 0]  # composed transition applied to entry state 0
    return jnp.concatenate([jnp.zeros(1, jnp.int32), exit_state[: n - 1]])


def _compose_scan_packed(exits: jnp.ndarray) -> jnp.ndarray:
    """`_compose_scan` with the 16 four-bit states NIBBLE-PACKED into
    (n, 2) int32 — identical results (pinned by tests).

    The scan is HBM-traffic bound, not op bound: each associative_scan
    round reads/writes full (n, 16) int32 prefix arrays, ~128 bytes per
    subsequence per round x ~20 rounds at 128 MB streams.  Packing cuts
    the per-element footprint 8x; the combine's op count rises (16 x 16
    select-accumulate on nibbles), but those fuse into the same pass."""
    f = exits.astype(jnp.int32)
    n = exits.shape[0]
    np2 = 1 << max(n - 1, 1).bit_length()
    if np2 != n:
        ident = jnp.broadcast_to(
            jnp.arange(SYNC_STATES, dtype=jnp.int32)[None],
            (np2 - n, SYNC_STATES),
        )
        f = jnp.concatenate([f, ident], axis=0)

    halves = [
        sum((f[:, 8 * h + j] << (4 * j)) for j in range(8)) for h in (0, 1)
    ]
    packed = jnp.stack(halves, axis=1)  # (np2, 2) int32

    def combine(a, b):
        bk = [(b[:, k >> 3] >> (4 * (k & 7))) & 15 for k in range(16)]
        out = []
        for h in (0, 1):
            acc = jnp.zeros_like(a[:, 0])
            for j in range(8):
                a_s = (a[:, h] >> (4 * j)) & 15
                r = jnp.zeros_like(a_s)
                for k in range(16):
                    r = r + jnp.where(a_s == k, bk[k], 0)
                acc = acc | (r << (4 * j))
            out.append(acc)
        return jnp.stack(out, axis=1)

    pg = jax.lax.associative_scan(combine, packed, axis=0)
    exit_state = pg[:, 0] & 15  # composed transition applied to state 0
    return jnp.concatenate([jnp.zeros(1, jnp.int32), exit_state[: n - 1]])


def selfsync_decode_words(
    words: np.ndarray,
    total_bits: int,
    table: CodeTable,
    *,
    interpret: bool | None = None,
) -> np.ndarray:
    """Decode a raw MSB-first u32 stream given only its canonical table."""
    return np.asarray(
        selfsync_decode_device(words, total_bits, table, interpret=interpret)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "seg_bits", "n_subseq", "max_len", "min_len", "out_cap",
        "packed_scan", "interpret",
    ),
)
def _selfsync_meta(
    words, total_bits, lim, *, seg_bits, n_subseq, max_len, min_len,
    out_cap, packed_scan=True, interpret=False,
):
    """Stage A, ONE dispatch: transitions + composition scan + per-subseq
    (entry, count) + the placement plan's scalar half — only ~14 int32s
    cross to the host (through the TPU tunnel every eager staging op costs
    the ~29 ms dispatch floor, and an O(n_subseq) counts pull costs seconds
    at the link's MB/s D2H rate)."""
    from ..ops.compact import compact_scalars

    packed = sync_transitions(
        words, total_bits, lim, seg_bits=seg_bits, n_subseq=n_subseq,
        max_len=max_len, min_len=min_len, interpret=interpret,
    )
    packed = packed[:, :n_subseq].T  # (n, 16)
    exits = packed >> 16
    counts16 = packed & 0xFFFF
    entry = (_compose_scan_packed if packed_scan else _compose_scan)(exits)
    counts = jnp.take_along_axis(counts16, entry[:, None], axis=1)[:, 0]
    counts = counts.astype(jnp.int32)
    plan = compact_scalars(counts, out_cap)
    head = jnp.stack(
        [jnp.sum(counts), jnp.max(counts) if n_subseq else jnp.int32(1)]
    ).astype(jnp.int32)
    return entry, counts, jnp.concatenate([head, plan])


def selfsync_decode_device(
    words: np.ndarray,
    total_bits: int,
    table: CodeTable,
    *,
    interpret: bool | None = None,
):
    """`selfsync_decode_words` keeping the decoded bytes ON DEVICE.

    The benchmark path: TWO device dispatches (metadata, then fused
    ranks+placement) with only scalar metadata syncing to the host in
    between — the slow D2H link never sees the payload or the per-segment
    counts (the degenerate sub-2-bit fallback below still returns a host
    array)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if total_bits == 0:
        return np.zeros(0, np.uint8)
    max_len = max(table.max_len_present, 1)
    if max_len > SYNC_STATES:
        raise ValueError("self-sync decode requires max codeword length <= 16")
    min_len = max(table.min_len, 1)
    # POWER-OF-TWO subsequence count: subsequences past total_bits decode
    # zero steps (the transitions kernel clamps to the stream end), i.e.
    # identity transitions with zero counts, so rounding up is free — and
    # essential: at ragged lengths the composition scan's odd/even
    # recursion (and the other n-sized ops) emitted HLO that stalled the
    # remote TPU compiler indefinitely at n ~ 800K, vs seconds at 2^20
    n_subseq = _cdiv(total_bits, _SEG_BITS)
    n_subseq = 1 << max(n_subseq - 1, 1).bit_length()
    lim = np.zeros((1, 32), np.uint32)
    lim[0, : table.lim_left.shape[0]] = table.lim_left

    from ..ops.compact import (
        TILE_BYTES,
        CompactStatics,
        MAX_ROW_BYTES,
        _round_up,
        _sym_tiles,
        pick_chunk,
    )

    out_cap = total_bits // min_len + 4
    words_j = jnp.asarray(words)
    entry, counts, scal = _selfsync_meta(
        words_j,
        jnp.int32(total_bits),
        jnp.asarray(lim),
        seg_bits=_SEG_BITS,
        n_subseq=n_subseq,
        max_len=max_len,
        min_len=min_len,
        out_cap=out_cap,
        interpret=interpret,
    )
    scal_h = np.asarray(scal)
    total_syms, max_count = int(scal_h[0]), int(scal_h[1])

    dec = device_dec_table(table, two_level=False)
    spec = DecSpec(
        lut_bits=max_len, max_len=max_len, min_len=min_len,
        chain=chain_spec(table),
    )
    if max_count <= MAX_ROW_BYTES:
        try:
            band, s_cap, chunk_bytes = pick_chunk(scal_h[2:])
            statics = CompactStatics(
                out_size=total_syms,
                n_segs=n_subseq,
                band=band,
                s_cap=s_cap,
                s_pad=_round_up(max(n_subseq, 1), 8) + s_cap,
                chunk_bytes=chunk_bytes,
                n_tiles=_cdiv(total_syms, TILE_BYTES),
            )
            symlo, symhi = _sym_tiles(np.asarray(table.symtab, np.uint8))
            return fused_planned_decode(
                words_j, entry, counts, symlo, symhi, dec,
                spec=spec, seg_bits=_SEG_BITS, n_segs=n_subseq,
                max_count=_cdiv(max(max_count, 1), 8) * 8,
                statics=statics, interpret=interpret,
            )
        except ValueError:
            pass  # VMEM-infeasible segment window: host compaction below

    # degenerate sub-2-bit codes: host mask compaction over padded ranks
    ranks = decode_ranks_pallas(
        words_j,
        entry,
        counts,
        dec,
        spec=spec,
        seg_bits=_SEG_BITS,
        n_segs=n_subseq,
        max_count=max_count,
        interpret=interpret,
    )
    counts_h = np.asarray(counts)
    ranks_h = np.asarray(ranks)[:, :n_subseq]  # (out_rows, n)
    by_sym = (
        np.frombuffer(ranks_h.astype("<u4").tobytes(), np.uint8)
        .reshape(ranks_h.shape[0], n_subseq, 4)
        .transpose(1, 0, 2)
        .reshape(n_subseq, -1)
    )
    mask = np.arange(by_sym.shape[1])[None, :] < counts_h[:, None]
    out_ranks = by_sym[mask]
    assert out_ranks.size == total_syms
    symtab = np.zeros(256, np.uint8)
    symtab[: table.num_symbols] = table.symtab
    return symtab[out_ranks]


def is_canonical(lengths: np.ndarray, codes: np.ndarray) -> bool:
    """True iff (codes, lengths) is a canonical code: codes of each length
    are consecutive and each level continues (prev + 1) << diff."""
    syms = np.nonzero(np.asarray(lengths) > 0)[0]
    if syms.size == 0:
        return True
    ls = np.asarray(lengths)[syms].astype(np.int64)
    cs = np.asarray(codes)[syms].astype(np.int64)
    order = np.lexsort((cs, ls))
    ls, cs = ls[order], cs[order]
    code = 0
    for i in range(syms.size):
        if i:
            code = (code + 1) << (ls[i] - ls[i - 1])
        if cs[i] != code:
            return False
    return True


def selfsync_decode_bytes(payload: np.ndarray, total_bits: int, code) -> np.ndarray:
    """Decode an MSB-first byte stream via self-sync (canonical codes), or
    fall back to the host LUT walk for non-canonical prefix codes."""
    from ..io.seqfmt import PrefixCode

    assert isinstance(code, PrefixCode)
    if not is_canonical(code.lengths, code.codes) or code.max_len > SYNC_STATES:
        # foreign greedy-tree codes (or codes past the 16-state transition
        # table): host oracle walk, native-speed (sequential.cpp:88-94)
        from ..io.seqfmt import host_lut_decode

        return host_lut_decode(payload, total_bits, code)

    # canonical: rebuild a CodeTable in canonical (len, code) order
    from ..io.yamamoto import table_from_length_sequence

    syms = np.nonzero(code.lengths > 0)[0]
    ls = code.lengths[syms].astype(np.int64)
    cs = code.codes[syms].astype(np.int64)
    order = np.lexsort((cs, ls))
    table = table_from_length_sequence(syms[order].astype(np.uint8), ls[order])
    n_bytes = -(-total_bits // 8)
    padded = np.zeros(_cdiv(n_bytes, 4) * 4 + 8, np.uint8)
    padded[:n_bytes] = payload[:n_bytes]
    words = np.frombuffer(padded.tobytes(), ">u4").astype(np.uint32)
    return selfsync_decode_words(words, total_bits, table)
