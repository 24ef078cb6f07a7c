"""Pallas TPU gap/HTC1 ENCODE pipeline — bit-granular ragged placement.

The round-4 gap-format device encode (`ops/encode.py::encode_block_fast`)
was wall-bound by XLA sorted segment-sums (~8 ns/element on this chip):
three placement sums plus four metadata reductions over n/4 code groups put
a 64 MB block at ~1 s (0.063 GB/s) — against the reference's single most
complete GPU component, its fully parallel encoder with warp scans,
decoupled lookback and atomicOr boundary writes
(`Huffman_coding_Gap_arrays/encoder/src/encoder.cu:142-355`).

This module is the designed replacement (docs/PERF.md §6, VERDICT r4 item
1): every scatter-shaped stage becomes a Pallas kernel, and the remaining
XLA work is O(n_rows) = O(n/128), not O(n):

0. **Input relayout** (`_relayout_kernel`): row r's 32 words across the
   lane grid via four (32, 32) XLU sub-transposes per 128-row block — the
   XLA form of this tall-skinny minor-dim-32 transpose measured 28.75 ms
   of a 79 ms 64 MB encode (bench_logs/r05/genc_split2.log).  Bytes are
   extracted little-endian in kernel A, so there is no byteswap stage.
1. **Row prepack** (`_row_pack_kernel`): each VPU lane packs ROW_BYTES=128
   consecutive input bytes into its own bounded bit row using the flagship
   ILS pack machinery (192-bit accumulator `_acc_insert`, deferred
   two-body `flush2` — `ils_kernels.py:407`).  Because a row's capacity
   (128·max_len bits) is small, no certification/violation/anchor
   machinery exists: each flush's emission window base is an exact
   function of the flush index and (min_len, max_len) (`_flush_bounds` —
   a PROVEN bound, evaluated on the traced loop counter).  The kernel
   also emits each symbol's within-row start bit (2 x 16-bit packed) and
   the row's total bit count.
2. **XLA glue**: one cumsum over per-row bit counts (n/128 elements) gives
   absolute row offsets; the reference's decoupled-lookback inter-block
   scan (`encoder.cu:192-263`) reduced to its essential O(n_rows) form.
3. **Row metadata** (`_row_meta_kernel`): per row, bucket the 128 absolute
   symbol starts into the <= 3 segments a 2048-bit row extent can touch
   (slot = segment delta vs the row's first segment).  The per-segment
   (gap, count) metadata then needs sorted segment reductions over only
   3·n_rows elements instead of 2·n symbols — the same trick as
   `encode_block_fast`'s group metadata, 32x coarser.
4. **Bit placement** (`_place_bits_kernel`): the encode mirror of the
   decode compaction kernels with BIT granularity, in the CHUNK-SHARED
   form (`compact_kernel._chunk_kernel`): per chunk, each 8-row window
   group is bit-masked to its count, bit-rotated to its output alignment
   (d & 31), lane-rolled to its word offset ((d >> 5) & 127) and
   scattered ONCE into a w_f-frame window of the chunk's output block at
   a prefetched frame base.  The plan is per-CHUNK only (two searchsorted
   queries over ~n_chunks), the VMEM window geometry is static
   (worst-case from the table's min_len), and no host certification sync
   exists: the WHOLE encode (relayout, prepack, cumsum, metadata,
   assembly, placement) is ONE jitted dispatch.

Bit-identical contract to `ops/encode.py::encode_block` (pinned by tests):
words (MSB-first u32 units), total_bits, gaps, counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ils_kernels import _acc_insert, _lane_lookup

__all__ = ["encode_blocks_pallas", "ROW_BYTES"]

LANES = 128
SUBLANES = 8
TILE_ROWS = SUBLANES * LANES  # placement rows per prepack grid step
ROW_BYTES = 128  # input bytes packed per placement row
ROW_WORDS = ROW_BYTES // 4  # 32 input words per row
OUT_TILE_WORDS = SUBLANES * LANES  # output words per placement tile (4 KiB)
TILE_BITS = OUT_TILE_WORDS * 32  # 32768 bits of output per placement tile

# VMEM budget for the placement row window (rows are 128 lanes x 4 B).
_WIN_BUDGET_ROWS = ((10 << 20) // (LANES * 4)) & ~7
_CHUNK_BITS_MAX = 1 << 24  # 2 MiB of output per window chunk (maximum)


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


# ----------------------------------------------------------------------
# Kernel A: row prepack (bytes -> per-lane packed bit rows)
# ----------------------------------------------------------------------
def _flush_bounds(f, min_len, max_len, cap_pairs):
    """Exact emission band for flush ``f`` (1-based, after 8f symbols):
    e_ptr = (T - used)/64 with T in [8f*min_len, 8f*max_len] and used in
    [0, 191] (ILS accumulator invariant), and the flush touches pairs
    e_ptr and e_ptr + 1."""
    ep_min = max(0, (8 * f * min_len - 191) // 64)
    ep_max = (8 * f * max_len) // 64
    end = min(ep_max + 2, cap_pairs)
    return ep_min, end - ep_min


def _flush_window(min_len, max_len, cap_pairs):
    """Static flush-window width: max over flushes of the exact band."""
    n_flush = ROW_WORDS // 2
    return max(
        _flush_bounds(f, min_len, max_len, cap_pairs)[1]
        for f in range(1, n_flush + 1)
    )


def _row_pack_kernel(lo_tab, hi_tab, data_ref, pay_ref, bits_ref, starts_ref,
                     *, cap_pairs, min_len, max_len):
    shape = (SUBLANES, LANES)
    u32 = jnp.uint32
    W = _flush_window(min_len, max_len, cap_pairs)

    pay_ref[:] = jnp.zeros((2 * cap_pairs, SUBLANES, LANES), jnp.int32)

    def flush2(a, used, e_ptr, base, final=False):
        """`ils_kernels._pack_kernel.flush2` against a W-pair window at a
        dynamic SCALAR base: `_flush_bounds` proves pairs e_ptr, e_ptr+1
        always land in [base, base+W), so no certify/violation machinery
        is needed (the row's whole emission range is statically bounded)."""
        e1 = used > 0 if final else used >= 64
        e2 = jnp.zeros(shape, jnp.bool_) if final else used >= 128
        rel = e_ptr - base
        v00 = jnp.where(e1, pltpu.bitcast(a[0], jnp.int32), 0)
        v01 = jnp.where(e1, pltpu.bitcast(a[1], jnp.int32), 0)
        v10 = jnp.where(e2, pltpu.bitcast(a[2], jnp.int32), 0)
        v11 = jnp.where(e2, pltpu.bitcast(a[3], jnp.int32), 0)
        iota_pairs = jax.lax.broadcasted_iota(
            jnp.int32, (W, 1, SUBLANES, LANES), 0
        )
        m1 = iota_pairs == rel[None, None]
        m2 = iota_pairs == (rel + 1)[None, None]
        contrib = jnp.where(m1, jnp.stack([v00, v01])[None], 0) | jnp.where(
            m2, jnp.stack([v10, v11])[None], 0
        )
        window = pay_ref[pl.ds(2 * base, 2 * W)]
        pay_ref[pl.ds(2 * base, 2 * W)] = window | contrib.reshape(
            2 * W, SUBLANES, LANES
        )
        a = tuple(
            jnp.where(
                e2,
                a[j + 4] if j + 4 < 6 else u32(0),
                jnp.where(e1, a[j + 2] if j + 2 < 6 else u32(0), a[j]),
            )
            for j in range(6)
        )
        cnt = e1.astype(jnp.int32) + e2.astype(jnp.int32)
        return a, used - 64 * cnt, e_ptr + cnt

    def body(f, st):
        # one flush group: 2 input words (8 symbols), then one flush at the
        # f-dependent scalar window base (`_flush_bounds` on traced f)
        a, used, e_ptr, tot = st
        for b2 in range(2):
            i = 2 * f + b2
            w = pltpu.bitcast(data_ref[i], u32)
            ps = []
            for b in range(4):
                # LITTLE-endian byte extraction: the caller feeds the raw
                # byte stream bitcast to native u32 (byte 0 = LSB), so no
                # byteswap stage exists anywhere
                sym = ((w >> u32(8 * b)) & u32(255)).astype(jnp.int32)
                entry = _lane_lookup(lo_tab[:], hi_tab[:], sym)
                ps.append(tot)
                tot = tot + (entry >> 20)
                a, used = _acc_insert(a, used, entry)
            starts_ref[pl.ds(2 * i, 2)] = jnp.stack(
                [ps[0] | (ps[1] << 16), ps[2] | (ps[3] << 16)]
            )
        ep_min = jnp.maximum((8 * (f + 1) * min_len - 191) // 64, 0)
        base = jnp.minimum(ep_min, cap_pairs - W)
        a, used, e_ptr = flush2(a, used, e_ptr, base)
        return (a, used, e_ptr, tot)

    st = (
        tuple(jnp.zeros(shape, u32) for _ in range(6)),
        jnp.zeros(shape, jnp.int32),
        jnp.zeros(shape, jnp.int32),
        jnp.zeros(shape, jnp.int32),
    )
    a, used, e_ptr, tot = jax.lax.fori_loop(
        0, ROW_WORDS // 2, body, st, unroll=False
    )

    # final partial pair: e_ptr = (T - used)/64, used in [1, 63]
    base_f = min(
        max(0, (ROW_BYTES * min_len - 63) // 64), cap_pairs - W
    )
    flush2(a, used, e_ptr, jnp.int32(base_f), final=True)
    bits_ref[:] = tot


# ----------------------------------------------------------------------
# Input relayout: word w of row r across the lane grid (XLU kernel)
# ----------------------------------------------------------------------
def _relayout_kernel(in_ref, out_ref):
    """(1024 rows x 32 words, natural order) -> data3 block (32, 8, 128).

    The XLA transpose of (n_rows, 32) -> (32, n_rows) measured 28.75 ms of
    a 79 ms 64 MB encode (bench_logs/r05/genc_split2.log) — a tall-skinny
    minor-dim-32 transpose XLA lowers terribly.  Per 128-row sub-block the
    relayout is transpose(flat.reshape(128, 32)), which decomposes into
    four (32, 32) XLU transposes + lane-permute interleaves."""
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (32, LANES), 1)
    idx = iota_l >> 2
    for s in range(SUBLANES):
        x = in_ref[32 * s : 32 * s + 32]  # (32, 128): 4096 words
        out = jnp.zeros((32, LANES), jnp.int32)
        for j2 in range(4):
            t = jnp.transpose(
                jax.lax.slice_in_dim(x, 32 * j2, 32 * j2 + 32, axis=1),
                (1, 0),
            )  # t[w, c] = x[c, 32*j2 + w]
            tp = jnp.pad(t, ((0, 0), (0, LANES - 32)))
            out = out | jnp.where(
                (iota_l & 3) == j2,
                jnp.take_along_axis(tp, idx, axis=1),
                0,
            )
        out_ref[:, s] = out


def _relayout(arr, tiles, *, interpret=False):
    """(n_rows_p, ROW_WORDS) int32 natural rows -> (ROW_WORDS, T*8, 128)."""
    n_rows_p = arr.shape[0]
    return pl.pallas_call(
        _relayout_kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS * ROW_WORDS // LANES, LANES),
                         lambda t: (t, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (ROW_WORDS, SUBLANES, LANES), lambda t: (0, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (ROW_WORDS, tiles * SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(arr.reshape(n_rows_p * ROW_WORDS // LANES, LANES))


# ----------------------------------------------------------------------
# Kernel B: per-row segment-slot metadata
# ----------------------------------------------------------------------
def _row_meta_kernel(starts_ref, s_ref, cnt_ref, first_ref, *, n_slots,
                     seg_shift):
    shape = (SUBLANES, LANES)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    s_abs = s_ref[:]
    sid0 = s_abs >> seg_shift

    def body(q, st):
        cnt, first = st
        blk = starts_ref[pl.ds(8 * q, 8)]
        for i in range(8):
            w = blk[i]
            for h in (0, 1):
                p = (w >> (16 * h)) & 0xFFFF
                absb = s_abs + p
                d = (absb >> seg_shift) - sid0
                for k in range(n_slots):
                    m = d == k
                    cnt = cnt[:k] + (cnt[k] + m.astype(jnp.int32),) + cnt[k + 1:]
                    first = (
                        first[:k]
                        + (jnp.minimum(first[k], jnp.where(m, absb, big)),)
                        + first[k + 1:]
                    )
        return cnt, first

    cnt = tuple(jnp.zeros(shape, jnp.int32) for _ in range(n_slots))
    first = tuple(jnp.full(shape, big, jnp.int32) for _ in range(n_slots))
    cnt, first = jax.lax.fori_loop(
        0, 2 * ROW_WORDS // 8, body, (cnt, first), unroll=False
    )
    for k in range(n_slots):
        cnt_ref[k] = cnt[k]
        first_ref[k] = first[k]


# ----------------------------------------------------------------------
# Kernel C: bit-granular chunk-shared ragged placement
# ----------------------------------------------------------------------
def _place_bits_kernel(base_ref, ng_ref, gf0_ref, rows_hbm, out_ref, win,
                       sem, *, s_cap, n_frames, w_f, chunk_bits):
    """Chunk-shared bit placement (the encode mirror of
    `compact_kernel._chunk_kernel`): each 8-row group of the chunk's window
    is bit-masked, bit-rotated, lane-rolled ONCE and scattered into a
    w_f-frame window of the chunk's output block at a prefetched frame
    offset (``gf0``; an in-kernel min-reduce would sit on the serial RMW
    chain — PERF.md §5).  Work per chunk = O(window rows); no per-tile band
    plan exists at all (the banded per-tile form paid two n_tiles-query
    device searchsorteds ~10 ms/64 MB in the plan alone)."""
    c = pl.program_id(0)
    dma = pltpu.make_async_copy(
        rows_hbm.at[pl.ds(base_ref[c], s_cap)], win, sem
    )
    dma.start()
    dma.wait()

    out_ref[:] = jnp.zeros((n_frames, LANES), jnp.int32)
    k0 = c * chunk_bits
    g_base = base_ref[c] // SUBLANES  # bases are 8-aligned by the planner
    f_base = c * n_frames
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    u32 = jnp.uint32

    def group(g, _):
        rw = win[pl.ds(g * SUBLANES, SUBLANES)]  # (8, 128)
        off8 = jax.lax.slice_in_dim(rw, LANES - 2, LANES - 1, axis=1)
        cnt8 = jax.lax.slice_in_dim(rw, LANES - 1, LANES, axis=1)
        row = jnp.where(iota_l < LANES - 2, rw, 0)

        # bit-mask to the row's true bit count (MSB-first words: word w
        # keeps its top (cnt - 32w) bits)
        cw = cnt8 >> 5
        rem = (cnt8 & 31).astype(u32)
        partial = pltpu.bitcast(
            (u32(0xFFFFFFFF) << u32(1)) << (u32(31) - rem), jnp.int32
        )
        mask = jnp.where(
            iota_l < cw, -1, jnp.where(iota_l == cw, partial, 0)
        )
        row = row & mask

        # bit-rotate to the output alignment r = d & 31 (MSB-first: the
        # whole row shifts RIGHT by r, each word pulling spill from its
        # predecessor)
        d = off8 - k0
        r = (d & 31).astype(u32)
        cur = pltpu.bitcast(row, u32)
        prev = jnp.where(
            iota_l == 0, 0, pltpu.bitcast(jnp.roll(row, 1, axis=1), u32)
        )
        shifted = (cur >> r) | ((prev << u32(1)) << (u32(31) - r))

        # lane-roll to the output word offset; split across the two frames
        q = d >> 5
        qm = q & (LANES - 1)
        f = q >> 7
        idx = (iota_l - qm) & (LANES - 1)
        rolled = pltpu.bitcast(
            jnp.take_along_axis(shifted, idx, axis=1), jnp.int32
        )
        lo = jnp.where(iota_l >= qm, rolled, 0)
        hi = rolled - lo

        # dynamic frame window: rows are ordered, so the group spans
        # [f0, f0 + w_f) with f0 prefetched; frames outside [0, n_frames)
        # belong to neighbor chunks, which see these rows in their own
        # windows
        f0 = jnp.clip(gf0_ref[g_base + g] - f_base, 0, n_frames - w_f)
        frames = []
        for wf in range(w_f):
            af = f0 + wf
            sel = jnp.where(f == af, lo, 0) + jnp.where(f == af - 1, hi, 0)
            frames.append(jnp.sum(sel, axis=0, keepdims=True))
        contrib = jnp.concatenate(frames, axis=0)
        blk = out_ref[pl.ds(f0, w_f)]
        out_ref[pl.ds(f0, w_f)] = blk | contrib
        return 0

    jax.lax.fori_loop(0, ng_ref[c], group, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("s_cap", "chunk_bits", "n_chunks", "w_f", "interpret"),
)
def _place_bits(rows, bases, ngroups, gf0, *, s_cap, chunk_bits, n_chunks,
                w_f, interpret=False):
    """One dispatch over chunks; chunk c covers output bits
    [c*chunk_bits, (c+1)*chunk_bits) and DMAs rows [bases[c], +s_cap) into
    VMEM.  ``gf0[G]``: absolute output frame of global group G's first
    row.  Returns (n_chunks * chunk_bits//4096, 128) int32 MSB-first
    output words."""
    assert chunk_bits % (LANES * 32) == 0
    n_frames = chunk_bits // (LANES * 32)
    assert w_f <= n_frames
    kern = functools.partial(
        _place_bits_kernel, s_cap=s_cap, n_frames=n_frames, w_f=w_f,
        chunk_bits=chunk_bits,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (n_frames, LANES), lambda c, b, n, f: (c, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((s_cap, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks * n_frames, LANES), jnp.int32
        ),
        interpret=interpret,
    )(bases, ngroups, gf0, rows)


# ----------------------------------------------------------------------
# Top level: one jitted dispatch for the whole block group
# ----------------------------------------------------------------------
def _geometry(min_len, max_len, w_pad_bits):
    """Static placement geometry from the TABLE alone (no host sync): the
    worst-case rows-per-chunk window from the shortest codeword."""
    min_row_bits = ROW_BYTES * max(min_len, 1)
    band_cap = _round_up(_cdiv(TILE_BITS, min_row_bits) + 2, SUBLANES)
    chunk_bits = min(_CHUNK_BITS_MAX, _round_up(w_pad_bits, TILE_BITS))
    while True:
        s_cap = _round_up(
            _cdiv(chunk_bits, min_row_bits) + band_cap + SUBLANES, SUBLANES
        )
        if s_cap <= _WIN_BUDGET_ROWS or chunk_bits <= TILE_BITS:
            break
        chunk_bits >>= 1
    if s_cap > _WIN_BUDGET_ROWS:
        raise ValueError(
            f"placement window {s_cap} rows exceeds the VMEM budget"
        )
    return chunk_bits, s_cap


@functools.partial(
    jax.jit,
    static_argnames=(
        "seg_bits", "max_words", "n_segs", "min_len", "max_len", "interpret"
    ),
)
def encode_blocks_pallas(
    blocks: jnp.ndarray,
    enc_tabs,
    *,
    seg_bits: int,
    max_words: int,
    n_segs: int,
    min_len: int,
    max_len: int,
    interpret: bool = False,
):
    """Encode (G, B) uint8 blocks, fully on device, ONE dispatch.

    Bit-identical to `jax.vmap(encode_block)` (pinned by tests): returns
    (words (G, max_words+1) uint32, total_bits (G,) int32,
    gaps (G, n_segs) int32, counts (G, n_segs) int32).

    Requirements: B % ROW_BYTES == 0; max_words >= ceil(total_bits/32) per
    block; 1 <= min_len <= max_len <= 16 bound the table's codeword
    lengths; seg_bits a power of two >= 64.  The caller bounds the group so
    G * round_up(max_words+1, 1024) * 32 < 2**31 (int32 bit offsets).
    """
    g, b = blocks.shape
    assert b % ROW_BYTES == 0, "pad the block to ROW_BYTES"
    cap_pairs = _cdiv(ROW_BYTES * max_len, 64)
    cap_words = 2 * cap_pairs
    assert cap_words <= 126 - 2, "max_len too large for one placement row"
    seg_shift = seg_bits.bit_length() - 1
    assert (1 << seg_shift) == seg_bits
    n_slots = ((seg_bits - 1 + cap_words * 32 - 1) >> seg_shift) + 1

    n_rows_b = b // ROW_BYTES  # rows per block
    n_rows = g * n_rows_b
    tiles = _cdiv(n_rows, TILE_ROWS)
    n_rows_p = tiles * TILE_ROWS

    # ---- data relayout: row r's words across the lane grid --------------
    # native little-endian u32 view (kernel A extracts bytes LSB-first), so
    # the whole prep is one pad + the XLU relayout kernel — the XLA
    # byteswap+transpose form cost 28.75 ms/64 MB (genc_split2.log)
    w = jax.lax.bitcast_convert_type(
        blocks.reshape(-1, 4), jnp.uint32
    ).reshape(-1)
    arr = jnp.zeros((n_rows_p, ROW_WORDS), jnp.int32)
    arr = arr.at[:n_rows].set(
        jax.lax.bitcast_convert_type(w, jnp.int32).reshape(
            n_rows, ROW_WORDS
        )
    )
    data3 = _relayout(arr, tiles, interpret=interpret)

    # ---- kernel A: row prepack -----------------------------------------
    kern_a = functools.partial(
        _row_pack_kernel, cap_pairs=cap_pairs, min_len=min_len,
        max_len=max_len,
    )
    tabspec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    pay, bits3, starts3 = pl.pallas_call(
        kern_a,
        grid=(tiles,),
        in_specs=[
            tabspec,
            tabspec,
            pl.BlockSpec((ROW_WORDS, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cap_words, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * ROW_WORDS, SUBLANES, LANES),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (cap_words, tiles * SUBLANES, LANES), jnp.int32
            ),
            jax.ShapeDtypeStruct((tiles * SUBLANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct(
                (2 * ROW_WORDS, tiles * SUBLANES, LANES), jnp.int32
            ),
        ],
        interpret=interpret,
    )(enc_tabs.lo, enc_tabs.hi, data3)

    # ---- XLA glue: absolute row offsets (O(n_rows)) --------------------
    row_iota = jnp.arange(n_rows_p, dtype=jnp.int32)
    real = row_iota < n_rows
    bits_r = jnp.where(real, bits3.reshape(-1), 0)
    w_pad = _round_up(max_words + 1, OUT_TILE_WORDS)
    block_of = jnp.minimum(row_iota // n_rows_b, g - 1)
    # per-block cumsum: real rows partition exactly into g blocks of
    # n_rows_b; pad rows sit only past the last block
    bits_blk = bits_r[:n_rows].reshape(g, n_rows_b)
    ends_blk = jnp.cumsum(bits_blk, axis=1, dtype=jnp.int32)
    total_bits = ends_blk[:, -1]
    s_local = jnp.zeros(n_rows_p, jnp.int32).at[:n_rows].set(
        (ends_blk - bits_blk).reshape(-1)
    )
    s_abs = block_of * (w_pad * 32) + s_local  # global bit offset

    # ---- kernel B: per-row segment slots -------------------------------
    kern_b = functools.partial(
        _row_meta_kernel, n_slots=n_slots, seg_shift=seg_shift
    )
    s_abs3 = s_abs.reshape(tiles * SUBLANES, LANES)
    cnt_s, first_s = pl.pallas_call(
        kern_b,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((2 * ROW_WORDS, SUBLANES, LANES),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_slots, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_slots, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_slots, tiles * SUBLANES, LANES),
                                 jnp.int32),
            jax.ShapeDtypeStruct((n_slots, tiles * SUBLANES, LANES),
                                 jnp.int32),
        ],
        interpret=interpret,
    )(starts3, s_abs3)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    cnt_s = jnp.where(real[None], cnt_s.reshape(n_slots, -1), 0)
    first_s = jnp.where(real[None], first_s.reshape(n_slots, -1), big)

    # ---- segment metadata: sorted segment ops over 3*n_rows ------------
    # global segment id: blocks stack as disjoint n_segs ranges
    sid0 = block_of * n_segs + (s_local >> seg_shift)
    num = g * n_segs
    counts = jnp.zeros(num, jnp.int32)
    firsts = jnp.full(num, big, jnp.int32)
    for k in range(n_slots):
        counts = counts + jax.ops.segment_sum(
            cnt_s[k], sid0 + k, num_segments=num, indices_are_sorted=True
        )
        # firsts are global bit offsets; convert to block-local
        fk = jnp.where(
            first_s[k] == big, big, first_s[k] - block_of * (w_pad * 32)
        )
        firsts = jnp.minimum(
            firsts,
            jax.ops.segment_min(
                fk, sid0 + k, num_segments=num, indices_are_sorted=True
            ),
        )
    counts = counts.reshape(g, n_segs)
    firsts = firsts.reshape(g, n_segs)
    bounds = jnp.arange(n_segs, dtype=jnp.int32) * seg_bits
    gaps = jnp.where(
        bounds[None] < total_bits[:, None],
        jnp.minimum(firsts, total_bits[:, None]) - bounds[None],
        0,
    )

    # ---- placement rows + per-chunk plan -------------------------------
    from .compact_kernel import rows_assemble_pallas

    chunk_bits, s_cap = _geometry(min_len, max_len, g * w_pad * 32)
    s_rows = _round_up(_round_up(n_rows_p, SUBLANES) + s_cap, LANES)
    # pad rows (trailing zero-filled lanes AND the assembly's zero fill
    # beyond n_rows_p) must carry a LARGE offset sentinel: the chunk-shared
    # kernel anchors each group's frame window at min(f) over its rows, and
    # a stale-0 offset would drag a tail group's window to frame 0
    big30 = jnp.int32(1 << 30)
    ext = s_rows - n_rows_p
    s_abs_asm = jnp.concatenate(
        [jnp.where(real, s_abs, big30), jnp.full(ext, big30, jnp.int32)]
    )
    rows = rows_assemble_pallas(
        jnp.pad(pay.reshape(cap_words, n_rows_p), ((0, 0), (0, ext))),
        s_abs_asm,
        jnp.concatenate([bits_r, jnp.zeros(ext, jnp.int32)]),
        s_rows=s_rows,
        interpret=interpret,
    )

    out_bits = g * w_pad * 32
    n_chunks = _cdiv(out_bits, chunk_bits)
    # pad rows mask to `big` at the END of both search arrays, preserving
    # sortedness (per-block offsets are monotone; block bases increase)
    ends_abs = jnp.where(real, s_abs + bits_r, big)
    s_abs_srch = jnp.where(real, s_abs, big)
    chunk_lo = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_bits
    sc0 = jnp.searchsorted(ends_abs, chunk_lo, side="right").astype(jnp.int32)
    sc1 = jnp.searchsorted(
        s_abs_srch,
        jnp.minimum(chunk_lo + chunk_bits, out_bits),
        side="left",
    ).astype(jnp.int32)
    bases = jnp.minimum(sc0, s_rows - s_cap) & ~7
    ngroups = jnp.clip(
        -(-(sc1 - bases) // SUBLANES), 0, s_cap // SUBLANES
    )
    w_f = (SUBLANES * cap_words * 32) // (LANES * 32) + 2
    assert w_f * LANES * 32 <= chunk_bits
    gf0 = s_abs_asm[::SUBLANES] >> 12  # absolute 4096-bit frame per group

    frames = _place_bits(
        rows, bases, ngroups, gf0, s_cap=s_cap, chunk_bits=chunk_bits,
        n_chunks=n_chunks, w_f=w_f, interpret=interpret,
    )
    n_words_out = out_bits // 32
    words = jax.lax.bitcast_convert_type(
        frames.reshape(-1)[:n_words_out].reshape(g, w_pad), jnp.uint32
    )[:, : max_words + 1]
    return words, total_bits, gaps, counts
