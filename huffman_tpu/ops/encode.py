"""Data-parallel encode: gather lengths → prefix-sum bit offsets → vectorized
bit packing, all on device.

TPU-native redesign of the reference's parallel GPU encoder
(`Huffman_coding_Gap_arrays/encoder/src/encoder.cu:142-355`):

- the reference's warp-shuffle block scans + decoupled-lookback inter-block
  scan (`encoder.cu:192-263`) become one ``jnp.cumsum`` — XLA owns the scan;
- the reference's ``atomicOr`` writes at chunk-boundary words
  (`encoder.cu:322-347`) become a *sorted segmented sum*: each codeword
  contributes to at most two u32 units with disjoint bit ranges, so a
  segment-sum over the sorted unit indices is exactly the OR-merge, with no
  atomics and no races by construction;
- the gap array (`encoder.cu:307-312`) and per-segment symbol counts fall out
  of a vectorized ``searchsorted`` of segment boundaries into the offset
  vector, instead of boundary-crossing detection inside the pack loop.

Everything is static-shape: the payload buffer is padded to ``max_words``
(caller-chosen bound) and the true length is returned as ``total_bits``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .tables import DeviceEncTable

__all__ = ["encode_block", "encode_block_fast", "histogram"]


def histogram(data: jnp.ndarray) -> jnp.ndarray:
    """(256,) int32 byte histogram (role of the reference's warp-privatized
    histogram kernels, `encoder/src/encoder.cu:33-140`; on TPU a scatter-add
    that XLA lowers efficiently)."""
    return jnp.zeros(256, jnp.int32).at[data.astype(jnp.int32)].add(1)


@functools.partial(jax.jit, static_argnames=("seg_bits", "max_words", "n_segs"))
def encode_block(
    data: jnp.ndarray,
    enc: DeviceEncTable,
    *,
    seg_bits: int,
    max_words: int,
    n_segs: int,
):
    """Encode one block of bytes into an MSB-first u32 unit stream.

    Args:
      data: (B,) uint8 block.
      enc: device encoder table.
      seg_bits: segment size in bits (power of two).
      max_words: static payload capacity in u32 units; must be >=
        ceil(total_bits/32). The returned buffer has max_words+1 units (one
        zero pad unit, `gpuhd/src/cuhd_input_buffer.cc:13-31` trick).
      n_segs: static segment capacity; must be >= ceil(total_bits/seg_bits).

    Returns:
      words: (max_words+1,) uint32 packed payload (zero beyond total_bits).
      total_bits: () int32 true payload length in bits.
      gaps: (n_segs,) int32; gap[k] = offset in [0,max_len) of the first
        codeword starting in segment k (0 beyond the last segment).
      counts: (n_segs,) int32; codewords starting in segment k.
    """
    data = data.astype(jnp.int32)
    lens = enc.lengths[data]  # (B,) int32
    ends = jnp.cumsum(lens, dtype=jnp.int32)  # inclusive scan
    total_bits = ends[-1]
    offs = ends - lens  # exclusive start bit per codeword

    codes = enc.codes[data]  # (B,) uint32 right-aligned
    left = codes << (32 - lens).astype(jnp.uint32)  # left-justified (lens >= 1)
    sh = (offs & 31).astype(jnp.uint32)
    w0 = offs >> 5
    lo = left >> sh
    # spill into the next unit; == left << (32-sh), 0 when sh == 0
    hi = (left << jnp.uint32(1)) << (jnp.uint32(31) - sh)

    num_units = max_words + 1
    words = jax.ops.segment_sum(
        lo, w0, num_segments=num_units, indices_are_sorted=True
    ) + jax.ops.segment_sum(
        hi, w0 + 1, num_segments=num_units, indices_are_sorted=True
    )
    words = words.astype(jnp.uint32)

    # Per-segment metadata: first codeword start at-or-after each boundary.
    bounds = jnp.arange(n_segs, dtype=jnp.int32) * seg_bits
    idx = jnp.searchsorted(offs, bounds, side="left")
    offs_pad = jnp.concatenate([offs, total_bits[None]])
    gaps = offs_pad[idx] - bounds
    gaps = jnp.where(bounds < total_bits, gaps, 0)
    idx_next = jnp.concatenate([idx[1:], jnp.array([data.shape[0]], idx.dtype)])
    counts = (idx_next - idx).astype(jnp.int32)
    return words, total_bits, gaps.astype(jnp.int32), counts


@functools.partial(
    jax.jit,
    static_argnames=("seg_bits", "max_words", "n_segs", "interpret"),
)
def encode_block_fast(
    data: jnp.ndarray,
    enc_tabs,
    *,
    seg_bits: int,
    max_words: int,
    n_segs: int,
    interpret: bool = False,
):
    """`encode_block` with the gather-free Pallas translation stage.

    Bit-identical contract to `encode_block` (pinned by tests), built for
    TPU: the per-byte (length, code) table GATHERS — ~30 ns/element here,
    ~98% of the XLA encode's 2.4 s/64 MB — become lane-table lookups inside
    `encode_map_pallas`, which also pre-packs each aligned 4-byte group
    into one left-justified 64-bit unit.  Placement then runs at quarter
    density (one cumsum + three sorted segment-sums per GROUP), and the
    segment gap/count metadata comes from segment-min/-sum reductions over
    the per-symbol start bits (no searchsorted, no gathers anywhere).

    Requires ``data.shape[0] % 4096 == 0`` (whole vreg rows); callers fall
    back to `encode_block` otherwise.  ``enc_tabs`` is an `IlsEncTabs`.
    """
    from .pallas.encode_kernel import encode_map_pallas

    b = data.shape[0]
    hi, lo, l4, lens_p = encode_map_pallas(data, enc_tabs, interpret=interpret)
    ends4 = jnp.cumsum(l4, dtype=jnp.int32)
    total_bits = ends4[-1]
    goffs = ends4 - l4

    u32 = jnp.uint32
    sh = (goffs & 31).astype(u32)
    w0 = goffs >> 5
    c0 = hi >> sh
    c1 = ((hi << u32(1)) << (u32(31) - sh)) | (lo >> sh)
    c2 = (lo << u32(1)) << (u32(31) - sh)
    num_units = max_words + 1
    words = (
        jax.ops.segment_sum(c0, w0, num_segments=num_units,
                            indices_are_sorted=True)
        + jax.ops.segment_sum(c1, w0 + 1, num_segments=num_units,
                              indices_are_sorted=True)
        + jax.ops.segment_sum(c2, w0 + 2, num_segments=num_units,
                              indices_are_sorted=True)
    ).astype(u32)

    # per-symbol start bits -> segment metadata, as GROUP-level segment
    # reductions: a 4-byte group is <= 64 bits < seg_bits, so its symbols
    # span at most TWO segments — 2 segment-sums + 2 segment-mins over
    # n/4 elements replace the 8 per-symbol reductions (segment ops cost
    # ~8 ns/element on this chip; this halves the metadata wall)
    l0 = (lens_p >> 15) & 31
    l1 = (lens_p >> 10) & 31
    l2 = (lens_p >> 5) & 31
    shift = seg_bits.bit_length() - 1
    assert (1 << shift) == seg_bits
    bounds = jnp.arange(n_segs, dtype=jnp.int32) * seg_bits
    big = jnp.iinfo(jnp.int32).max

    sid0 = goffs >> shift
    s1 = goffs + l0
    s2 = s1 + l1
    s3 = s2 + l2
    in0_1 = (s1 >> shift) == sid0
    in0_2 = (s2 >> shift) == sid0
    in0_3 = (s3 >> shift) == sid0
    m = 1 + in0_1 + in0_2 + in0_3  # symbols of the group in its first seg
    counts = jax.ops.segment_sum(
        m.astype(jnp.int32), sid0, num_segments=n_segs,
        indices_are_sorted=True,
    ) + jax.ops.segment_sum(
        4 - m.astype(jnp.int32), sid0 + 1, num_segments=n_segs,
        indices_are_sorted=True,
    )
    # first start in a segment: either a group's own start (monotone), or
    # the first crossing symbol of the straddling group before it
    x = jnp.where(
        ~in0_1, s1, jnp.where(~in0_2, s2, jnp.where(~in0_3, s3, big))
    )
    first = jnp.minimum(
        jax.ops.segment_min(
            goffs, sid0, num_segments=n_segs, indices_are_sorted=True
        ),
        jax.ops.segment_min(
            x, sid0 + 1, num_segments=n_segs, indices_are_sorted=True
        ),
    )
    # a start-less final segment (the last codeword straddles its boundary)
    # keeps the reduction identity; encode_block's searchsorted points its
    # gap at total_bits — match that exactly
    gaps = jnp.where(
        bounds < total_bits, jnp.minimum(first, total_bits) - bounds, 0
    )
    return words, total_bits, gaps.astype(jnp.int32), counts
