"""Device-side ragged output placement for gap-array / self-sync decode.

Bridges `decode_ranks_pallas` (padded per-segment rank matrix) to the
`ragged_concat_pallas` kernel: the role of the reference's on-GPU placement
phase (`Huffman_coding_Gap_arrays/decoder/src/decoder.cu:571-729`), with the
prefix sums and band certification done host-side from the exact per-segment
counts (already host data in every caller) and zero O(payload) device<->host
traffic.

The kernel works on one output *chunk* (<= CHUNK_OUT_BYTES) at a time so the
segment-row window stays within VMEM whatever the block size; chunks slice a
shared device row array and run the same compiled kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pallas.compact_kernel import (
    CNT_LANE,
    MAX_ROW_BYTES,
    OFF_LANE,
    TILE_BYTES,
    plan_tiles,
    ragged_concat_pallas,
)

__all__ = ["compact_ranks_device", "CHUNK_OUT_BYTES", "MAX_ROW_BYTES"]

CHUNK_OUT_BYTES = 1 << 21  # 2 MiB of output per kernel invocation (maximum)

# VMEM footprint per segment of window: rows (128 lanes int32) plus offs and
# counts, whose (s_cap, 1) blocks Mosaic lane-pads to 128 — 3 * 512 B.  Budget
# 10 MB of the 16 MB/core for the window (out blocks, symbol tables, and
# rotate/roll temporaries take the rest); high-entropy data (short segments
# per output byte) shrinks the chunk to fit instead of blowing the budget.
_SEG_WINDOW_BYTES = 3 * 512
_S_CAP_MAX = ((10 << 20) // _SEG_WINDOW_BYTES) & ~7


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rows_lsb(packed: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(out_rows, S) MSB-first packed ranks -> (S, out_rows) LSB-first."""
    del interpret
    x = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    swapped = (
        (x << 24)
        | ((x & jnp.uint32(0xFF00)) << 8)
        | ((x >> 8) & jnp.uint32(0xFF00))
        | (x >> 24)
    )
    return jax.lax.bitcast_convert_type(swapped, jnp.int32).T


def _sym_tiles(symtab: np.ndarray):
    full = np.zeros(256, np.int32)
    full[: symtab.size] = symtab
    lo = jnp.asarray(np.tile(full[:128][None], (8, 1)))
    hi = jnp.asarray(np.tile(full[128:][None], (8, 1)))
    return lo, hi


def compact_ranks_device(
    packed: jnp.ndarray,
    counts: np.ndarray,
    symtab: np.ndarray,
    out_size: int,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Place + permute decoded ranks into the final byte stream, on device.

    Args:
      packed: (out_rows, n_segs_p) int32 from `decode_ranks_pallas` (4 ranks
        per word, MSB-first).
      counts: (n_segs,) HOST symbol counts (sum == out_size).
      symtab: (num_symbols,) canonical rank -> symbol.
      out_size: total output bytes.

    Returns a device (out_size,) uint8 array.  Raises ValueError when a
    segment exceeds MAX_ROW_BYTES or the certified segment window cannot fit
    VMEM at any chunk size (caller falls back to the XLA path).
    """
    counts = np.asarray(counts, np.int64)
    n_segs = counts.size
    if out_size == 0 or n_segs == 0:
        return jnp.zeros(out_size, jnp.uint8)
    if int(counts.max(initial=0)) > MAX_ROW_BYTES:
        raise ValueError(
            f"segment count exceeds {MAX_ROW_BYTES} bytes; use the XLA path"
        )
    if packed.shape[0] > OFF_LANE:
        # lanes OFF_LANE/CNT_LANE carry the per-segment metadata; the
        # MAX_ROW_BYTES gate bounds real rank rows to 120 lanes anyway
        raise ValueError("rank matrix would overlap the metadata lanes")

    ends = np.cumsum(counts)
    offs = ends - counts
    assert int(ends[-1]) == out_size, (int(ends[-1]), out_size)

    s_first_all, band = plan_tiles(counts, out_size)

    # chunk the output; certify a shared segment-window size, shrinking the
    # chunk until the window fits the VMEM budget (many tiny segments per
    # output byte widen the window; halving keeps chunk sizes uniform so one
    # kernel compile covers every full chunk)
    chunk_bytes = CHUNK_OUT_BYTES
    while True:
        n_chunks = _cdiv(out_size, chunk_bytes)
        sc0 = np.searchsorted(ends, np.arange(n_chunks) * chunk_bytes,
                              side="right").astype(np.int64)
        sc1 = np.searchsorted(
            offs, np.minimum((np.arange(n_chunks) + 1) * chunk_bytes,
                             out_size), side="left"
        ).astype(np.int64)
        s_cap = _round_up(int(np.max(sc1 - sc0)) + band, 8)
        if s_cap <= _S_CAP_MAX or chunk_bytes <= TILE_BYTES:
            break
        chunk_bytes >>= 1
    if s_cap > _S_CAP_MAX:
        raise ValueError(
            f"segment window {s_cap} exceeds the VMEM budget ({_S_CAP_MAX}); "
            "use the XLA path"
        )
    rows = _rows_lsb(packed)  # (n_segs_p, out_rows)
    s_pad = _round_up(max(n_segs, 1), 8) + s_cap
    r0 = min(rows.shape[0], s_pad)

    symlo, symhi = _sym_tiles(np.asarray(symtab, np.uint8))

    offs_pad = np.full(s_pad, out_size, np.int64)
    offs_pad[:n_segs] = offs
    counts_pad = np.zeros(s_pad, np.int64)
    counts_pad[:n_segs] = counts

    # rank rows with the per-segment metadata embedded in the spare lanes
    # (one array -> one window DMA per chunk in the kernel)
    rows = (
        jnp.zeros((s_pad, 128), jnp.int32)
        .at[:r0, : rows.shape[1]].set(rows[:r0])
        .at[:, OFF_LANE].set(jnp.asarray(offs_pad.astype(np.int32)))
        .at[:, CNT_LANE].set(jnp.asarray(counts_pad.astype(np.int32)))
    )

    # ONE dispatch over a (chunk, tile) grid: the kernel DMAs each chunk's
    # certified segment window from HBM at the prefetched base row.  (The
    # per-chunk pallas_call form paid the host tunnel's ~29 ms dispatch
    # floor once per 2 MiB of output — ~0.1 GB/s on 64 MB blocks.)
    tpc = chunk_bytes // TILE_BYTES
    n_tiles_total = _cdiv(out_size, TILE_BYTES)
    bases = np.minimum(sc0, s_pad - s_cap).astype(np.int32)
    s0_rel = np.zeros(n_chunks * tpc, np.int32)
    tile_chunk = np.minimum(
        np.arange(n_tiles_total) // tpc, n_chunks - 1
    )
    s0_rel[:n_tiles_total] = np.clip(
        s_first_all.astype(np.int64) - bases[tile_chunk],
        0, s_cap - band,
    ).astype(np.int32)

    out_t = ragged_concat_pallas(
        rows,
        jnp.asarray(bases),
        jnp.asarray(s0_rel),
        symlo,
        symhi,
        band=band,
        s_cap=s_cap,
        chunk_bytes=chunk_bytes,
        n_tiles=n_tiles_total,
        interpret=interpret,
    )
    words = out_t[:n_tiles_total].reshape(-1)
    out = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(-1)
    return out[:out_size]
