"""Device-side ragged output placement for gap-array / self-sync decode.

Bridges `decode_ranks_pallas` (padded per-segment rank matrix) to the
`ragged_concat_pallas` kernel: the role of the reference's on-GPU placement
phase (`Huffman_coding_Gap_arrays/decoder/src/decoder.cu:571-729`), with the
prefix sums and band certification done host-side from the exact per-segment
counts (already host data in every caller) and zero O(payload) device<->host
traffic.

Split into a host *plan* (`plan_compact`: band certification, chunking, the
per-tile window starts — pure NumPy over the counts) and a traceable device
*apply* (`compact_apply`: LSB transpose, row assembly, the placement kernel)
so callers can fuse the apply with the ranks kernel under ONE jit — through
the TPU tunnel every eager staging op costs the ~29 ms dispatch floor, which
is what capped the r03 gap decode at 0.485 GB/s (4+ floors per block).

The kernel works on one output *chunk* (<= CHUNK_OUT_BYTES) at a time so the
segment-row window stays within VMEM whatever the block size; chunks slice a
shared device row array and run the same compiled kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .pallas.compact_kernel import (
    CNT_LANE,
    MAX_ROW_BYTES,
    OFF_LANE,
    SUBLANES,
    TILE_BYTES,
    plan_tiles,
    ragged_concat_pallas,
)

__all__ = [
    "compact_ranks_device",
    "plan_compact",
    "compact_apply",
    "CompactPlan",
    "CHUNK_OUT_BYTES",
    "MAX_ROW_BYTES",
]

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


def _rows_lsb(packed: jnp.ndarray) -> jnp.ndarray:
    """(out_rows, S) LSB-first packed ranks -> (S, out_rows) segment rows.

    The ranks kernel packs little-endian (stream order == byte order), so
    this is a pure transpose."""
    return packed.T


def _sym_tiles(symtab: np.ndarray):
    full = np.zeros(256, np.int32)
    full[: symtab.size] = symtab
    lo = jnp.asarray(np.tile(full[:128][None], (8, 1)))
    hi = jnp.asarray(np.tile(full[128:][None], (8, 1)))
    return lo, hi


class CompactStatics(NamedTuple):
    """Hashable shape/config half of a plan — a static jit argument."""

    out_size: int
    n_segs: int
    band: int
    s_cap: int
    s_pad: int
    chunk_bytes: int
    n_tiles: int
    # frame-window width for the chunk-shared kernel (0: infeasible at this
    # chunk size — the banded kernel is the only option)
    w_f: int = 0


class CompactPlan(NamedTuple):
    """Host-certified placement plan (statics + small index arrays)."""

    statics: CompactStatics
    bases: np.ndarray  # (n_chunks,) int32 window base row per chunk
    s0_rel: np.ndarray  # (n_chunks * tpc,) int32 window-relative band starts
    ngroups: np.ndarray | None = None  # (n_chunks,) 8-row groups per window


def plan_compact(counts: np.ndarray, out_size: int) -> CompactPlan:
    """Certify the banded placement for one block/group (host side).

    counts: (n_segs,) exact per-segment byte counts, sum == out_size.
    Raises ValueError when a segment exceeds MAX_ROW_BYTES or the certified
    segment window cannot fit VMEM at any chunk size (caller falls back to
    the XLA path).
    """
    counts = np.asarray(counts, np.int64)
    n_segs = counts.size
    if int(counts.max(initial=0)) > MAX_ROW_BYTES:
        raise ValueError(
            f"segment count exceeds {MAX_ROW_BYTES} bytes; use the XLA path"
        )
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
        # +8: window bases are aligned DOWN to 8 rows (the chunk-shared
        # kernel addresses whole groups), widening the window by < 8 rows
        s_cap = _round_up(int(np.max(sc1 - sc0)) + band, 8) + 8
        if s_cap <= _S_CAP_MAX or chunk_bytes <= TILE_BYTES:
            break
        chunk_bytes >>= 1
    if s_cap > _S_CAP_MAX:
        raise ValueError(
            f"segment window {s_cap} exceeds the VMEM budget ({_S_CAP_MAX}); "
            "use the XLA path"
        )
    s_pad = _round_up(max(n_segs, 1), 8) + s_cap

    tpc = chunk_bytes // TILE_BYTES
    n_tiles = _cdiv(out_size, TILE_BYTES)
    bases = (np.minimum(sc0, s_pad - s_cap) & ~7).astype(np.int32)
    s0_rel = np.zeros(n_chunks * tpc, np.int32)
    tile_chunk = np.minimum(np.arange(n_tiles) // tpc, n_chunks - 1)
    s0_rel[:n_tiles] = np.clip(
        s_first_all.astype(np.int64) - bases[tile_chunk],
        0, s_cap - band,
    ).astype(np.int32)
    # chunk-shared kernel inputs: 8-row groups per window + the static
    # frame-window bound (one group spans <= 8*max_cnt contiguous output
    # bytes from an arbitrary in-frame start)
    ngroups = np.clip(
        -(-(sc1 - bases) // SUBLANES), 0, s_cap // SUBLANES
    ).astype(np.int32)
    w_f = int(8 * counts.max(initial=0)) // 512 + 2
    if w_f > chunk_bytes // 512:
        w_f = 0  # infeasible window at this chunk size: banded only
    return CompactPlan(
        statics=CompactStatics(
            out_size=int(out_size), n_segs=n_segs, band=band, s_cap=s_cap,
            s_pad=s_pad, chunk_bytes=chunk_bytes, n_tiles=n_tiles, w_f=w_f,
        ),
        bases=bases,
        s0_rel=s0_rel,
        ngroups=ngroups,
    )


def compact_plan_arrays(counts_dev: jnp.ndarray, *, statics: CompactStatics):
    """Device (traceable) form of the plan's index arrays.

    For pipelines whose counts are born on device (self-sync decode), the
    host needs only the SCALAR half of the plan (band / s_cap / chunk size —
    see `compact_scalars`); the per-chunk window bases and per-tile band
    starts are recomputed here from the device counts so no O(n_segs)
    metadata ever crosses the link.  Bit-identical to `plan_compact`'s
    NumPy arrays for the same counts/statics (pinned by tests).
    """
    s = statics
    cnt = counts_dev[: s.n_segs].astype(jnp.int32)
    ends = jnp.cumsum(cnt, dtype=jnp.int32)
    tpc = s.chunk_bytes // TILE_BYTES
    n_chunks = _cdiv(s.out_size, s.chunk_bytes)
    sf, sl = _tile_prefix_arrays(ends, n_chunks * tpc)
    s_first = sf[: s.n_tiles].astype(jnp.int32)
    sc0 = sf[::tpc].astype(jnp.int32)
    bases = jnp.minimum(sc0, s.s_pad - s.s_cap) & ~7
    tile_chunk = jnp.minimum(
        jnp.arange(s.n_tiles, dtype=jnp.int32) // tpc, n_chunks - 1
    )
    s0 = jnp.clip(s_first - bases[tile_chunk], 0, s.s_cap - s.band)
    s0_rel = jnp.zeros(n_chunks * tpc, jnp.int32).at[: s.n_tiles].set(s0)
    sc1 = sl.reshape(n_chunks, tpc)[:, -1].astype(jnp.int32)
    ngroups = jnp.clip(
        -(-(sc1 - bases) // SUBLANES), 0, s.s_cap // SUBLANES
    )
    return bases, s0_rel, ngroups


def _tile_prefix_arrays(ends: jnp.ndarray, n_tiles_cap: int):
    """Exact searchsorted replacements via bin counts + cumsums (device).

    Returns (sf, sl): sf[t] = # segments with end <= t*TILE_BYTES
    (== searchsorted(ends, lo_t, 'right')) and sl[t] = # segments with
    off < (t+1)*TILE_BYTES (== searchsorted(offs, hi_t, 'left') for hi_t
    within the stream).  Each per-element searchsorted step is a ~30 ns
    gather on this chip (16K tile queries x ~20 steps x 2 arrays measured
    ~16 ms inside `compact_scalars`); the two sorted segment-sums +
    n_tiles-cumsums here are ~1 ms at the same shapes.  Only divergence
    from searchsorted: zero-length segments ending at bit 0 are not
    counted by sf[0] (impossible for real streams — the first segment of a
    non-empty block has content)."""
    cnt = ends - jnp.concatenate([jnp.zeros(1, ends.dtype), ends[:-1]])
    offs = ends - cnt
    out_size = ends[-1] if ends.shape[0] else jnp.int32(0)
    ones = jnp.ones_like(ends)
    # the searchsorted form queried min(hi, out_size): zero-length TRAILING
    # segments (off == out_size — e.g. self-sync's power-of-two subsequence
    # padding) must not count toward any window, or the last chunk's
    # certified width inflates by the whole pad-tail length
    off_idx = jnp.where(offs < out_size, offs // TILE_BYTES, n_tiles_cap)
    offbin = jax.ops.segment_sum(
        ones, off_idx, num_segments=n_tiles_cap, indices_are_sorted=True
    )
    endbin = jax.ops.segment_sum(
        ones, (ends - 1) // TILE_BYTES, num_segments=n_tiles_cap,
        indices_are_sorted=True,
    )
    sl = jnp.cumsum(offbin)
    ecum = jnp.cumsum(endbin)
    # zero-length segments ENDING at bit 0 (leading empties) fall off the
    # (end-1) bin at index -1; searchsorted('right') counts them at every
    # tile, so add them back uniformly
    nz0 = jnp.sum((ends == 0).astype(ones.dtype))
    sf = jnp.concatenate([jnp.zeros(1, ecum.dtype), ecum[:-1]]) + nz0
    return sf, sl


def compact_scalars(counts_dev: jnp.ndarray, out_cap_bytes: int):
    """Device (traceable) scalar half of the placement plan.

    Returns a small int32 vector [band_raw, cap_raw(chunk_0), ...] — the
    maximum per-4KB-tile segment overlap and, per candidate chunk size
    (CHUNK_OUT_BYTES halving down to TILE_BYTES), the maximum per-chunk
    segment-window width.  The caller pulls this (a dozen ints), picks the
    largest feasible chunk exactly like `plan_compact`, and builds
    `CompactStatics` host-side.  Tile/chunk grids are sized by
    ``out_cap_bytes`` (a static upper bound on the output size); queries
    past the true output see zero-width windows and do not perturb the max.
    """
    cnt = counts_dev.astype(jnp.int32)
    ends = jnp.cumsum(cnt, dtype=jnp.int32)
    n_tiles_cap = _cdiv(max(out_cap_bytes, 1), TILE_BYTES)
    sf, sl = _tile_prefix_arrays(ends, n_tiles_cap)
    vals = [jnp.maximum(jnp.max(sl - sf), 1)]
    chunk = CHUNK_OUT_BYTES
    while True:
        tpc = chunk // TILE_BYTES
        n_chunks_cap = _cdiv(n_tiles_cap, tpc)
        pad = n_chunks_cap * tpc - n_tiles_cap
        sfp = jnp.pad(sf, (0, pad))  # grid pads: zero-width windows
        slp = jnp.pad(sl, (0, pad), constant_values=sl[-1] if sl.shape[0] else 0)
        sc0 = sfp.reshape(n_chunks_cap, tpc)[:, 0]
        sc1 = slp.reshape(n_chunks_cap, tpc)[:, -1]
        vals.append(jnp.max(sc1 - sc0))
        if chunk <= TILE_BYTES:
            break
        chunk >>= 1
    return jnp.stack(vals).astype(jnp.int32)


def pick_chunk(scalars: np.ndarray):
    """Host half of the device plan: given `compact_scalars` output, pick
    the largest chunk size whose certified window fits the VMEM budget.

    Returns (band, s_cap, chunk_bytes) or raises ValueError (caller falls
    back to host compaction) — the same decision rule as `plan_compact`.
    """
    band_raw = int(scalars[0])
    band = max(_round_up(band_raw, SUBLANES), SUBLANES)
    chunk = CHUNK_OUT_BYTES
    for cap_raw in scalars[1:]:
        s_cap = _round_up(int(cap_raw) + band, 8) + 8  # 8-aligned bases
        if s_cap <= _S_CAP_MAX or chunk <= TILE_BYTES:
            break
        chunk >>= 1
    if s_cap > _S_CAP_MAX:
        raise ValueError(
            f"segment window {s_cap} exceeds the VMEM budget ({_S_CAP_MAX})"
        )
    return band, s_cap, chunk


def compact_apply(
    packed: jnp.ndarray,
    counts_dev: jnp.ndarray,
    bases: jnp.ndarray,
    s0_rel: jnp.ndarray,
    symlo: jnp.ndarray,
    symhi: jnp.ndarray,
    *,
    statics: CompactStatics,
    tps: int | None = None,
    ngroups: jnp.ndarray | None = None,
    chunked: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Traceable device half of the placement: compose under the caller's jit.

    Args:
      packed: (out_rows, n_segs_p) int32 from `decode_ranks_pallas` (4 ranks
        per word, LSB-first); out_rows <= 120.
      counts_dev: (n_segs,) int32 device copy of the planned counts.
      bases/s0_rel: device copies of plan.bases / plan.s0_rel.
      symlo/symhi: (8, 128) int32 rank->symbol lane tables (`_sym_tiles`).
      ngroups/chunked: with ``chunked=True`` (requires statics.w_f > 0 and
        plan.ngroups) the chunk-shared kernel replaces the banded one:
        each window row group is processed once per chunk instead of once
        per overlapping 4 KB tile.

    Returns a device (out_size,) uint8 array.
    """
    out_rows = int(packed.shape[0])
    if out_rows > 126:
        # 2 lanes carry the per-segment metadata; the MAX_ROW_BYTES gate
        # bounds real rank rows to 120 lanes anyway
        raise ValueError("rank matrix would overlap the metadata lanes")
    plan = statics
    n_segs, s_pad = plan.n_segs, plan.s_pad
    use_chunked = chunked and plan.w_f > 0 and ngroups is not None
    # per-segment output offsets from the device counts (cumsum): beyond
    # the real segments counts are 0, so rows there mask to nothing
    # wherever their (stale) offsets land
    s_p = int(packed.shape[1])
    cnt_pad = jnp.zeros(s_p, jnp.int32).at[:n_segs].set(
        counts_dev[:n_segs].astype(jnp.int32)
    )
    ends = jnp.cumsum(cnt_pad, dtype=jnp.int32)
    off_pad = ends - cnt_pad

    # rank rows with the per-segment metadata in the top two lanes, built
    # by the XLU-transpose assembly kernel — the XLA transpose + pad +
    # metadata-update form cost ~5 ms of a 16 ms 64 MB decode.  (Rows stay
    # 128 lanes wide: Mosaic requires window-DMA slices lane-aligned to
    # the (1, 128) tiling, so a narrow array cannot be DMA'd.)
    from .pallas.compact_kernel import (
        ragged_concat_chunked_pallas,
        rows_assemble_pallas,
    )

    s_rows = _round_up(max(s_pad, s_p), 128)
    if use_chunked:
        # the chunk kernel anchors each group's frame window at min(f) over
        # its rows, so zero-filled padding rows (offset 0) beyond s_p must
        # carry a LARGE offset sentinel instead — a stale-0 offset would
        # drag a tail group's window to frame 0 and drop its real rows
        big = jnp.int32(1 << 30)
        ext = s_rows - s_p
        packed = jnp.pad(packed, ((0, 0), (0, ext)))
        off_pad = jnp.concatenate([off_pad, jnp.full(ext, big, jnp.int32)])
        cnt_pad = jnp.concatenate([cnt_pad, jnp.zeros(ext, jnp.int32)])
    rows = rows_assemble_pallas(
        packed, off_pad, cnt_pad, s_rows=s_rows, interpret=interpret
    )

    if use_chunked:
        n_chunks = _cdiv(plan.out_size, plan.chunk_bytes)
        # absolute output frame (512 B) of each global 8-row group's first
        # row — prefetched so the kernel's frame base never touches the
        # serial RMW chain; sentinel offsets (pad rows) clip in-kernel
        gf0 = off_pad[::SUBLANES] >> 9
        frames = ragged_concat_chunked_pallas(
            rows,
            bases,
            ngroups,
            gf0,
            symlo,
            symhi,
            s_cap=plan.s_cap,
            chunk_bytes=plan.chunk_bytes,
            n_chunks=n_chunks,
            w_f=plan.w_f,
            interpret=interpret,
        )
        words = frames.reshape(-1)
    else:
        out_t = ragged_concat_pallas(
            rows,
            bases,
            s0_rel,
            symlo,
            symhi,
            band=plan.band,
            s_cap=plan.s_cap,
            chunk_bytes=plan.chunk_bytes,
            n_tiles=plan.n_tiles,
            tps=tps,
            interpret=interpret,
        )
        words = out_t[: plan.n_tiles].reshape(-1)
    out = jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(-1)
    return out[: plan.out_size]


@functools.partial(
    jax.jit, static_argnames=("statics", "chunked", "interpret")
)
def _compact_jit(packed, counts_dev, bases, s0_rel, ngroups, symlo, symhi, *,
                 statics, chunked, interpret):
    return compact_apply(
        packed, counts_dev, bases, s0_rel, symlo, symhi, statics=statics,
        ngroups=ngroups, chunked=chunked, interpret=interpret,
    )


def compact_ranks_device(
    packed: jnp.ndarray,
    counts: np.ndarray,
    symtab: np.ndarray,
    out_size: int,
    *,
    chunked: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Place + permute decoded ranks into the final byte stream, on device.

    One-call form (plan + single jitted apply = ONE device dispatch).  For
    zero extra dispatches fuse `compact_apply` with the producer under one
    jit instead (see `decode_kernel.decode_blocks_pallas`).

    Args:
      packed: (out_rows, n_segs_p) int32 from `decode_ranks_pallas` (4 ranks
        per word, LSB-first).
      counts: (n_segs,) HOST symbol counts (sum == out_size).
      symtab: (num_symbols,) canonical rank -> symbol.
      out_size: total output bytes.

    Returns a device (out_size,) uint8 array.  Raises ValueError when a
    segment exceeds MAX_ROW_BYTES or the certified segment window cannot fit
    VMEM at any chunk size (caller falls back to the XLA path).
    """
    counts = np.asarray(counts, np.int64)
    if out_size == 0 or counts.size == 0:
        return jnp.zeros(out_size, jnp.uint8)
    plan = plan_compact(counts, out_size)
    symlo, symhi = _sym_tiles(np.asarray(symtab, np.uint8))
    return _compact_jit(
        packed,
        jnp.asarray(counts.astype(np.int32)),
        jnp.asarray(plan.bases),
        jnp.asarray(plan.s0_rel),
        jnp.asarray(plan.ngroups),
        symlo,
        symhi,
        statics=plan.statics,
        chunked=chunked and plan.statics.w_f > 0,
        interpret=interpret,
    )
