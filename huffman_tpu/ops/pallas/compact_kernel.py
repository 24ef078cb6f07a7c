"""Pallas TPU ragged-concat (compaction) kernel — device-side output placement.

The gap-array decode pipeline produces, per segment, a padded row of decoded
bytes plus the segment's true symbol count; the final output is the ragged
concatenation of those rows.  The reference places ragged output on the GPU
with prefix sums + per-thread stores and atomicOr for shared boundary words
(`Huffman_coding_Gap_arrays/decoder/src/decoder.cu:571-729`).  A TPU has no
scatter, and XLA per-element gathers run at ~30 ns/element here — so this
kernel re-expresses placement as dense vector algebra:

- the output is processed in 4096-byte tiles, one (8, 128)-word vreg block
  per grid step;
- each tile reads a static *band* of segment rows (every segment whose output
  overlaps the tile — band width is certified on the host from the exact
  counts), 8 segments at a time, one per sublane;
- each segment row is byte-masked to its count, byte-rotated to its output
  alignment (`off & 3`) with the shift-guard pattern, lane-rolled to its
  output word offset (`(off >> 2) & 127`) via lane-dim ``take_along_axis``,
  and split into its two affected 128-word output frames;
- the 8 sublanes then scatter into the tile's 8 frames by one-hot
  select + sublane-sum — adds are exact ORs because segment byte extents are
  disjoint by construction;
- finally packed canonical ranks are mapped to symbols through the 256-entry
  lane table (same scheme as the ILS decoder) so the kernel emits final
  output bytes, LSB-first within each int32 word (i.e. a little-endian
  bitcast away from the byte stream).

The whole block runs as ONE dispatch: the grid iterates (chunk, tile), the
full segment-row matrix stays in HBM (ANY memory), and each chunk DMAs its
certified segment window into VMEM scratch at a scalar-prefetched dynamic
row offset — the same pattern as the ILS kernels' payload windows.  (The
previous per-chunk `pallas_call` form paid the host link's ~29 ms dispatch
floor once per 2 MiB of output, which capped the gap/self-sync decode
pipelines at ~0.1 GB/s through the tunnel.)

Nothing in the hot path gathers from HBM or addresses raggedly; the only
dynamic addressing is the per-chunk window DMA and sublane-dim slicing of
the band start, both natively supported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ils_kernels import _lane_lookup

__all__ = [
    "ragged_concat_pallas",
    "MAX_ROW_BYTES",
    "TILE_BYTES",
    "plan_tiles",
]

LANES = 128
SUBLANES = 8
TILE_BYTES = SUBLANES * LANES * 4  # output bytes per grid step (4096)
# A segment row may occupy at most 120 words (480 bytes): after the +1-word
# byte-alignment extension it must still span <= 2 output frames post-roll.
MAX_ROW_BYTES = 480
# The spare lanes carry each segment's metadata alongside its rank bytes
# (rows use <= 120 of the 128 lanes), so ONE window DMA brings everything —
# a separate (S, 1) array cannot be DMA-sliced (Mosaic requires lane-dim
# slices aligned to the 128 tiling).
OFF_LANE = 126  # absolute output byte offset of the segment
CNT_LANE = 127  # byte count of the segment


def _cdiv(a, b):
    return -(-a // b)


def _kernel(base_ref, s0_ref, rows_hbm, symlo_ref, symhi_ref, out_ref,
            win, sem, *, band, s_cap, tpc, tps, chunk_bytes, row_lanes):
    c = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _load():
        # the chunk's certified segment window (rank rows + the OFF/CNT
        # metadata lanes), DMA'd from HBM at the host-computed window base
        dma = pltpu.make_async_copy(
            rows_hbm.at[pl.ds(base_ref[c], s_cap)], win, sem
        )
        dma.start()
        dma.wait()

    iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    u32 = jnp.uint32

    for t in range(tps):
        k0 = c * chunk_bytes + (i * tps + t) * TILE_BYTES  # tile base byte
        s0 = s0_ref[c * tpc + i * tps + t]  # band start, window-relative

        acc = jnp.zeros((SUBLANES, LANES), jnp.int32)
        for g in range(band // SUBLANES):
            rw = win[pl.ds(s0 + g * SUBLANES, SUBLANES), :]  # (8, row_lanes)
            off8 = jax.lax.slice_in_dim(
                rw, row_lanes - 2, row_lanes - 1, axis=1
            )
            cnt8 = jax.lax.slice_in_dim(
                rw, row_lanes - 1, row_lanes, axis=1
            )
            # rank lanes, widened to the 128-lane output frame (rows are
            # stored at the narrow `row_lanes` width so the HBM array and
            # window DMA skip the dead lanes a short max_count never uses)
            row = (
                rw
                if row_lanes == LANES
                else jnp.pad(rw, ((0, 0), (0, LANES - row_lanes)))
            )

            # byte-mask to the segment's true count (bytes t < cnt survive)
            c4 = cnt8 >> 2
            rem = cnt8 & 3
            partial = (1 << (8 * rem)) - 1  # rem=0 -> 0
            mask = jnp.where(
                iota_l < c4, -1, jnp.where(iota_l == c4, partial, 0)
            )
            row = row & mask

            # byte-rotate to the output alignment a = d & 3 (LSB-first
            # stream: byte p of a word lives at bits [8p, 8p+8))
            d = off8 - k0  # output byte position of the row's first byte
            a = d & 3
            au = a.astype(u32)
            cur = pltpu.bitcast(row, u32)
            prev = jnp.where(
                iota_l == 0, 0, pltpu.bitcast(jnp.roll(row, 1, axis=1), u32)
            )
            shifted = (cur << (8 * au)) | (
                (prev >> u32(1)) >> (8 * (u32(4) - au) - u32(1))
            )

            # lane-roll to the output word offset; split across the frames
            q = d >> 2  # floor; a == d & 3 consumed above
            qm = q & (LANES - 1)
            f = q >> 7  # output frame (sublane row) of the unwrapped part
            idx = (iota_l - qm) & (LANES - 1)
            rolled = pltpu.bitcast(
                jnp.take_along_axis(shifted, idx, axis=1), jnp.int32
            )
            lo = jnp.where(iota_l >= qm, rolled, 0)
            hi = rolled - lo
            frame_rows = []
            for r in range(SUBLANES):
                sel = jnp.where(f == r, lo, 0) + jnp.where(f == r - 1, hi, 0)
                frame_rows.append(jnp.sum(sel, axis=0, keepdims=True))
            acc = acc + jnp.concatenate(frame_rows, axis=0)

        # canonical ranks -> symbols, byte lane by byte lane
        out = jnp.zeros((SUBLANES, LANES), jnp.int32)
        for b in range(4):
            rk = (acc >> (8 * b)) & 255
            sym = _lane_lookup(symlo_ref[:], symhi_ref[:], rk)
            out = out | (sym << (8 * b))
        out_ref[t] = out


@functools.partial(
    jax.jit,
    static_argnames=(
        "band", "s_cap", "chunk_bytes", "n_tiles", "tps", "interpret"
    ),
)
def ragged_concat_pallas(
    rows: jnp.ndarray,  # (S_pad, row_lanes) int32 rank rows + 2 meta lanes
    bases: jnp.ndarray,  # (n_chunks,) int32 window base row per chunk
    s0: jnp.ndarray,  # (n_chunks * tpc,) int32 window-relative band starts
    symlo: jnp.ndarray,  # (8, 128) int32 rank -> symbol, ranks 0..127
    symhi: jnp.ndarray,  # (8, 128) int32 rank -> symbol, ranks 128..255
    *,
    band: int,
    s_cap: int,
    chunk_bytes: int,
    n_tiles: int,
    tps: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Ragged-concat each segment row (LSB-first packed bytes in lanes
    0..row_lanes-3) at its absolute output offset (lane row_lanes-2),
    masked to its byte count (lane row_lanes-1); ``row_lanes`` (any
    multiple of 8, <= 128) is taken from ``rows.shape[1]`` — narrow widths
    skip the HBM/DMA traffic of lanes a short max_count never uses.

    ONE dispatch over a (chunk, tile) grid; chunk c covers output bytes
    [c * chunk_bytes, (c+1) * chunk_bytes) and DMAs segment-window rows
    [bases[c], bases[c] + s_cap) into VMEM.  Returns (n_tiles, 8, 128)
    int32 whose little-endian bitcast is the concatenated symbol byte
    stream (trailing tiles past the real output are garbage; the caller
    slices).  Requirements (certified by the caller): band % 8 == 0;
    every segment overlapping tile i lies in the window at
    [s0[i], s0[i] + band) with s0[i] in [0, s_cap - band]; counts <=
    MAX_ROW_BYTES; offsets strictly ordered with disjoint extents;
    bases[c] + s_cap <= S_pad; chunk_bytes a multiple of TILE_BYTES.
    """
    assert band % SUBLANES == 0 and band > 0
    assert chunk_bytes % TILE_BYTES == 0
    row_lanes = int(rows.shape[1])
    assert row_lanes % SUBLANES == 0 and row_lanes <= LANES
    tpc = chunk_bytes // TILE_BYTES
    if tps is None:
        # measured (v5e, 64 MB, same-process interleaved): 1 tile per grid
        # step runs 7.5 ms vs 13.2 at tps=16 — the 16x-unrolled band body
        # costs more than the per-step grid overhead it saves
        tps = 1
    assert tpc % tps == 0
    n_chunks = bases.shape[0]
    assert s0.shape[0] == n_chunks * tpc
    kern = functools.partial(
        _kernel, band=band, s_cap=s_cap, tpc=tpc, tps=tps,
        chunk_bytes=chunk_bytes, row_lanes=row_lanes,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks, tpc // tps),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((SUBLANES, LANES), lambda c, i, b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda c, i, b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tps, SUBLANES, LANES),
            lambda c, i, b, s: (c * (tpc // tps) + i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((s_cap, row_lanes), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks * tpc, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(bases, s0, rows, symlo, symhi)


def _chunk_kernel(base_ref, ng_ref, gf0_ref, rows_hbm, symlo_ref, symhi_ref,
                  out_ref, win, sem, *, s_cap, n_frames, w_f, chunk_bytes,
                  row_lanes):
    """Chunk-shared placement (VERDICT r5 item 2): each 8-row group of the
    chunk's segment window is masked/rotated/rolled ONCE and scattered into
    a W_F-frame window of the chunk's output block at a dynamic frame
    offset — where the banded `_kernel` re-reads every band row once per
    4 KB tile.  Work per chunk = O(window rows), not O(tiles x band).

    The group's frame base comes from the PREFETCHED ``gf0`` array (the
    absolute output frame of each global 8-row group, SMEM) — deriving it
    in-kernel as min(f) put a cross-sublane reduction + vreg->sreg
    extraction on the serial RMW chain (the PERF.md §5 "laggard anchor"
    pathology; measured 4.6 vs 6.5 GB/s on the decode pipeline)."""
    c = pl.program_id(0)
    dma = pltpu.make_async_copy(
        rows_hbm.at[pl.ds(base_ref[c], s_cap)], win, sem
    )
    dma.start()
    dma.wait()

    out_ref[:] = jnp.zeros((n_frames, LANES), jnp.int32)
    k0 = c * chunk_bytes
    g_base = base_ref[c] // SUBLANES  # bases are 8-aligned by the planner
    f_base = c * n_frames
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    u32 = jnp.uint32

    def group(g, _):
        rw = win[pl.ds(g * SUBLANES, SUBLANES), :]  # (8, row_lanes)
        off8 = jax.lax.slice_in_dim(rw, row_lanes - 2, row_lanes - 1, axis=1)
        cnt8 = jax.lax.slice_in_dim(rw, row_lanes - 1, row_lanes, axis=1)
        row = (
            rw
            if row_lanes == LANES
            else jnp.pad(rw, ((0, 0), (0, LANES - row_lanes)))
        )

        c4 = cnt8 >> 2
        rem = cnt8 & 3
        partial = (1 << (8 * rem)) - 1
        mask = jnp.where(
            iota_l < c4, -1, jnp.where(iota_l == c4, partial, 0)
        )
        row = row & mask

        d = off8 - k0
        a = d & 3
        au = a.astype(u32)
        cur = pltpu.bitcast(row, u32)
        prev = jnp.where(
            iota_l == 0, 0, pltpu.bitcast(jnp.roll(row, 1, axis=1), u32)
        )
        shifted = (cur << (8 * au)) | (
            (prev >> u32(1)) >> (8 * (u32(4) - au) - u32(1))
        )

        q = d >> 2
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
        contrib = jnp.concatenate(frames, axis=0)  # (w_f, 128)
        blk = out_ref[pl.ds(f0, w_f)]
        out_ref[pl.ds(f0, w_f)] = blk | contrib
        return 0

    jax.lax.fori_loop(0, ng_ref[c], group, 0, unroll=False)

    # canonical ranks -> symbols over the finished block, 8 frames at a time
    def symmap(j, _):
        acc = out_ref[pl.ds(j * SUBLANES, SUBLANES)]
        out = jnp.zeros((SUBLANES, LANES), jnp.int32)
        for b in range(4):
            rk = (acc >> (8 * b)) & 255
            sym = _lane_lookup(symlo_ref[:], symhi_ref[:], rk)
            out = out | (sym << (8 * b))
        out_ref[pl.ds(j * SUBLANES, SUBLANES)] = out
        return 0

    jax.lax.fori_loop(0, n_frames // SUBLANES, symmap, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("s_cap", "chunk_bytes", "n_chunks", "w_f", "interpret"),
)
def ragged_concat_chunked_pallas(
    rows: jnp.ndarray,
    bases: jnp.ndarray,
    ngroups: jnp.ndarray,
    gf0: jnp.ndarray,
    symlo: jnp.ndarray,
    symhi: jnp.ndarray,
    *,
    s_cap: int,
    chunk_bytes: int,
    n_chunks: int,
    w_f: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Chunk-shared form of `ragged_concat_pallas`: same rows layout, but
    per chunk the kernel walks its window's row groups once (``ngroups[c]``
    groups of 8 from the 8-ALIGNED ``bases[c]``) instead of re-scanning a
    band per tile.  ``gf0[G]`` is the absolute output frame of global group
    G's first row (prefetched scalar).  ``w_f`` >= (8 * max_row_bytes) //
    512 + 2 frames bounds one group's output span.  Returns
    (n_chunks * chunk_bytes // 512, 128) int32 whose little-endian bitcast
    is the symbol stream."""
    assert chunk_bytes % (LANES * 4) == 0
    n_frames = chunk_bytes // (LANES * 4)
    assert w_f <= n_frames
    row_lanes = int(rows.shape[1])
    kern = functools.partial(
        _chunk_kernel, s_cap=s_cap, n_frames=n_frames, w_f=w_f,
        chunk_bytes=chunk_bytes, row_lanes=row_lanes,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((SUBLANES, LANES), lambda c, b, n, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda c, b, n, f: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_frames, LANES), lambda c, b, n, f: (c, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((s_cap, row_lanes), jnp.int32),
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
    )(bases, ngroups, gf0, rows, symlo, symhi)


def _assemble_kernel(src_ref, out_ref, *, orows):
    """Transpose one 128-segment column block of the extended rank matrix
    (ranks + off/cnt rows) into 128 placement rows, meta in the top lanes."""
    t = jnp.transpose(src_ref[:], (1, 0))  # (128 segs, orows_p8 + pad)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    full = jnp.pad(t[:, :orows], ((0, 0), (0, LANES - orows)))
    off_c = jax.lax.slice_in_dim(t, orows, orows + 1, axis=1)
    cnt_c = jax.lax.slice_in_dim(t, orows + 1, orows + 2, axis=1)
    full = jnp.where(iota_l == OFF_LANE, off_c, full)
    full = jnp.where(iota_l == CNT_LANE, cnt_c, full)
    out_ref[:] = full


@functools.partial(jax.jit, static_argnames=("s_rows", "interpret"))
def rows_assemble_pallas(packed, offs, cnts, *, s_rows, interpret=False):
    """Build the placement-row matrix on the VPU (traceable).

    The XLA form (transpose + pad + metadata-lane updates) cost ~5 ms of a
    16 ms 64 MB decode; this kernel transposes 128-segment blocks through
    the XLU and writes the (s_rows, 128) row matrix directly.

    Args:
      packed: (out_rows, S_p) int32 LSB-first rank words, out_rows <= 120.
      offs/cnts: (S_p,) int32 per-segment output offset / byte count
        (pad segments: any offset, count 0).
      s_rows: output row count, a multiple of 128, >= the placement plan's
        s_pad (rows past S_p are zero-filled with count 0).
    """
    orows, s_p = packed.shape
    assert s_rows % LANES == 0 and s_rows >= s_p
    orows_p = _cdiv(orows + 2, SUBLANES) * SUBLANES
    ext = jnp.concatenate(
        [
            packed,
            offs[None, :].astype(jnp.int32),
            cnts[None, :].astype(jnp.int32),
            jnp.zeros((orows_p - orows - 2, s_p), jnp.int32),
        ],
        axis=0,
    )
    if s_rows > s_p:
        # beyond the real segment grid: count 0, offset irrelevant
        ext = jnp.concatenate(
            [ext, jnp.zeros((orows_p, s_rows - s_p), jnp.int32)], axis=1
        )
    kern = functools.partial(_assemble_kernel, orows=orows)
    return pl.pallas_call(
        kern,
        grid=(s_rows // LANES,),
        in_specs=[
            pl.BlockSpec((orows_p, LANES), lambda j: (0, j),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((LANES, LANES), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_rows, LANES), jnp.int32),
        interpret=interpret,
    )(ext)


def plan_tiles(counts: np.ndarray, out_size: int):
    """Host-side band certification for one block.

    counts: (S,) exact byte counts (np).  Returns (s0 (n_tiles,) int32,
    band int) such that every segment whose extent overlaps output tile i
    lies in [s0[i], s0[i] + band).
    """
    counts = np.asarray(counts, np.int64)
    ends = np.cumsum(counts)
    offs = ends - counts
    n_tiles = _cdiv(max(out_size, 1), TILE_BYTES)
    tile_lo = np.arange(n_tiles, dtype=np.int64) * TILE_BYTES
    # first segment with end > tile start; one past the last with
    # off < tile end
    s_first = np.searchsorted(ends, tile_lo, side="right")
    s_last = np.searchsorted(offs, tile_lo + TILE_BYTES, side="left")
    band = int(np.max(s_last - s_first, initial=1))
    # NOT 8-aligned: measured (v5e, 64 MB) the kernel cost is ~linear in
    # band rows (0.23 ms/row either way), so widening the band by 8 to
    # align the window reads loses more than the alignment saves
    band = max(_cdiv(band, SUBLANES) * SUBLANES, SUBLANES)
    # caller clamps s0 against its (band-padded) row count
    return s_first.astype(np.int32), band
