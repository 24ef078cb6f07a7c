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

Nothing in the hot path gathers from HBM or addresses raggedly; the only
dynamic addressing is sublane-dim slicing of the band start, which the TPU
supports natively.
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


def _cdiv(a, b):
    return -(-a // b)


def _kernel(s0_ref, offs_ref, counts_ref, rows_ref, symlo_ref, symhi_ref,
            out_ref, *, band):
    i = pl.program_id(0)
    k0 = i * TILE_BYTES  # tile base byte (relative to this chunk)
    # s0 lives whole in SMEM (n_tiles <= 512 per chunk, 2 KB): Mosaic
    # rejects sub-(8,128) *blocked* specs, so the kernel indexes the full
    # array by grid position instead of block-slicing it
    s0 = s0_ref[i, 0]
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    u32 = jnp.uint32

    acc = jnp.zeros((SUBLANES, LANES), jnp.int32)
    for g in range(band // SUBLANES):
        base = s0 + g * SUBLANES
        off8 = offs_ref[pl.ds(base, SUBLANES), :]  # (8, 1)
        cnt8 = counts_ref[pl.ds(base, SUBLANES), :]  # (8, 1)
        row = rows_ref[pl.ds(base, SUBLANES), :]  # (8, 128) int32 LSB-first

        # byte-mask to the segment's true count (bytes t < cnt survive)
        c4 = cnt8 >> 2
        rem = cnt8 & 3
        partial = (1 << (8 * rem)) - 1  # rem=0 -> 0
        mask = jnp.where(
            iota_l < c4, -1, jnp.where(iota_l == c4, partial, 0)
        )
        row = row & mask

        # byte-rotate to the output alignment a = d & 3 (LSB-first stream:
        # byte p of a word lives at bits [8p, 8p+8))
        d = off8 - k0  # output byte position of the row's first byte
        a = d & 3
        au = a.astype(u32)
        cur = pltpu.bitcast(row, u32)
        prev = jnp.where(iota_l == 0, 0, pltpu.bitcast(jnp.roll(row, 1, axis=1), u32))
        shifted = (cur << (8 * au)) | (
            (prev >> u32(1)) >> (8 * (u32(4) - au) - u32(1))
        )

        # lane-roll to the output word offset; split across the two frames
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
    out_ref[0] = out


@functools.partial(
    jax.jit, static_argnames=("band", "n_tiles", "interpret")
)
def ragged_concat_pallas(
    rows: jnp.ndarray,  # (S, 128) int32, LSB-first packed rank bytes per seg
    offs: jnp.ndarray,  # (S, 1) int32 output byte offset of each segment
    counts: jnp.ndarray,  # (S, 1) int32 byte count of each segment
    s0: jnp.ndarray,  # (n_tiles, 1) int32 band start per output tile
    symlo: jnp.ndarray,  # (8, 128) int32 rank -> symbol, ranks 0..127
    symhi: jnp.ndarray,  # (8, 128) int32 rank -> symbol, ranks 128..255
    *,
    band: int,
    n_tiles: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Ragged-concat `counts[s]` bytes of each segment row at `offs[s]`.

    Returns (n_tiles, 8, 128) int32 whose little-endian bitcast is the
    concatenated symbol byte stream.  Requirements (certified by the
    caller): band % 8 == 0; every segment overlapping tile i lies in
    [s0[i], s0[i]+band); counts <= MAX_ROW_BYTES; offs strictly ordered
    with disjoint extents; s0[i] + band <= S.
    """
    assert band % SUBLANES == 0 and band > 0
    kern = functools.partial(_kernel, band=band)
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(s0.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(rows.shape[:1] + (1,), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(rows.shape[:1] + (1,), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(rows.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, SUBLANES, LANES), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32),
        interpret=interpret,
    )(s0, offs, counts, rows, symlo, symhi)


def plan_tiles(counts: np.ndarray, out_size: int):
    """Host-side band certification for one chunk.

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
    band = max(_cdiv(band, SUBLANES) * SUBLANES, SUBLANES)
    # caller clamps s0 against its (band-padded) row count
    return s_first.astype(np.int32), band
