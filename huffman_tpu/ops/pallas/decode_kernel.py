"""Pallas TPU decode kernel — the hot path.

TPU-native replacement for the reference's gap-array decode kernel
(`Huffman_coding_Gap_arrays/decoder/src/decoder.cu:454-730`).  Differences
forced (and enabled) by the hardware:

- *one segment per VPU lane*, 1024 segments per grid program laid out as an
  (8, 128) vreg, all decoding in lock-step — versus one CUDA thread per
  segment;
- the bit window is a 64-bit shift register per lane (``hi``/``lo`` uint32
  pairs).  Each decoded symbol consumes <= max_len (16) bits, so ONE masked
  32-bit refill per TWO symbols maintains the invariant ``valid >= 33``.
  The refill is a one-hot select over the segment's word rows (sublane
  gathers don't exist on TPU; lane-dim ``take_along_axis`` does and is used
  for the per-length bias table);
- code length comes from canonical-limit compares (``len = 1 +
  #{l: win >= lim[l]}``, <= 15 scalar-broadcast compares) instead of a LUT
  probe — no 2^16-entry gather in the inner loop;
- the kernel emits canonical *ranks* (4 packed per int32); the symbol
  permutation and the variable-count compaction are one fused XLA gather
  afterwards — where the reference needs atomicOr for ragged boundary words
  (`decoder.cu:704,727`), we never scatter at all;
- lanes free-run with zero masking in the hot loop: a finished lane decodes
  garbage from zero-fill, and compaction drops everything past the stored
  per-segment count.  The per-tile trip count is ``max(counts in tile)``, a
  dynamic ``fori_loop`` bound evaluated on the scalar core.

Segment metadata (gap+count) comes from the encoder, so there is no counting
pass and no decoupled-lookback scan (`decoder.cu:571-653`): output offsets
are one ``cumsum`` of container-stored counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tables import DecSpec, DeviceDecTable

__all__ = ["decode_block_pallas", "decode_blocks_pallas", "decode_ranks_pallas"]

LANES = 128
SUBLANES = 8
TILE_SEGS = SUBLANES * LANES  # segments per grid program


def _cdiv(a, b):
    return -(-a // b)


def _kernel(lim_ref, bias_ref, gaps_ref, counts_ref, segw_ref, out_ref, *, rows, max_len):
    """One tile: decode TILE_SEGS segments, 4 symbols per loop iteration."""
    segw = segw_ref[:]  # (rows, 8, 128) int32 (bit patterns of u32 words)
    gap = gaps_ref[:]  # (8, 128) int32
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (rows, SUBLANES, LANES), 0)

    u32 = jnp.uint32
    w0 = pltpu.bitcast(segw[0], u32)
    w1 = pltpu.bitcast(segw[1], u32)
    gsh = gap.astype(u32)
    hi = (w0 << gsh) | ((w1 >> u32(1)) >> (u32(31) - gsh))
    lo = w1 << gsh
    valid = 64 - gap
    wptr = jnp.full((SUBLANES, LANES), 2, jnp.int32)

    tile_max = jnp.max(counts_ref[:])
    # 4x unrolled loop (fori_loop per-iteration overhead dominates); lanes
    # free-run past their counts by design, so the rounded-up trip count
    # only decodes more discarded garbage.
    iters = ((tile_max + 15) >> 4)

    def decode_one(hi, lo, valid):
        win = hi
        ln = jnp.ones((SUBLANES, LANES), jnp.int32)
        for l in range(1, max_len):
            ln = ln + (win >= lim_ref[0, l]).astype(jnp.int32)
        lns = ln.astype(u32)
        value = (win >> (u32(32) - lns)).astype(jnp.int32)
        rank = jnp.take_along_axis(bias_ref[:], ln, axis=1) + value
        hi = (hi << lns) | ((lo >> u32(1)) >> (u32(31) - lns))
        lo = lo << lns
        valid = valid - ln
        return hi, lo, valid, rank & 255

    def refill(hi, lo, valid, wptr):
        need = valid <= 32
        sel = jnp.where(iota_rows == wptr[None], segw, 0)
        word = pltpu.bitcast(jnp.sum(sel, axis=0), u32)
        word = jnp.where(need, word, u32(0))
        vsh = valid.astype(u32)
        # insert 32 bits at offset `valid` of the 64-bit (hi, lo) register;
        # valid in [1, 32] whenever need is true, and word == 0 otherwise.
        hi = hi | ((word >> u32(1)) >> ((vsh - u32(1)) & u32(31)))
        lo = lo | (word << ((u32(32) - vsh) & u32(31)))
        valid = valid + jnp.where(need, 32, 0)
        wptr = wptr + need.astype(jnp.int32)
        return hi, lo, valid, wptr

    def quad(hi, lo, valid, wptr):
        hi, lo, valid, r0 = decode_one(hi, lo, valid)
        hi, lo, valid, r1 = decode_one(hi, lo, valid)
        hi, lo, valid, wptr = refill(hi, lo, valid, wptr)
        hi, lo, valid, r2 = decode_one(hi, lo, valid)
        hi, lo, valid, r3 = decode_one(hi, lo, valid)
        hi, lo, valid, wptr = refill(hi, lo, valid, wptr)
        pack = (r0 << 24) | (r1 << 16) | (r2 << 8) | r3
        return hi, lo, valid, wptr, pack

    def body(j, carry):
        hi, lo, valid, wptr = carry
        packs = []
        for _ in range(4):
            hi, lo, valid, wptr, pk = quad(hi, lo, valid, wptr)
            packs.append(pk)
        out_ref[pl.ds(4 * j, 4)] = jnp.stack(packs)
        return (hi, lo, valid, wptr)

    jax.lax.fori_loop(0, iters, body, (hi, lo, valid, wptr), unroll=False)


def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu",)


@functools.partial(
    jax.jit,
    static_argnames=("spec", "seg_bits", "n_segs", "max_count", "interpret"),
)
def decode_ranks_pallas(
    words: jnp.ndarray,
    gaps: jnp.ndarray,
    counts: jnp.ndarray,
    dec: DeviceDecTable,
    *,
    spec: DecSpec,
    seg_bits: int,
    n_segs: int,
    max_count: int,
    interpret: bool = False,
):
    """Run the decode kernel; returns packed ranks (rows, n_segs_padded) i32
    with 4 ranks per int32 (MSB-first within the word).

    Args:
      words: (W,) uint32 payload (any padding beyond total_bits is fine).
      gaps/counts: (n_segs_cap,) int32 with real data in [:n_segs].
      n_segs: number of real segments (static).
      max_count: static bound >= max(counts).
    """
    wps = seg_bits // 32
    rows = wps + 2
    tiles = _cdiv(n_segs, TILE_SEGS)
    n_segs_p = tiles * TILE_SEGS

    need_words = (n_segs_p + 1) * wps
    n_copy = min(int(words.shape[0]), need_words)
    words_p = jnp.zeros(need_words, jnp.uint32).at[:n_copy].set(words[:n_copy])
    arr = words_p.reshape(n_segs_p + 1, wps)
    segw = jnp.concatenate([arr[:-1], arr[1:, :2]], axis=1)  # (n_segs_p, rows)
    segw = (
        jax.lax.bitcast_convert_type(segw, jnp.int32)
        .T.reshape(rows, tiles * SUBLANES, LANES)
    )

    def pad_to(x, dtype):
        out = jnp.zeros(n_segs_p, dtype)
        return out.at[: x.shape[0]].set(x[:n_segs_p].astype(dtype))

    gaps_r = pad_to(gaps, jnp.int32).reshape(tiles * SUBLANES, LANES)
    counts_r = pad_to(counts, jnp.int32).reshape(tiles * SUBLANES, LANES)

    max_count_p = _cdiv(max(max_count, 1), 16) * 16
    out_rows = max_count_p // 4

    # lane-broadcast bias table: bias[l] = offsets[l] - first_code[l]
    bias = dec.offsets - dec.first_code.astype(jnp.int32)
    bias_row = jnp.zeros(LANES, jnp.int32).at[: bias.shape[0]].set(bias)
    bias_tab = jnp.tile(bias_row[None], (SUBLANES, 1))
    lim = jnp.zeros((1, 32), jnp.uint32).at[0, : dec.lim_left.shape[0]].set(
        dec.lim_left
    )

    kern = functools.partial(_kernel, rows=rows, max_len=spec.max_len)
    packed = pl.pallas_call(
        kern,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rows, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (out_rows, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (out_rows, tiles * SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(lim, bias_tab, gaps_r, counts_r, segw)
    return packed.reshape(out_rows, n_segs_p)


#: output bytes per batched dispatch: the rank matrix, its transpose and
#: the band-padded rows copy all scale with the group's TOTAL output, so an
#: unbounded group would put several x the file size on device at once
GROUP_OUT_BYTES = 1 << 26  # 64 MiB


@functools.partial(
    jax.jit,
    static_argnames=("spec", "seg_bits", "n_segs_b", "max_count", "interpret"),
)
def _ranks_blocks(
    words2d, gaps_flat, counts_flat, dec, *, spec, seg_bits, n_segs_b,
    max_count, interpret,
):
    """Pad each block's payload row to its segment grid, flatten, decode —
    one fused dispatch (eager staging would pay the tunnel's ~29 ms
    dispatch floor two extra times per group)."""
    g, w = words2d.shape
    wps = seg_bits // 32
    w_pad = n_segs_b * wps
    n_copy = min(w, w_pad)
    words_flat = (
        jnp.zeros((g, w_pad), jnp.uint32)
        .at[:, :n_copy]
        .set(words2d[:, :n_copy])
        .reshape(-1)
    )
    return decode_ranks_pallas(
        words_flat, gaps_flat, counts_flat, dec, spec=spec,
        seg_bits=seg_bits, n_segs=g * n_segs_b, max_count=max_count,
        interpret=interpret,
    )


def decode_blocks_pallas(
    words: jnp.ndarray,
    gaps: "np.ndarray",
    counts: "np.ndarray",
    dec: DeviceDecTable,
    *,
    symtab: "np.ndarray",
    spec: DecSpec,
    seg_bits: int,
    max_count: int,
    out_size: int,
    interpret: bool = False,
):
    """Batched Pallas decode of G independent equal-size blocks.

    One ranks-kernel dispatch + one compaction per sub-group (the per-block
    form costs a full tunnel round-trip per block): each block's payload is
    padded to exactly ``n_segs * wps`` words so the blocks' segment grids
    concatenate into one flat segment stream, and the ragged placement of
    the concatenation IS the concatenation of the blocks' outputs.
    Zero-count padding segments between blocks place nothing (the compaction
    masks each row to its exact count).

    Constraints handled here:

    - groups are capped at ``GROUP_OUT_BYTES`` of output per dispatch — the
      intermediate rank matrices scale with the group's total output, so an
      uncapped group would stage several x the file size in HBM at once;
    - batching requires ``out_size`` to be a multiple of the compaction
      tile (4096 B): aligned seams start exactly at an output tile, where
      `plan_tiles`'s half-open searchsorted windows exclude the seam's
      zero-count segments; a mid-tile seam would widen the GLOBAL certified
      band by the whole per-block segment-count spread (measured: 40 -> 552
      on a 2-block case).  Non-aligned out_size falls back to per-block
      dispatches (a lone block has no seams, so any out_size is safe).

    Args:
      words: (G, W) uint32 per-block payload words (any W; sliced/padded to
        the segment grid on device).
      gaps/counts: (G, n_segs) HOST arrays — exact per-segment metadata;
        counts of each row must sum to ``out_size``.
      out_size: decoded bytes PER BLOCK.

    Returns a device (G, out_size) uint8 array; nothing of payload size
    crosses the host boundary.
    """
    import numpy as np

    from ..compact import compact_ranks_device
    from .compact_kernel import TILE_BYTES

    g, n_segs = gaps.shape
    words = jnp.asarray(words)
    gaps_h = np.ascontiguousarray(gaps, np.int32)
    counts_h = np.ascontiguousarray(counts, np.int64)

    if out_size % TILE_BYTES == 0 and out_size <= GROUP_OUT_BYTES:
        gg = max(GROUP_OUT_BYTES // max(out_size, 1), 1)
    else:
        gg = 1  # per-block: no seams, any out_size/footprint is safe

    pieces = []
    for lo in range(0, g, gg):
        hi = min(lo + gg, g)
        cf = counts_h[lo:hi].reshape(-1)
        packed = _ranks_blocks(
            words[lo:hi],
            jnp.asarray(gaps_h[lo:hi].reshape(-1)),
            jnp.asarray(cf.astype(np.int32)),
            dec,
            spec=spec,
            seg_bits=seg_bits,
            n_segs_b=n_segs,
            max_count=max_count,
            interpret=interpret,
        )
        out = compact_ranks_device(
            packed, cf, symtab, (hi - lo) * out_size, interpret=interpret
        )
        pieces.append(out.reshape(hi - lo, out_size))
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)


def decode_block_pallas(
    words: jnp.ndarray,
    gaps: jnp.ndarray,
    counts: "np.ndarray",
    dec: DeviceDecTable,
    *,
    symtab: "np.ndarray",
    spec: DecSpec,
    seg_bits: int,
    n_segs: int,
    max_count: int,
    out_size: int,
    interpret: bool = False,
):
    """Full Pallas decode of one block: ranks kernel + device ragged concat.

    ``counts`` and ``symtab`` are HOST arrays — the exact per-segment symbol
    counts drive the compaction band certification (`ops/compact.py`), the
    TPU-native form of the reference's on-GPU placement phase
    (`decoder/src/decoder.cu:571-729`).  Returns a device (out_size,) uint8
    array; nothing of payload size crosses the host boundary.
    """
    import numpy as np

    counts_h = np.asarray(counts)[:n_segs]
    gaps_h = np.asarray(gaps)[:n_segs]
    return decode_blocks_pallas(
        jnp.asarray(words)[None],
        gaps_h[None],
        counts_h[None],
        dec,
        symtab=symtab,
        spec=spec,
        seg_bits=seg_bits,
        max_count=max_count,
        out_size=out_size,
        interpret=interpret,
    )[0]
