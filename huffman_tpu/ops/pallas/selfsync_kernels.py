"""Pallas kernel for decoder-side synchronization discovery (CUHD parity).

The reference's CUHD decoder finds codeword boundaries with NO encoder
metadata by speculative self-synchronization: threads re-decode overlapping
subsequences until neighboring exit positions agree, iterated from a host
loop (`gpuhd/src/cuhd_gpu_decoder.cu:145-327`, host loop `:459-495`).  That
convergence loop maps poorly to TPU (device-side scheduling, D->H flag
ping-pong per iteration).

The TPU-native replacement is exact, not speculative: every codeword
boundary crossing a subsequence edge lands at most ``max_len - 1 < 16`` bits
in, so a subsequence is a *transition function* over 16 entry states.  This
kernel decodes every subsequence from ALL 16 entry offsets (lengths only)
and emits, per (subsequence, entry): the exit offset into the next
subsequence and the number of codewords consumed.  The caller composes the
transitions with an associative scan of 16x16 one-hot matmuls (MXU work —
see `models/selfsync.py`), which replaces CUHD's phases 1-2 + the host
convergence loop with one deterministic O(log n) pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sync_transitions", "SYNC_STATES"]

LANES = 128
SUBLANES = 8
TILE_SUBSEQ = SUBLANES * LANES
SYNC_STATES = 16  # entry states: a codeword crosses an edge by < max_len bits


def _cdiv(a, b):
    return -(-a // b)


def _transition_kernel(
    total_ref, lim_ref, segw_ref, out_ref, *, rows, seg_bits, max_len, min_len
):
    """For each of 1024 subsequences x 16 entries: (exit << 16) | count."""
    u32 = jnp.uint32
    shape = (SUBLANES, LANES)
    segw = segw_ref[:]
    iota_rows = jax.lax.broadcasted_iota(jnp.int32, (rows, SUBLANES, LANES), 0)
    t = pl.program_id(0)
    lane_idx = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    )
    base_bits = (t * TILE_SUBSEQ + lane_idx) * seg_bits
    end_local = jnp.clip(total_ref[0] - base_bits, 0, seg_bits)
    steps = _cdiv(seg_bits, max(min_len, 1)) + 1

    w0 = pltpu.bitcast(segw[0], u32)
    w1 = pltpu.bitcast(segw[1], u32)

    for e in range(SYNC_STATES):
        esh = u32(e)
        if e == 0:
            hi, lo = w0, w1
        else:
            hi = (w0 << esh) | (w1 >> u32(32 - e))
            lo = w1 << esh
        valid = jnp.full(shape, 64 - e, jnp.int32)
        wptr = jnp.full(shape, 2, jnp.int32)
        pos = jnp.full(shape, e, jnp.int32)
        count = jnp.zeros(shape, jnp.int32)

        def refill(hi, lo, valid, wptr):
            need = valid <= 32
            sel = jnp.where(iota_rows == wptr[None], segw, 0)
            word = pltpu.bitcast(jnp.sum(sel, axis=0), u32)
            word = jnp.where(need, word, u32(0))
            vsh = valid.astype(u32)
            hi = hi | ((word >> u32(1)) >> ((vsh - u32(1)) & u32(31)))
            lo = lo | (word << ((u32(32) - vsh) & u32(31)))
            valid = valid + jnp.where(need, 32, 0)
            wptr = wptr + need.astype(jnp.int32)
            return hi, lo, valid, wptr

        def step(hi, lo, valid, pos, count):
            win = hi
            ln = jnp.full(shape, min_len, jnp.int32)
            for l in range(min_len, max_len):
                ln = ln + (win >= lim_ref[0, l]).astype(jnp.int32)
            active = pos < end_local
            lns = jnp.where(active, ln, 0).astype(u32)
            hi = (hi << lns) | ((lo >> u32(1)) >> (u32(31) - lns))
            lo = lo << lns
            valid = valid - lns.astype(jnp.int32)
            pos = pos + lns.astype(jnp.int32)
            count = count + active.astype(jnp.int32)
            return hi, lo, valid, pos, count

        def cond(carry):
            # all-lanes-done early exit: the static bound assumes min_len
            # bits per codeword (2-5x overshoot on typical tables); surplus
            # steps are all-lane masked no-ops, so exiting when every lane
            # of this entry has consumed its subsequence is exact
            j, hi, lo, valid, wptr, pos, count = carry
            return (j < _cdiv(_cdiv(steps, 2), 4)) & jnp.any(pos < end_local)

        def body(carry):
            # 4x unrolled: fori_loop per-iteration overhead dominates these
            # short bodies (see the ILS kernels); surplus trailing steps are
            # masked no-ops (pos >= end_local) and their refills select no
            # row, so rounding the trip count up is harmless.
            j, hi, lo, valid, wptr, pos, count = carry
            for _ in range(4):
                hi, lo, valid, pos, count = step(hi, lo, valid, pos, count)
                hi, lo, valid, pos, count = step(hi, lo, valid, pos, count)
                hi, lo, valid, wptr = refill(hi, lo, valid, wptr)
            return j + 1, hi, lo, valid, wptr, pos, count

        _, hi, lo, valid, wptr, pos, count = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), hi, lo, valid, wptr, pos, count),
        )
        exit_off = jnp.clip(pos - seg_bits, 0, SYNC_STATES - 1)
        out_ref[e] = (exit_off << 16) | count


@functools.partial(
    jax.jit,
    static_argnames=("seg_bits", "n_subseq", "max_len", "min_len", "interpret"),
)
def sync_transitions(
    words,
    total_bits,
    lim,
    *,
    seg_bits,
    n_subseq,
    max_len,
    min_len,
    interpret=False,
):
    """Compute per-(subsequence, entry) transitions of a raw bit stream.

    Args:
      words: (W,) uint32 MSB-first payload.
      total_bits: () int32 exact stream length in bits.
      lim: (1, 32) uint32 canonical left-justified limits.
      seg_bits: subsequence size (multiple of 64).
      n_subseq: ceil(total_bits / seg_bits).

    Returns (16, n_subseq_padded) int32: (exit_offset << 16) | count, where
    entry state e is the row index.  Subsequences past n_subseq have count 0.
    """
    wps = seg_bits // 32
    rows = wps + 2
    tiles = _cdiv(n_subseq, TILE_SUBSEQ)
    n_p = tiles * TILE_SUBSEQ
    need_words = (n_p + 1) * wps
    n_copy = min(int(words.shape[0]), need_words)
    words_p = jnp.zeros(need_words, jnp.uint32).at[:n_copy].set(words[:n_copy])
    arr = words_p.reshape(n_p + 1, wps)
    segw = jnp.concatenate([arr[:-1], arr[1:, :2]], axis=1)
    segw = (
        jax.lax.bitcast_convert_type(segw, jnp.int32)
        .T.reshape(rows, tiles * SUBLANES, LANES)
    )
    total = jnp.asarray(total_bits, jnp.int32).reshape(1)

    kern = functools.partial(
        _transition_kernel,
        rows=rows,
        seg_bits=seg_bits,
        max_len=max_len,
        min_len=max(min_len, 1),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((1, 32), lambda t, s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (rows, SUBLANES, LANES), lambda t, s: (0, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (SYNC_STATES, SUBLANES, LANES), lambda t, s: (0, t, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (SYNC_STATES, tiles * SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(total, lim, segw)
    return out.reshape(SYNC_STATES, n_p)
