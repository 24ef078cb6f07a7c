"""Pallas TPU encode map kernel — gather-free symbol->code translation.

The XLA gap-array encoder (`ops/encode.py`) spends nearly all of its time
in two 256-entry per-byte table gathers (~30 ns/element on this chip — the
same pathology the decode paths avoid by design): measured 0.028 GB/s for
the whole encode at 64 MB.  This kernel replaces the gathers with lane-table
lookups (`take_along_axis` over (8, 128) halves, a hardware permute) and
also PRE-PACKS each aligned 4-byte group's codewords into one left-justified
64-bit unit — so the downstream XLA placement (cumsum + segment-sum ORs,
`ops/encode.py` scheme) runs at quarter density: one variable-length item
per 4 input bytes instead of one per byte.

Role of the reference encoder's per-thread code lookup + local pack before
its scans (`Huffman_coding_Gap_arrays/encoder/src/encoder.cu:181-220`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ils_kernels import IlsEncTabs, _lane_lookup

__all__ = ["encode_map_pallas"]

LANES = 128
SUBLANES = 8
CHUNK_ROWS = 256  # word rows per grid step (1 MiB of input)


def _cdiv(a, b):
    return -(-a // b)


def _map_kernel(lo_ref, hi_ref, data_ref, hi_out, lo_out, meta_out, *, iters):
    """Per word (4 bytes, MSB-first): look up 4 (len, code) entries, pack
    them into a left-justified 64-bit unit, emit (hi, lo, meta) where meta
    = (l0<<26)|(l1<<21)|(l2<<16)|(l3<<11 ... no — packed lens 4 x 5 bits in
    the low 20 bits plus the 7-bit total above them."""
    u32 = jnp.uint32

    def one(j):
        w = pltpu.bitcast(data_ref[j], u32)
        acc_hi = jnp.zeros(w.shape, u32)
        acc_lo = jnp.zeros(w.shape, u32)
        tl = jnp.zeros(w.shape, jnp.int32)
        meta = jnp.zeros(w.shape, jnp.int32)
        for b in range(4):
            idx = ((w >> u32(24 - 8 * b)) & u32(255)).astype(jnp.int32)
            e = _lane_lookup(lo_ref[:], hi_ref[:], idx)
            ln = e >> 20  # 1..16 for symbols present in the table
            c = pltpu.bitcast(e, u32) & u32(0xFFFFF)
            ls = ln.astype(u32)
            # (acc_hi, acc_lo) <<= ln; acc_lo |= code  (guarded >=32-safe)
            acc_hi = (acc_hi << ls) | ((acc_lo >> u32(1)) >> (u32(31) - ls))
            acc_lo = (acc_lo << ls) | c
            tl = tl + ln
            meta = (meta << 5) | ln
        # left-justify to 64 bits: shift left by r = 64 - tl in [0, 60]
        r = (64 - tl).astype(u32)
        rm = r & u32(31)
        rb = r >= u32(32)
        lj_hi = jnp.where(
            rb,
            acc_lo << rm,
            (acc_hi << rm) | ((acc_lo >> u32(1)) >> (u32(31) - rm)),
        )
        lj_lo = jnp.where(rb, u32(0), acc_lo << rm)
        hi_out[j] = pltpu.bitcast(lj_hi, jnp.int32)
        lo_out[j] = pltpu.bitcast(lj_lo, jnp.int32)
        meta_out[j] = (tl << 20) | meta

    # manual 4x unroll (fori_loop per-iteration overhead dominates short
    # bodies; pallas `unroll=` is NotImplemented)
    def body(q, _):
        for u in range(4):
            one(4 * q + u)
        return 0

    jax.lax.fori_loop(0, iters // 4, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _map_jit(words3, lo, hi, *, interpret):
    t = words3.shape[0]
    kern = functools.partial(_map_kernel, iters=CHUNK_ROWS)
    grid = t // CHUNK_ROWS
    spec = pl.BlockSpec(
        (CHUNK_ROWS, SUBLANES, LANES), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tabspec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    sd = jax.ShapeDtypeStruct((t, SUBLANES, LANES), jnp.int32)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[tabspec, tabspec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[sd, sd, sd],
        interpret=interpret,
    )(lo, hi, words3)


def encode_map_pallas(
    data: jnp.ndarray,
    enc: IlsEncTabs,
    *,
    interpret: bool = False,
):
    """Translate bytes to packed 4-byte code groups (traceable).

    Args:
      data: (B,) uint8 with B % 4096 == 0 (whole (8,128) word rows).
      enc: lane tables, (len << 20) | code per symbol.

    Returns (lj_hi, lj_lo, lens4, meta) flat (B//4,) arrays: the group's
    codewords left-justified MSB-first in 64 bits (hi, lo), the group's
    total bit length, and the packed per-byte lengths (4 x 5 bits,
    byte 0 in bits [15:20] ... byte 3 in bits [0:5]).
    """
    b = data.shape[0]
    assert b % (4 * SUBLANES * LANES) == 0, "pad the block to 4096 bytes"
    d4 = data.reshape(-1, 4).astype(jnp.uint32)
    w = (d4[:, 0] << 24) | (d4[:, 1] << 16) | (d4[:, 2] << 8) | d4[:, 3]
    t = b // 4 // (SUBLANES * LANES)
    # CHUNK_ROWS-divisible grid: pad rows (garbage groups; caller masks)
    t_p = _cdiv(t, CHUNK_ROWS) * CHUNK_ROWS
    words3 = jnp.zeros((t_p, SUBLANES, LANES), jnp.int32)
    words3 = words3.at[:t].set(
        jax.lax.bitcast_convert_type(w, jnp.int32).reshape(
            t, SUBLANES, LANES
        )
    )
    hi, lo, meta = _map_jit(
        words3, enc.lo, enc.hi, interpret=interpret
    )
    n = b // 4
    hi = jax.lax.bitcast_convert_type(hi.reshape(-1)[:n], jnp.uint32)
    lo = jax.lax.bitcast_convert_type(lo.reshape(-1)[:n], jnp.uint32)
    meta = meta.reshape(-1)[:n]
    return hi, lo, meta >> 20, meta & 0xFFFFF
