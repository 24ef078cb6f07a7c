"""Pallas TPU kernels for the interleaved-stream (ILS) layout.

Kernels over tiles of 1024 lanes (see `core/ils_ref.py` for the layout
contract and the schedule proof):

- ``ils_pack_certify`` + ``ils_compact``: the default SINGLE-PASS encode —
  pack at worst-case tile stride while simulating the decoder's refill
  schedule (the certification), then DMA-compact tiles to their measured
  row counts.  Falls back to the two passes below on out-of-band emission
  or oversized stride.
- ``ils_lengths_pass``: simulates the decoder-refill / encoder-emission
  schedule from codeword lengths only, returning per-stream total bits and
  the deviation envelope that sizes the refill band.  Plays the role of the
  reference encoder's first over-the-data pass (the per-thread code-length
  sum feeding its prefix scan, `Huffman_coding_Gap_arrays/encoder/src/
  encoder.cu:181-220`) — here the pass's result *is* the schedule
  certificate stored in the container.
- ``ils_pack``: MSB-first bit packing of 1024 streams in lock-step with
  banded one-hot word emission — the TPU replacement for the reference's
  atomicOr boundary writes (`encoder.cu:317-347`): every u32 word of the
  payload has exactly one writer by construction.
- ``ils_decode``: the hot kernel.  Fully static control flow: every lane
  decodes exactly ``k`` symbols, refilling a 64-bit shift register from a
  narrow banded window (one-hot select over ``w_band`` rows), and emits four
  packed symbols per iteration which ARE the original little-endian u32 —
  the output-placement phase of the reference decoder (prefix-sum +
  atomicOr, `decoder/src/decoder.cu:571-729`) has no equivalent here
  because nothing needs moving.

All state lives in (8, 128) int32/uint32 vregs; per-tile payload rows arrive
via one explicit DMA (HBM -> VMEM) at a scalar-prefetched dynamic row
offset.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.canonical import CodeTable
from ...core.ils_ref import ILS_ROT_LANE, ILS_ROT_SUB, ILS_WIN, ils_n_win

__all__ = [
    "IlsEncTabs",
    "IlsDecTabs",
    "ils_enc_tabs",
    "ils_dec_tabs",
    "ils_lengths_pass",
    "ils_pack",
    "ils_pack_certify",
    "ils_pack_certify_stream",
    "ils_stream_span_rows",
    "ils_compact",
    "ils_decode",
]

LANES = 128
SUBLANES = 8
TILE_LANES = SUBLANES * LANES  # 1024 streams per tile

# Body iterations (of 4 symbols) per grid chunk: the per-chunk data/output
# block is CHUNK_I rows (2 MB), so VMEM no longer bounds k — tiles iterate a
# second grid dimension with decode/pack state carried in scratch across
# chunks (grid steps run sequentially per core; scratch persists).
CHUNK_I = 512

_BIG = np.int32(1 << 30)


def _chunk_iters(k, cap=CHUNK_I):
    """Bodies per grid chunk: the largest divisor of k//4 that is <= cap
    (so every k that is a multiple of 4 chunks exactly)."""
    kq = k // 4
    if kq <= cap:
        return kq
    for it in range(cap, 0, -1):
        if kq % it == 0:
            return it
    return 1


def _n_chunks(k):
    return (k // 4) // _chunk_iters(k)


def _decode_nt():
    """Tiles interleaved per decode grid step.  Measured on v5e: two
    independent decode chains do NOT beat one (the kernel is VPU
    throughput-bound, not latency-bound — interleaved trials showed parity
    within noise while doubling VMEM window pressure), so the default is 1;
    the ``nt`` override on `ils_decode` remains for tuning on other parts."""
    return 1


def _unroll(iters, w_band=0, interpret=False):
    """Body-iteration unroll factor: loop overhead dominates the decode/pack
    inner loops (U=16 measured best on v5e, slightly ahead of U=8).  Wide
    refill bands (pathological schedules) shrink the factor so the traced
    body stays bounded; interpret mode caps at 4 because CPU XLA chokes on
    the production-k traced body (tens of minutes to compile at U=16)."""
    if w_band > 192:
        cap = 1
    elif w_band > 96:
        cap = 2
    elif w_band > 48:
        cap = 4
    else:
        cap = 16
    if interpret:
        cap = min(cap, 4)
    for u in (16, 8, 4, 2):
        if u <= cap and iters % u == 0:
            return u
    return 1


# ----------------------------------------------------------------------
# Device table construction
# ----------------------------------------------------------------------
class IlsEncTabs(NamedTuple):
    """Encoder lane tables: (len << 20) | code per symbol, split into two
    128-wide halves for lane-dim take_along_axis."""

    lo: jnp.ndarray  # (8, 128) int32, symbols 0..127
    hi: jnp.ndarray  # (8, 128) int32, symbols 128..255


class IlsDecTabs(NamedTuple):
    """Decoder tables: SMEM canonical limits + lane-dim bias/symbol tables.

    ``probe_lo``/``probe_hi`` hold a partial 8-bit flat LUT ((len << 8) | sym
    per top-8-bit window; 0 where the window's prefix belongs to a code
    longer than 8 bits — prefix-freedom keeps the sets disjoint).  With
    max_len <= 8 the LUT is total and ONE lane lookup replaces the whole
    canonical compare chain; with longer codes `ils_decode`'s hybrid probe
    resolves short codes from the LUT and falls back to a masked compare
    chain over levels >= 9 (the TPU form of the reference's per-thread LUT
    probe, `gpuhd/src/cuhd_gpu_decoder.cu:93-117`)."""

    lim: jnp.ndarray  # (1, 32) uint32 left-justified limits
    bias: jnp.ndarray  # (8, 128) int32 offsets[l] - first_code[l]
    sym_lo: jnp.ndarray  # (8, 128) int32 canonical ranks 0..127 -> symbol
    sym_hi: jnp.ndarray  # (8, 128) int32 canonical ranks 128..255 -> symbol
    probe_lo: jnp.ndarray  # (8, 128) int32 8-bit LUT, windows 0..127
    probe_hi: jnp.ndarray  # (8, 128) int32 8-bit LUT, windows 128..255


def ils_enc_tabs(table: CodeTable) -> IlsEncTabs:
    packed = (table.lengths.astype(np.int32) << 20) | table.codes.astype(np.int32)
    lo = np.tile(packed[:128][None], (SUBLANES, 1))
    hi = np.tile(packed[128:][None], (SUBLANES, 1))
    return IlsEncTabs(jnp.asarray(lo), jnp.asarray(hi))


def _probe_lut(table: CodeTable) -> np.ndarray:
    """256-entry partial flat LUT: (len << 8) | sym for every top-8-bit
    window whose first codeword fits 8 bits; 0 where the prefix belongs to
    a longer code (prefix-freedom makes the two sets disjoint)."""
    probe = np.zeros(256, np.int32)
    syms = table.symtab
    if syms.size == 0:
        return probe
    ls = table.lengths[syms].astype(np.int64)
    cs = table.codes[syms].astype(np.int64)
    short = (ls > 0) & (ls <= 8)
    for s, l, c in zip(syms[short], ls[short], cs[short]):
        start = int(c) << (8 - int(l))
        probe[start : start + (1 << (8 - int(l)))] = (int(l) << 8) | int(s)
    return probe


def ils_dec_tabs(table: CodeTable) -> IlsDecTabs:
    lim = np.zeros((1, 32), np.uint32)
    lim[0, : table.lim_left.shape[0]] = table.lim_left
    bias = (
        table.offsets.astype(np.int64) - table.first_code.astype(np.int64)
    ).astype(np.int32)
    bias_row = np.zeros(LANES, np.int32)
    bias_row[: bias.shape[0]] = bias
    bias_tab = np.tile(bias_row[None], (SUBLANES, 1))
    symtab = np.zeros(256, np.int32)
    symtab[: table.num_symbols] = table.symtab
    sym_lo = np.tile(symtab[:128][None], (SUBLANES, 1))
    sym_hi = np.tile(symtab[128:][None], (SUBLANES, 1))
    probe = _probe_lut(table)
    probe_lo = np.tile(probe[:128][None], (SUBLANES, 1))
    probe_hi = np.tile(probe[128:][None], (SUBLANES, 1))
    return IlsDecTabs(
        jnp.asarray(lim),
        jnp.asarray(bias_tab),
        jnp.asarray(sym_lo),
        jnp.asarray(sym_hi),
        jnp.asarray(probe_lo),
        jnp.asarray(probe_hi),
    )


def _lane_lookup(tab_lo, tab_hi, idx):
    """256-entry lane-table lookup of an (8, 128) int32 index in [0, 256)."""
    low = jnp.take_along_axis(tab_lo, idx & 127, axis=1)
    high = jnp.take_along_axis(tab_hi, idx & 127, axis=1)
    return jnp.where(idx < 128, low, high)


def _mu_base(i, snum, boff, w_cap, w_band):
    """Clamped refill-window base row for body iteration i (scalars)."""
    mu = (i * snum) >> 16
    return jnp.clip(mu + boff, 0, w_cap - w_band)


def _rot_fwd(w, gi):
    """Torus-rotate word row ``gi`` onto its streams (lane decorrelation,
    `core/ils_ref.py::ILS_ROT_SUB/ILS_ROT_LANE`): stream (sub, lane) reads
    word ((sub - gi*ROT_SUB) % 8, (lane - gi*ROT_LANE) % 128)."""
    w = pltpu.roll(w, (gi * ILS_ROT_SUB) % SUBLANES, 0)
    return pltpu.roll(w, (gi * ILS_ROT_LANE) % LANES, 1)


def _rot_inv(w, gi):
    """Inverse of `_rot_fwd`: put decoded stream words back at the original
    word positions of row ``gi`` (decoded output stays the data)."""
    w = pltpu.roll(w, (-(gi * ILS_ROT_SUB)) % SUBLANES, 0)
    return pltpu.roll(w, (-(gi * ILS_ROT_LANE)) % LANES, 1)


def _acc_insert(a, used, entry):
    """OR one codeword into a 6-word (192-bit) MSB-first accumulator at bit
    offset ``used``.  entry = (len << 20) | code; codes are <= 16 bits so a
    word-crossing spill touches at most the next word."""
    u32 = jnp.uint32
    ln = entry >> 20
    code = (entry & 0xFFFF).astype(u32)
    lns = ln.astype(u32)
    # (code << 1) << (31 - lns) == code << (32 - lns) but stays defined at
    # lns == 0 (absent-symbol entries are all-zero)
    c_left = (code << u32(1)) << (u32(31) - lns)
    r = used.astype(u32) & u32(31)
    j0 = used >> 5  # word containing bit offset `used`; 0..5
    hi = c_left >> r
    lo = (c_left << u32(1)) << ((u32(31) - r) & u32(31))
    a = list(a)
    for j in range(6):
        a[j] = a[j] | jnp.where(j0 == j, hi, u32(0))
        if j >= 1:
            a[j] = a[j] | jnp.where(j0 + 1 == j, lo, u32(0))
    return tuple(a), used + ln


# ----------------------------------------------------------------------
# Pass A: schedule simulation from lengths
# ----------------------------------------------------------------------
def _lengths_kernel(
    params_ref, lenlo_ref, lenhi_ref, data_ref,
    bits_ref, dnmin_ref, dnmax_ref, enmin_ref, enmax_ref, carry, *, k,
    n_win, rot, interpret
):
    """Schedule-v2 certification: one pair event per 4-symbol body.

    Envelopes are tracked per ILS_WIN-body window (see `core/ils_ref.py`):
    the unroll factors all divide ILS_WIN, so a U-group never straddles a
    window boundary and each group does ONE read-modify-write of its
    window's min/max rows."""
    shape = (SUBLANES, LANES)
    c_idx = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    iters = _chunk_iters(k)

    @pl.when(c_idx == 0)
    def _init():
        carry[0] = jnp.full(shape, 128, jnp.int32)  # valid
        carry[1] = jnp.zeros(shape, jnp.int32)      # used
        carry[2] = jnp.full(shape, 2, jnp.int32)    # pptr (pairs)
        carry[3] = jnp.zeros(shape, jnp.int32)      # e_ptr (pairs)
        dnmin_ref[0] = jnp.full((n_win,) + shape, _BIG, jnp.int32)
        dnmax_ref[0] = jnp.full((n_win,) + shape, -_BIG, jnp.int32)
        enmin_ref[0] = jnp.full((n_win,) + shape, _BIG, jnp.int32)
        enmax_ref[0] = jnp.full((n_win,) + shape, -_BIG, jnp.int32)

    U = _unroll(iters, interpret=interpret)  # lengths pass has no band

    def one(i, valid, used, pptr, e_ptr, dn, dx, en, ex):
        w = data_ref[i]
        if rot:
            w = _rot_fwd(w, c_idx * iters + i)
        mu = ((c_idx * iters + i) * params_ref[0]) >> 16
        l4 = jnp.zeros(shape, jnp.int32)
        for j in range(4):
            sym = (w >> (8 * j)) & 255
            entry = _lane_lookup(lenlo_ref[:], lenhi_ref[:], sym)
            l4 = l4 + (entry >> 20)
        valid = valid - l4
        used = used + l4
        refill = valid <= 64
        dev = pptr - mu
        dn = jnp.minimum(dn, jnp.where(refill, dev, _BIG))
        dx = jnp.maximum(dx, jnp.where(refill, dev, -_BIG))
        pptr = pptr + refill.astype(jnp.int32)
        valid = valid + jnp.where(refill, 64, 0)
        emit = used >= 64
        dev_e = e_ptr - mu
        en = jnp.minimum(en, jnp.where(emit, dev_e, _BIG))
        ex = jnp.maximum(ex, jnp.where(emit, dev_e, -_BIG))
        e_ptr = e_ptr + emit.astype(jnp.int32)
        used = used - jnp.where(emit, 64, 0)
        return valid, used, pptr, e_ptr, dn, dx, en, ex

    def _acc_window(ref_mn, ref_mx, w, gmn, gmx):
        ref_mn[0, pl.ds(w, 1)] = jnp.minimum(ref_mn[0, pl.ds(w, 1)], gmn[None])
        ref_mx[0, pl.ds(w, 1)] = jnp.maximum(ref_mx[0, pl.ds(w, 1)], gmx[None])

    def body(j, st):
        gdn = jnp.full(shape, _BIG, jnp.int32)
        gdx = jnp.full(shape, -_BIG, jnp.int32)
        gen = jnp.full(shape, _BIG, jnp.int32)
        gex = jnp.full(shape, -_BIG, jnp.int32)
        st = st + (gdn, gdx, gen, gex)
        for u in range(U):
            st = one(U * j + u, *st)
        valid, used, pptr, e_ptr, gdn, gdx, gen, gex = st
        w = (c_idx * iters + U * j) // ILS_WIN
        _acc_window(dnmin_ref, dnmax_ref, w, gdn, gdx)
        _acc_window(enmin_ref, enmax_ref, w, gen, gex)
        return valid, used, pptr, e_ptr

    state = tuple(carry[j] for j in range(4))
    state = jax.lax.fori_loop(0, iters // U, body, state, unroll=False)
    for j in range(4):
        carry[j] = state[j]

    @pl.when(c_idx == n_chunks - 1)
    def _fini():
        valid, used, pptr, e_ptr = state
        mu_last = ((k // 4 - 1) * params_ref[0]) >> 16
        flush = used > 0
        dev_f = e_ptr - mu_last
        _acc_window(
            enmin_ref, enmax_ref, n_win - 1,
            jnp.where(flush, dev_f, _BIG), jnp.where(flush, dev_f, -_BIG),
        )
        bits_ref[0] = 64 * e_ptr + used


@functools.partial(jax.jit, static_argnames=("k", "rot", "interpret"))
def ils_lengths_pass(data_i32, params, enc: IlsEncTabs, *, k, rot=False,
                     interpret=False):
    """Schedule pass over (n_tiles*k//4, 8, 128) int32 data.

    params: (2,) int32 [snum, unused].  Returns (bits (n_tiles, 8, 128),
    dec_min, dec_max, enc_min, enc_max — each (n_tiles, n_win, 8, 128)
    int32, per-stream): total bits and the per-ILS_WIN-window
    refill/emission deviation envelopes relative to mu_i.
    """
    n_tiles = data_i32.shape[0] // (k // 4)
    n_chunks = _n_chunks(k)
    iters = _chunk_iters(k)
    n_win = ils_n_win(k)
    kern = functools.partial(
        _lengths_kernel, k=k, n_win=n_win, rot=rot, interpret=interpret
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (iters, SUBLANES, LANES),
                lambda t, c, p: (t * n_chunks + c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda t, c, p: (t, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ] + [
            pl.BlockSpec(
                (1, n_win, SUBLANES, LANES), lambda t, c, p: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(4)
        ],
        scratch_shapes=[pltpu.VMEM((4, SUBLANES, LANES), jnp.int32)],
    )
    env_sd = jax.ShapeDtypeStruct((n_tiles, n_win, SUBLANES, LANES), jnp.int32)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32),
            env_sd, env_sd, env_sd, env_sd,
        ],
        interpret=interpret,
    )(params, enc.lo, enc.hi, data_i32)


# ----------------------------------------------------------------------
# Pass B: bit packing
# ----------------------------------------------------------------------
def _pack_kernel(
    params_ref, boffs_ref, starts_ref, lo_tab, hi_tab, data_ref, out_ref,
    pay, carry, sem, *, k, w_cap, w_band, n_win, flush_g, rot, interpret
):
    """Schedule-v2 pack: 192-bit accumulator, deferred two-body flush.

    ``w_band`` is in PAIRS.  The banded one-hot WRITE (the TPU stand-in for
    the reference's atomicOr, `encoder.cu:317-347`) is the dominant pack
    cost, so the window read-modify-write runs once per TWO bodies: the
    accumulator holds up to 191 bits (two bodies of <= 64 plus a 63-bit
    remainder), and the flush retires up to two consecutive pairs at
    ``rel``/``rel+1`` in one window pass.  Emission order and e_ptr
    sequence are identical to the certified per-body schedule; the window
    is widened by G pairs to cover the deferred body's base drift (mu
    advances <= 1 pair/body), mirroring the group-clamp proof in
    `_mu_base` terms: base_g <= base_i <= base_g + G."""
    t = pl.program_id(0)
    c_idx = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    iters = _chunk_iters(k)
    shape = (SUBLANES, LANES)
    u32 = jnp.uint32
    cap_pairs = w_cap // 2

    U = _unroll(iters, w_band, interpret)
    G = flush_g if flush_g and U % flush_g == 0 else (2 if U % 2 == 0 else 1)
    W = min(w_band + G, cap_pairs)  # flush window width (pairs)
    iota_pairs = jax.lax.broadcasted_iota(
        jnp.int32, (W, 1, SUBLANES, LANES), 0
    )

    @pl.when(c_idx == 0)
    def _init():
        pay[:] = jnp.zeros((w_cap, SUBLANES, LANES), jnp.int32)
        for j in range(6):
            carry[j] = jnp.zeros(shape, jnp.int32)  # 192-bit accumulator
        carry[6] = jnp.zeros(shape, jnp.int32)  # used
        carry[7] = jnp.zeros(shape, jnp.int32)  # e_ptr (pairs)

    def flush2(a, used, e_ptr, base, final=False):
        """Retire up to two pairs (used>=64, used>=128) in one window RMW.

        ``final`` flushes the zero-padded partial pair instead (used>0;
        used<=63 there, so the second slot never fires)."""
        e1 = used > 0 if final else used >= 64
        e2 = used >= 128
        rel = e_ptr - base
        v00 = jnp.where(e1, pltpu.bitcast(a[0], jnp.int32), 0)
        v01 = jnp.where(e1, pltpu.bitcast(a[1], jnp.int32), 0)
        v10 = jnp.where(e2, pltpu.bitcast(a[2], jnp.int32), 0)
        v11 = jnp.where(e2, pltpu.bitcast(a[3], jnp.int32), 0)
        # one compare per PAIR position, shared by the pair's two rows
        m1 = iota_pairs == rel[None, None]
        m2 = iota_pairs == (rel + 1)[None, None]
        contrib = jnp.where(m1, jnp.stack([v00, v01])[None], 0) | jnp.where(
            m2, jnp.stack([v10, v11])[None], 0
        )
        window = pay[pl.ds(2 * base, 2 * W)]
        pay[pl.ds(2 * base, 2 * W)] = window | contrib.reshape(
            2 * W, SUBLANES, LANES
        )
        # shift the accumulator down by the retired pair count (0, 1 or 2)
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

    def insert4(i, a, used):
        w = data_ref[i]
        if rot:
            w = _rot_fwd(w, c_idx * iters + i)
        for j in range(4):
            sym = (w >> (8 * j)) & 255
            a, used = _acc_insert(
                a, used, _lane_lookup(lo_tab[:], hi_tab[:], sym)
            )
        return a, used

    def body(jj, st):
        a, used, e_ptr = st
        wi = (c_idx * iters + U * jj) // ILS_WIN  # constant over the group
        boff = boffs_ref[t * n_win + wi]
        for g in range(U // G):
            i = U * jj + G * g
            base = _mu_base(
                c_idx * iters + i, params_ref[0], boff, cap_pairs, W
            )
            for b in range(G):
                a, used = insert4(i + b, a, used)
            a, used, e_ptr = flush2(a, used, e_ptr, base)
        return a, used, e_ptr

    state = (
        tuple(pltpu.bitcast(carry[j], u32) for j in range(6)),
        carry[6],
        carry[7],
    )
    a, used, e_ptr = jax.lax.fori_loop(0, iters // U, body, state, unroll=False)
    for j in range(6):
        carry[j] = pltpu.bitcast(a[j], jnp.int32)
    carry[6] = used
    carry[7] = e_ptr

    @pl.when(c_idx == n_chunks - 1)
    def _fini():
        boff = boffs_ref[t * n_win + (n_win - 1)]
        base = _mu_base(k // 4 - 1, params_ref[0], boff, cap_pairs, W)
        flush2(a, used, e_ptr, base, final=True)
        # ship the finished tile payload straight to its COMPACT offset in
        # HBM (row starts are known before packing).  The write covers w_cap
        # rows — real rows then zero padding that overlaps the next tile's
        # region — and grid steps run in tile order, so the next tile's DMA
        # overwrites the padding: same overlap discipline as decode's slack.
        dma = pltpu.make_async_copy(
            pay, out_ref.at[pl.ds(starts_ref[t], w_cap)], sem
        )
        dma.start()
        dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "w_cap", "w_band", "total_rows", "rot", "interpret", "flush_g"
    ),
)
def ils_pack(data_i32, params, boffs, row_starts, enc: IlsEncTabs, *, k,
             w_cap, w_band, total_rows, rot=False, interpret=False,
             flush_g=None):
    """Pack pass: returns compact payload rows (total_rows + w_cap, 8, 128).

    boffs: (n_tiles, n_win) int32 windowed emission band anchors.
    row_starts: (n_tiles,) int32 compact row offsets (cumsum of W_t from
    ils_lengths_pass); each tile DMAs its payload directly there, so no
    separate compaction pass exists.  The trailing w_cap rows are slack.
    """
    if flush_g is not None and flush_g not in (1, 2):
        raise ValueError(
            "flush_g must be 1 or 2: the 192-bit accumulator and two-pair "
            "flush cannot defer more than two bodies"
        )
    n_tiles = data_i32.shape[0] // (k // 4)
    n_chunks = _n_chunks(k)
    iters = _chunk_iters(k)
    n_win = ils_n_win(k)
    boffs = boffs.reshape(n_tiles * n_win)
    kern = functools.partial(
        _pack_kernel, k=k, w_cap=w_cap, w_band=w_band, n_win=n_win,
        flush_g=flush_g, rot=rot, interpret=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, p, b, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, p, b, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (iters, SUBLANES, LANES),
                lambda t, c, p, b, s: (t * n_chunks + c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((w_cap, SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((8, SUBLANES, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (total_rows + w_cap, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(params, boffs, row_starts, enc.lo, enc.hi, data_i32)


# ----------------------------------------------------------------------
# Fused certify + pack (single data pass)
# ----------------------------------------------------------------------
# Emission band guess for the fused path, in pairs, centered on mu.  The
# certified schedule is only measured DURING this pass, so the pack cannot
# know each tile's emission envelope up front; measured lane deviations are
# ~[-10, +15] pairs, so a 32-pair window centered at mu-16 covers real data
# with wide margin.  Any emission falling outside raises the per-tile
# violation flag and the caller falls back to the two-pass path — the flag,
# not the estimate, carries correctness.
FUSED_E_BAND = 32


def _pack_certify_kernel(
    params_ref, lo_tab, hi_tab, data_ref,
    out_pay, bits_ref, dnmin_ref, dnmax_ref, viol_ref,
    pay, carry, sem, *, k, stride_rows, e_band, n_win, flush_g, anchor, rot,
    interpret
):
    """One-pass encode: pack into a worst-case-stride payload region while
    simulating the decoder's refill schedule (the certification that
    `ils_lengths_pass` produces in the two-pass path).

    Per tile outputs: total bits, decode-refill deviation envelope, and an
    emission-out-of-band violation flag.  Payload for tile t occupies rows
    [t*stride_rows, (t+1)*stride_rows) of out_pay; `ils_compact` squeezes
    tiles to their measured row counts afterwards."""
    t = pl.program_id(0)
    c_idx = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    iters = _chunk_iters(k)
    shape = (SUBLANES, LANES)
    u32 = jnp.uint32
    cap_pairs = stride_rows // 2

    U = _unroll(iters, e_band, interpret)
    G = flush_g if flush_g and U % flush_g == 0 else (2 if U % 2 == 0 else 1)
    # the stale laggard base lags one flush (<= 2 retired pairs) behind
    W = min(e_band + G + (2 if anchor == "laggard" else 0), cap_pairs)
    iota_pairs = jax.lax.broadcasted_iota(
        jnp.int32, (W, 1, SUBLANES, LANES), 0
    )

    boff_est = -(e_band // 2)
    lag = anchor == "laggard"

    # Tiered window anchoring (static choice, escalated by the caller on
    # violation — `ops/ils.py::ils_encode_to_device`):
    # - "mu": window centered on the schedule position mu (scalar ALU,
    #   free).  Covers content whose emission rate tracks the table's
    #   mean; heterogeneous content drifts out and flags a violation.
    # - "laggard": window floored at the LAGGARD stream's write position,
    #   so only genuine cross-lane spread (which rotation narrows) can
    #   violate.  `jnp.min` is a cross-lane reduction whose latency would
    #   land on the serial pack chain every flush (measured −32% pack on
    #   v5e), so the base is STALE by one flush: each flush consumes the
    #   base computed from the PREVIOUS flush's e_ptr — still a valid
    #   floor (write positions only advance, so rel >= 0 holds) — and the
    #   reduction's latency hides under the following G bodies.  The
    #   window is 2 pairs wider to cover the one-flush advance.

    def _lag_base(e_ptr):
        return jnp.clip(jnp.min(e_ptr), 0, cap_pairs - W)

    @pl.when(c_idx == 0)
    def _init():
        pay[:] = jnp.zeros((stride_rows, SUBLANES, LANES), jnp.int32)
        for j in range(6):
            carry[j] = jnp.zeros(shape, jnp.int32)  # 192-bit accumulator
        carry[6] = jnp.zeros(shape, jnp.int32)   # used
        carry[7] = jnp.zeros(shape, jnp.int32)   # e_ptr (pairs)
        carry[8] = jnp.full(shape, 128, jnp.int32)  # dec sim: valid
        carry[9] = jnp.full(shape, 2, jnp.int32)    # dec sim: pptr
        carry[10] = jnp.zeros(shape, jnp.int32)  # emission violation
        carry[11] = jnp.zeros(shape, jnp.int32)  # stale laggard base
        dnmin_ref[0] = jnp.full((n_win,) + shape, _BIG, jnp.int32)
        dnmax_ref[0] = jnp.full((n_win,) + shape, -_BIG, jnp.int32)

    def flush2(a, used, e_ptr, base, viol, final=False):
        e1 = used > 0 if final else used >= 64
        e2 = used >= 128
        rel = e_ptr - base
        viol = viol | (
            (e1 & ((rel < 0) | (rel >= W)))
            | (e2 & ((rel + 1 < 0) | (rel + 1 >= W)))
        ).astype(jnp.int32)
        v00 = jnp.where(e1, pltpu.bitcast(a[0], jnp.int32), 0)
        v01 = jnp.where(e1, pltpu.bitcast(a[1], jnp.int32), 0)
        v10 = jnp.where(e2, pltpu.bitcast(a[2], jnp.int32), 0)
        v11 = jnp.where(e2, pltpu.bitcast(a[3], jnp.int32), 0)
        relc = jnp.clip(rel, 0, W - 1)
        m1 = iota_pairs == relc[None, None]
        m2 = iota_pairs == jnp.clip(rel + 1, 0, W - 1)[None, None]
        # out-of-band contributions are zeroed (the viol flag already voids
        # the whole tile) so the clipped position stays clean
        v00 = jnp.where((rel >= 0) & (rel < W), v00, 0)
        v01 = jnp.where((rel >= 0) & (rel < W), v01, 0)
        v10 = jnp.where((rel + 1 >= 0) & (rel + 1 < W), v10, 0)
        v11 = jnp.where((rel + 1 >= 0) & (rel + 1 < W), v11, 0)
        contrib = jnp.where(m1, jnp.stack([v00, v01])[None], 0) | jnp.where(
            m2, jnp.stack([v10, v11])[None], 0
        )
        window = pay[pl.ds(2 * base, 2 * W)]
        pay[pl.ds(2 * base, 2 * W)] = window | contrib.reshape(
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
        return a, used - 64 * cnt, e_ptr + cnt, viol

    def body(jj, st):
        a, used, e_ptr, valid, pptr, viol, base = st
        # per-window envelope accumulation: a U-group never straddles an
        # ILS_WIN boundary (every unroll factor divides ILS_WIN), so one
        # RMW per group retires its window contribution
        gdn = jnp.full(shape, _BIG, jnp.int32)
        gdx = jnp.full(shape, -_BIG, jnp.int32)
        for g in range(U // G):
            i = U * jj + G * g
            gi0 = c_idx * iters + i
            if not lag:
                base = _mu_base(gi0, params_ref[0], boff_est, cap_pairs, W)
            for b in range(G):
                w = data_ref[i + b]
                if rot:
                    w = _rot_fwd(w, gi0 + b)
                used0 = used
                for j in range(4):
                    sym = (w >> (8 * j)) & 255
                    a, used = _acc_insert(
                        a, used, _lane_lookup(lo_tab[:], hi_tab[:], sym)
                    )
                # decoder-schedule simulation (certification), body-exact:
                # matches _lengths_kernel's event cadence and mu
                l4 = used - used0
                mu = ((gi0 + b) * params_ref[0]) >> 16
                valid = valid - l4
                refill = valid <= 64
                dev = pptr - mu
                gdn = jnp.minimum(gdn, jnp.where(refill, dev, _BIG))
                gdx = jnp.maximum(gdx, jnp.where(refill, dev, -_BIG))
                pptr = pptr + refill.astype(jnp.int32)
                valid = valid + jnp.where(refill, 64, 0)
            a, used, e_ptr, viol = flush2(a, used, e_ptr, base, viol)
            if lag:
                # base for the NEXT flush — the reduction's latency hides
                # under the next G bodies instead of blocking this flush
                base = _lag_base(e_ptr)
        wi = (c_idx * iters + U * jj) // ILS_WIN
        dnmin_ref[0, pl.ds(wi, 1)] = jnp.minimum(
            dnmin_ref[0, pl.ds(wi, 1)], gdn[None]
        )
        dnmax_ref[0, pl.ds(wi, 1)] = jnp.maximum(
            dnmax_ref[0, pl.ds(wi, 1)], gdx[None]
        )
        return a, used, e_ptr, valid, pptr, viol, base

    state = (
        tuple(pltpu.bitcast(carry[j], u32) for j in range(6)),
        carry[6], carry[7], carry[8], carry[9], carry[10],
        carry[11][0, 0],
    )
    st = jax.lax.fori_loop(0, iters // U, body, state, unroll=False)
    a, used, e_ptr, valid, pptr, viol, base = st
    for j in range(6):
        carry[j] = pltpu.bitcast(a[j], jnp.int32)
    carry[6], carry[7], carry[8], carry[9] = used, e_ptr, valid, pptr
    carry[10] = viol
    carry[11] = jnp.full(shape, base)

    @pl.when(c_idx == n_chunks - 1)
    def _fini():
        bits_ref[0] = 64 * e_ptr + used
        fbase = base if lag else _mu_base(
            k // 4 - 1, params_ref[0], boff_est, cap_pairs, W
        )
        _, _, _, viol2 = flush2(a, used, e_ptr, fbase, viol, final=True)
        viol_ref[0] = viol2
        dma = pltpu.make_async_copy(
            pay, out_pay.at[pl.ds(t * stride_rows, stride_rows)], sem
        )
        dma.start()
        dma.wait()

    @pl.when((c_idx == n_chunks - 1) & (t == pl.num_programs(0) - 1))
    def _zero_slack():
        # the trailing stride_rows slack rows (read by ils_compact's
        # over-reads for the last tile) must be zeros, matching the
        # two-pass path's zeroed scratch padding; ANY outputs are not
        # zero-initialized on TPU
        pay[:] = jnp.zeros((stride_rows, SUBLANES, LANES), jnp.int32)
        dma = pltpu.make_async_copy(
            pay,
            out_pay.at[pl.ds(pl.num_programs(0) * stride_rows, stride_rows)],
            sem,
        )
        dma.start()
        dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "stride_rows", "rot", "interpret", "flush_g", "e_band", "anchor"
    ),
)
def ils_pack_certify(data_i32, params, enc: IlsEncTabs, *, k, stride_rows,
                     rot=False, interpret=False, flush_g=None,
                     e_band=FUSED_E_BAND, anchor="mu"):
    """Fused single-pass encode at worst-case tile stride.

    Returns (payload_strided (n_tiles*stride_rows + stride_rows, 8, 128),
    bits, viol (n_tiles, 8, 128) int32, and windowed dec_min, dec_max
    (n_tiles, n_win, 8, 128) int32).  The
    trailing stride_rows rows are zero slack for `ils_compact`'s
    over-reads.  If any element of viol is nonzero the payload is void and
    the caller must use the two-pass path.

    ``anchor``: emission-window anchoring — "mu" (default; scalar schedule
    position, fastest) or "laggard" (cross-lane min of write positions;
    drift-immune retry tier — see `_win_base`)."""
    if flush_g is not None and flush_g not in (1, 2):
        raise ValueError("flush_g must be 1 or 2")
    if anchor not in ("mu", "laggard"):
        raise ValueError("anchor must be 'mu' or 'laggard'")
    n_tiles = data_i32.shape[0] // (k // 4)
    n_chunks = _n_chunks(k)
    iters = _chunk_iters(k)
    n_win = ils_n_win(k)
    kern = functools.partial(
        _pack_certify_kernel, k=k, stride_rows=stride_rows, e_band=e_band,
        n_win=n_win, flush_g=flush_g, anchor=anchor, rot=rot,
        interpret=interpret,
    )
    small = pl.BlockSpec(
        (1, SUBLANES, LANES), lambda t, c, p: (t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    winspec = pl.BlockSpec(
        (1, n_win, SUBLANES, LANES), lambda t, c, p: (t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (iters, SUBLANES, LANES),
                lambda t, c, p: (t * n_chunks + c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            small, winspec, winspec, small,
        ],
        scratch_shapes=[
            pltpu.VMEM((stride_rows, SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((12, SUBLANES, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    small_sd = jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32)
    env_sd = jax.ShapeDtypeStruct((n_tiles, n_win, SUBLANES, LANES), jnp.int32)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                ((n_tiles + 1) * stride_rows, SUBLANES, LANES), jnp.int32
            ),
            small_sd, env_sd, env_sd, small_sd,
        ],
        interpret=interpret,
    )(params, enc.lo, enc.hi, data_i32)


def _pack_certify_stream_kernel(
    params_ref, lo_tab, hi_tab, data_ref,
    out_pay, bits_ref, dnmin_ref, dnmax_ref, viol_ref,
    pay, carry, sem, *, k, stride_rows, e_band, n_win, span_pairs, iters,
    flush_g, anchor, rot, interpret
):
    """Streaming fused certify+pack: a sliding VMEM emission window.

    Same schedule/certification semantics as `_pack_certify_kernel`, but the
    pack scratch holds only the LIVE span of pairs — emissions trail mu
    monotonically (mu advances <= 1 pair per body, so the span per chunk is
    bounded by ``iters + W`` pairs) — instead of the tile's full worst-case
    stride.  This lifts the FUSED_STRIDE_BUDGET VMEM bound: k = 16384
    (ratio mode) gets the one-pass encode (README roadmap item 1; the
    reference encoder is likewise single-pass over data per phase,
    `Huffman_coding_Gap_arrays/encoder/src/encoder.cu:142-355`).

    Addressing: ``floor_c`` (carried in scratch) is the emission-window
    floor at chunk entry — the laggard stream's write position, clipped to
    [0, cap - W]; every later flush base is >= floor_c because per-lane
    write positions only advance — so scratch row 0 maps to pair floor_c.
    At each chunk end a FIXED 2*iters-row DMA ships [floor_c, floor_c +
    iters) to the strided HBM region — chunks overlap and a later chunk's
    DMA rewrites any not-yet-final rows a previous one shipped, so the
    final HBM content is complete; the last chunk ships the whole remaining
    span.  (The floor advances at most iters/2 pairs per chunk — 4 symbols
    of <= 16 bits per body — so the fixed ship always covers it.)  The live
    tail then shifts to row 0 and the vacated rows are re-zeroed (in-band
    never-written lane slots must stay zero for bit-exactness with the
    oracle payload)."""
    t = pl.program_id(0)
    c_idx = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    shape = (SUBLANES, LANES)
    u32 = jnp.uint32
    cap_pairs = stride_rows // 2
    span_rows = 2 * span_pairs

    U = _unroll(iters, e_band, interpret)
    G = flush_g if flush_g and U % flush_g == 0 else (2 if U % 2 == 0 else 1)
    # the stale laggard base lags one flush (<= 2 retired pairs) behind
    W = min(e_band + G + (2 if anchor == "laggard" else 0), cap_pairs)
    tail_rows = 2 * W
    iota_pairs = jax.lax.broadcasted_iota(
        jnp.int32, (W, 1, SUBLANES, LANES), 0
    )

    boff_est = -(e_band // 2)
    lag = anchor == "laggard"

    # Tiered anchoring with the same STALE laggard base as
    # `_pack_certify_kernel` (the cross-lane min hides under the next G
    # bodies).  Both anchors are monotone (mu is non-decreasing in gi;
    # per-lane write positions only advance) and >= the chunk-entry floor,
    # so brel stays non-negative; both advance <= 1 pair/body, so the
    # fixed 2*iters-row per-chunk ship always covers the floor's advance.

    def _lag_base(e_ptr):
        return jnp.clip(jnp.min(e_ptr), 0, cap_pairs - W)

    @pl.when(c_idx == 0)
    def _init():
        pay[:] = jnp.zeros((span_rows, SUBLANES, LANES), jnp.int32)
        for j in range(6):
            carry[j] = jnp.zeros(shape, jnp.int32)  # 192-bit accumulator
        carry[6] = jnp.zeros(shape, jnp.int32)   # used
        carry[7] = jnp.zeros(shape, jnp.int32)   # e_ptr (pairs)
        carry[8] = jnp.full(shape, 128, jnp.int32)  # dec sim: valid
        carry[9] = jnp.full(shape, 2, jnp.int32)    # dec sim: pptr
        carry[10] = jnp.zeros(shape, jnp.int32)  # emission violation
        carry[11] = jnp.zeros(shape, jnp.int32)  # window floor (scalar bcast)
        carry[12] = jnp.zeros(shape, jnp.int32)  # stale laggard base
        dnmin_ref[0] = jnp.full((n_win,) + shape, _BIG, jnp.int32)
        dnmax_ref[0] = jnp.full((n_win,) + shape, -_BIG, jnp.int32)

    floor_c = carry[11][0, 0]

    def flush2(a, used, e_ptr, base, viol, final=False):
        e1 = used > 0 if final else used >= 64
        e2 = used >= 128
        rel = e_ptr - base
        viol = viol | (
            (e1 & ((rel < 0) | (rel >= W)))
            | (e2 & ((rel + 1 < 0) | (rel + 1 >= W)))
        ).astype(jnp.int32)
        v00 = jnp.where(e1, pltpu.bitcast(a[0], jnp.int32), 0)
        v01 = jnp.where(e1, pltpu.bitcast(a[1], jnp.int32), 0)
        v10 = jnp.where(e2, pltpu.bitcast(a[2], jnp.int32), 0)
        v11 = jnp.where(e2, pltpu.bitcast(a[3], jnp.int32), 0)
        relc = jnp.clip(rel, 0, W - 1)
        m1 = iota_pairs == relc[None, None]
        m2 = iota_pairs == jnp.clip(rel + 1, 0, W - 1)[None, None]
        v00 = jnp.where((rel >= 0) & (rel < W), v00, 0)
        v01 = jnp.where((rel >= 0) & (rel < W), v01, 0)
        v10 = jnp.where((rel + 1 >= 0) & (rel + 1 < W), v10, 0)
        v11 = jnp.where((rel + 1 >= 0) & (rel + 1 < W), v11, 0)
        contrib = jnp.where(m1, jnp.stack([v00, v01])[None], 0) | jnp.where(
            m2, jnp.stack([v10, v11])[None], 0
        )
        brel = 2 * (base - floor_c)  # scratch row of the window
        window = pay[pl.ds(brel, 2 * W)]
        pay[pl.ds(brel, 2 * W)] = window | contrib.reshape(
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
        return a, used - 64 * cnt, e_ptr + cnt, viol

    def body(jj, st):
        a, used, e_ptr, valid, pptr, viol, base = st
        gdn = jnp.full(shape, _BIG, jnp.int32)
        gdx = jnp.full(shape, -_BIG, jnp.int32)
        for g in range(U // G):
            i = U * jj + G * g
            gi0 = c_idx * iters + i
            if not lag:
                base = _mu_base(gi0, params_ref[0], boff_est, cap_pairs, W)
            for b in range(G):
                w = data_ref[i + b]
                if rot:
                    w = _rot_fwd(w, gi0 + b)
                used0 = used
                for j in range(4):
                    sym = (w >> (8 * j)) & 255
                    a, used = _acc_insert(
                        a, used, _lane_lookup(lo_tab[:], hi_tab[:], sym)
                    )
                l4 = used - used0
                mu = ((gi0 + b) * params_ref[0]) >> 16
                valid = valid - l4
                refill = valid <= 64
                dev = pptr - mu
                gdn = jnp.minimum(gdn, jnp.where(refill, dev, _BIG))
                gdx = jnp.maximum(gdx, jnp.where(refill, dev, -_BIG))
                pptr = pptr + refill.astype(jnp.int32)
                valid = valid + jnp.where(refill, 64, 0)
            a, used, e_ptr, viol = flush2(a, used, e_ptr, base, viol)
            if lag:
                base = _lag_base(e_ptr)  # for the NEXT flush (stale)
        wi = (c_idx * iters + U * jj) // ILS_WIN
        dnmin_ref[0, pl.ds(wi, 1)] = jnp.minimum(
            dnmin_ref[0, pl.ds(wi, 1)], gdn[None]
        )
        dnmax_ref[0, pl.ds(wi, 1)] = jnp.maximum(
            dnmax_ref[0, pl.ds(wi, 1)], gdx[None]
        )
        return a, used, e_ptr, valid, pptr, viol, base

    state = (
        tuple(pltpu.bitcast(carry[j], u32) for j in range(6)),
        carry[6], carry[7], carry[8], carry[9], carry[10],
        carry[12][0, 0],
    )
    st = jax.lax.fori_loop(0, iters // U, body, state, unroll=False)
    a, used, e_ptr, valid, pptr, viol, base = st
    for j in range(6):
        carry[j] = pltpu.bitcast(a[j], jnp.int32)
    carry[6], carry[7], carry[8], carry[9] = used, e_ptr, valid, pptr
    carry[10] = viol
    carry[12] = jnp.full(shape, base)

    @pl.when(c_idx == n_chunks - 1)
    def _fini():
        bits_ref[0] = 64 * e_ptr + used
        fbase = base if lag else _mu_base(
            k // 4 - 1, params_ref[0], boff_est, cap_pairs, W
        )
        _, _, _, viol2 = flush2(a, used, e_ptr, fbase, viol, final=True)
        viol_ref[0] = viol2
        # ship the whole remaining live span
        dma = pltpu.make_async_copy(
            pay,
            out_pay.at[pl.ds(t * stride_rows + 2 * floor_c, span_rows)],
            sem,
        )
        dma.start()
        dma.wait()

    @pl.when(c_idx < n_chunks - 1)
    def _ship_chunk():
        # fixed-size flush of [floor_c, floor_c + iters) — pairs beyond
        # floor_{c+1} are stale here and get rewritten by a later chunk
        dma = pltpu.make_async_copy(
            pay.at[pl.ds(0, 2 * iters)],
            out_pay.at[
                pl.ds(t * stride_rows + 2 * floor_c, 2 * iters)
            ],
            sem,
        )
        dma.start()
        dma.wait()
        # slide the live tail to row 0 and re-zero the vacated span; the
        # floor is the NEXT flush's window base (both anchors are monotone,
        # so every later flush base is >= it): the carried stale base for
        # laggard, the next chunk's first mu base otherwise
        floor_next = base if lag else _mu_base(
            (c_idx + 1) * iters, params_ref[0], boff_est, cap_pairs, W
        )
        carry[11] = jnp.full(shape, floor_next)
        shift = 2 * (floor_next - floor_c)
        tail = pay[pl.ds(shift, tail_rows)]
        pay[pl.ds(0, tail_rows)] = tail
        pay[pl.ds(tail_rows, span_rows - tail_rows)] = jnp.zeros(
            (span_rows - tail_rows, SUBLANES, LANES), jnp.int32
        )

    @pl.when((c_idx == n_chunks - 1) & (t == pl.num_programs(0) - 1))
    def _zero_slack():
        pay[:] = jnp.zeros((span_rows, SUBLANES, LANES), jnp.int32)
        for rep in range(-(-stride_rows // span_rows)):
            off = min(rep * span_rows, stride_rows - span_rows)
            dma = pltpu.make_async_copy(
                pay,
                out_pay.at[
                    pl.ds(pl.num_programs(0) * stride_rows + off, span_rows)
                ],
                sem,
            )
            dma.start()
            dma.wait()


def ils_stream_span_rows(k, stride_rows, e_band=FUSED_E_BAND,
                         chunk_cap=CHUNK_I):
    """Scratch rows `ils_pack_certify_stream` would need, or None when the
    streaming pack is not viable for this shape (single chunk — the window
    cannot slide — or a live span that would not beat the full stride).

    Live span: flush bases stay in [floor_c, floor_{c+1}] and the emission
    window extends W <= min(e_band + 2, stride//2) pairs past the base;
    floor advances <= iters pairs per chunk."""
    iters = _chunk_iters(k, chunk_cap)
    if (k // 4) // iters < 2:
        return None
    span_rows = 2 * (iters + min(e_band + 2, stride_rows // 2) + 4)
    if span_rows > stride_rows:
        return None
    return span_rows


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "stride_rows", "rot", "interpret", "flush_g", "e_band",
        "chunk_cap", "anchor"
    ),
)
def ils_pack_certify_stream(
    data_i32, params, enc: IlsEncTabs, *, k, stride_rows, rot=False,
    interpret=False, flush_g=None, e_band=FUSED_E_BAND, chunk_cap=CHUNK_I,
    anchor="mu",
):
    """Streaming fused single-pass encode (sliding emission window).

    Drop-in for `ils_pack_certify` when the worst-case stride exceeds VMEM
    (k = 8192/16384): same strided payload layout, same bits/envelope/
    violation contract, with ONE weaker guarantee: rows of a tile's stride
    region beyond its live coverage (above the final chunk's shipped span)
    are left UNSPECIFIED rather than zeroed — zero-filling them would DMA
    the worst-case stride after all.  Tile rows [0, w_tile) are always
    covered and exact, which is all `ils_compact` keeps; the trailing
    stride_rows slack region IS still zeroed for its over-reads.  Requires
    >= 2 chunks (the window must slide); `chunk_cap` is exposed so tests
    can exercise the sliding logic at small k in interpret mode."""
    if flush_g is not None and flush_g not in (1, 2):
        raise ValueError("flush_g must be 1 or 2")
    if anchor not in ("mu", "laggard"):
        raise ValueError("anchor must be 'mu' or 'laggard'")
    n_tiles = data_i32.shape[0] // (k // 4)
    iters = _chunk_iters(k, chunk_cap)
    n_chunks = (k // 4) // iters
    n_win = ils_n_win(k)
    span_rows = ils_stream_span_rows(k, stride_rows, e_band, chunk_cap)
    if span_rows is None:
        raise ValueError("streaming pack not viable; use ils_pack_certify")
    span_pairs = span_rows // 2
    kern = functools.partial(
        _pack_certify_stream_kernel, k=k, stride_rows=stride_rows,
        e_band=e_band, n_win=n_win, span_pairs=span_pairs, iters=iters,
        flush_g=flush_g, anchor=anchor, rot=rot, interpret=interpret,
    )
    small = pl.BlockSpec(
        (1, SUBLANES, LANES), lambda t, c, p: (t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    winspec = pl.BlockSpec(
        (1, n_win, SUBLANES, LANES), lambda t, c, p: (t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, p: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (iters, SUBLANES, LANES),
                lambda t, c, p: (t * n_chunks + c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            small, winspec, winspec, small,
        ],
        scratch_shapes=[
            pltpu.VMEM((span_rows, SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((13, SUBLANES, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    small_sd = jax.ShapeDtypeStruct((n_tiles, SUBLANES, LANES), jnp.int32)
    env_sd = jax.ShapeDtypeStruct((n_tiles, n_win, SUBLANES, LANES), jnp.int32)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                ((n_tiles + 1) * stride_rows, SUBLANES, LANES), jnp.int32
            ),
            small_sd, env_sd, env_sd, small_sd,
        ],
        interpret=interpret,
    )(params, enc.lo, enc.hi, data_i32)


def _compact_kernel(starts_ref, src_ref, out_ref, buf, sem, *, stride_rows,
                    w_cap):
    """Copy each tile's strided payload region to its compact row offset.

    Reads w_cap rows from the tile's stride region (over-reads spill into
    the next tile's region or the trailing slack; those rows land in this
    tile's compact slack and are overwritten by the next tile's copy —
    grid steps run in tile order, the same overlap discipline as the
    two-pass pack's direct DMA)."""
    t = pl.program_id(0)
    dma_in = pltpu.make_async_copy(
        src_ref.at[pl.ds(t * stride_rows, w_cap)], buf, sem
    )
    dma_in.start()
    dma_in.wait()
    dma_out = pltpu.make_async_copy(
        buf, out_ref.at[pl.ds(starts_ref[t], w_cap)], sem
    )
    dma_out.start()
    dma_out.wait()


@functools.partial(
    jax.jit,
    static_argnames=("stride_rows", "w_cap", "total_rows", "interpret"),
)
def ils_compact(payload_strided, row_starts, *, stride_rows, w_cap,
                total_rows, interpret=False):
    """Compact a strided fused-pack payload to the standard dense layout
    (total_rows + w_cap slack rows)."""
    n_tiles = row_starts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((w_cap, SUBLANES, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = functools.partial(
        _compact_kernel, stride_rows=stride_rows, w_cap=w_cap
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (total_rows + w_cap, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(row_starts, payload_strided)


# ----------------------------------------------------------------------
# Decode
# ----------------------------------------------------------------------
def _decode_kernel(
    starts_ref,
    params_ref,
    boffs_ref,
    lim_ref,
    bias_ref,
    symlo_ref,
    symhi_ref,
    plo_ref,
    phi_ref,
    payload_ref,
    out_ref,
    scratch,
    carry,
    sem,
    *,
    k,
    w_cap,
    w_band,
    max_len,
    min_len,
    nt,
    iters,
    unroll,
    lazy,
    n_win,
    rot,
    probe,
    chain,
    interpret,
):
    """Schedule-v2 decode: 128-bit register, one pair refill per body.

    ``w_band`` is in PAIRS — the one-hot candidate count is half that of
    word-granular refilling, which (with the refill rate also halved)
    removes most of the refill cost.

    ``nt`` tiles are decoded per grid step with their quad iterations
    interleaved in trace order: each tile's decode is one long serial
    dependence chain (register -> length -> shift -> register), so a single
    chain leaves the VPU pipeline mostly idle; independent chains fill the
    latency gaps (the TPU analog of the reference decoder occupying an SM
    with many independent warps, `gpuhd/src/cuhd_gpu_decoder.cu:145-159`)."""
    g = pl.program_id(0)
    c_idx = pl.program_id(1)

    u32 = jnp.uint32
    shape = (SUBLANES, LANES)
    cap_pairs = w_cap // 2
    iota_band = jax.lax.broadcasted_iota(jnp.int32, (w_band, SUBLANES, LANES), 0)

    @pl.when(c_idx == 0)
    def _load():
        for s in range(nt):
            dma = pltpu.make_async_copy(
                payload_ref.at[pl.ds(starts_ref[g * nt + s], w_cap)],
                scratch.at[s],
                sem,
            )
            dma.start()
            dma.wait()
            for j in range(4):
                carry[s, j] = scratch[s, j]
            carry[s, 4] = jnp.full(shape, 128, jnp.int32)  # valid
            carry[s, 5] = jnp.full(shape, 2, jnp.int32)    # pptr (pairs)

    def _chain_len(win, lo):
        # levels below the first occupied one are empty (their limits are
        # 0, the compare is always true), so the flag set starts at ``lo``;
        # the compares are mutually independent and tree-reduced to keep
        # the dependency chain logarithmic.  With a grouped ``chain`` spec
        # (one (level, weight) pair per DISTINCT limit —
        # `core/canonical.py::chain_spec`) runs of absent levels collapse
        # to ONE weighted compare; the spec is exact for lo == min_len
        # only, so the hybrid probe's levels>=9 chain stays dense.
        if chain is not None and lo == min_len:
            flags = [
                (win >= lim_ref[0, l]).astype(jnp.int32)
                if wt == 1
                else jnp.where(win >= lim_ref[0, l], wt, 0)
                for (l, wt) in chain
            ]
        else:
            flags = [
                (win >= lim_ref[0, l]).astype(jnp.int32)
                for l in range(lo, max_len)
            ]
        while len(flags) > 1:
            nxt = [a + b for a, b in zip(flags[::2], flags[1::2])]
            if len(flags) % 2:
                nxt.append(flags[-1])
            flags = nxt
        return lo + flags[0] if flags else jnp.full(shape, lo, jnp.int32)

    def _chain_sym(win, ln):
        lns = ln.astype(u32)
        value = (win >> (u32(32) - lns)).astype(jnp.int32)
        rank = jnp.take_along_axis(bias_ref[:], ln, axis=1) + value
        return _lane_lookup(symlo_ref[:], symhi_ref[:], rank & 255), lns

    def _sym_ln(win):
        if probe and max_len <= 8:
            # ONE 256-entry lane probe on the top byte replaces the compare
            # chain, the bias gather and the rank lookup (the reference's
            # per-thread LUT probe, `cuhd_gpu_decoder.cu:93-117`, in
            # lane-table form).  LUT expansion makes the entry independent
            # of the tail bits.
            idx = (win >> u32(24)).astype(jnp.int32)
            e = _lane_lookup(plo_ref[:], phi_ref[:], idx)
            ln = e >> 8
            return e & 255, ln, ln.astype(u32)
        if probe:
            # hybrid: the probe resolves codes <= 8 bits outright (entry 0
            # marks a long-code prefix — prefix-freedom makes the sets
            # disjoint), and the masked canonical path only carries the
            # levels >= 9 compare chain.  Both halves execute every step
            # (lock-step lanes); the win is the shorter chain.
            idx = (win >> u32(24)).astype(jnp.int32)
            e = _lane_lookup(plo_ref[:], phi_ref[:], idx)
            ln_l = _chain_len(win, 9)
            sym_l, _ = _chain_sym(win, ln_l)
            short = e > 0
            ln = jnp.where(short, e >> 8, ln_l)
            sym = jnp.where(short, e & 255, sym_l)
            return sym, ln, ln.astype(u32)
        ln = _chain_len(win, min_len)
        sym, lns = _chain_sym(win, ln)
        return sym, ln, lns

    # Decoded lengths are never 0 (the chain returns >= min_len >= 1, and
    # the pure-probe LUT is total at max_len <= 8), so `x >> (32 - lns)` is
    # always a defined shift (32 - lns in [16, 31]) — one op less per use
    # than the general `(x >> 1) >> (31 - lns)` guard, ON the serial chain.
    def decode_one(a0, a1, a2, a3, valid):
        sym, ln, lns = _sym_ln(a0)
        rs = u32(32) - lns
        a0 = (a0 << lns) | (a1 >> rs)
        a1 = (a1 << lns) | (a2 >> rs)
        a2 = (a2 << lns) | (a3 >> rs)
        a3 = a3 << lns
        valid = valid - ln
        return a0, a1, a2, a3, valid, sym

    def decode_one_lazy(a0, a1):
        # only the 64-bit decode window (a0, a1) shifts per symbol; the
        # buffer half (s2, s3) catches up once per body.  The window always
        # holds >= 64 - 48 = 16 real bits at the 4th symbol, and canonical
        # compare is tail-agnostic (any codeword left-justified with zero
        # tail stays inside its level's limit interval), so a max-length
        # codeword still decodes correctly from the window alone.
        sym, ln, lns = _sym_ln(a0)
        a0 = (a0 << lns) | (a1 >> (u32(32) - lns))
        a1 = a1 << lns
        return a0, a1, ln, sym

    def catch_up(a0, a1, s2, s3, l4):
        """Move the body's consumed bit count l4 (4*min_len..64) from the
        buffer (s2, s3) into the vacated low bits of the window; buffer
        shifts left by l4.  Restores the packed-register invariant (window
        fills before buffer) so body-boundary state is bitwise identical to
        the eager path's 128-bit register."""
        t2 = 64 - l4
        um = (t2 & 31).astype(u32)
        ub = t2 >= 32
        # X = (s2, s3) >> t2: the buffer's top l4 bits, right-aligned
        xhi = jnp.where(ub, u32(0), s2 >> um)
        xlo = jnp.where(
            ub, s2 >> um, ((s2 << u32(1)) << (u32(31) - um)) | (s3 >> um)
        )
        a0 = a0 | xhi
        a1 = a1 | xlo
        rm = (l4 & 31).astype(u32)
        rb = l4 >= 32
        s2n = jnp.where(
            rb,
            jnp.where(l4 >= 64, u32(0), s3 << rm),
            (s2 << rm) | ((s3 >> u32(1)) >> (u32(31) - rm)),
        )
        s3n = jnp.where(rb, u32(0), s3 << rm)
        return a0, a1, s2n, s3n

    def _gather_pair(s, need, pptr, base):
        """Banded one-hot gather of pair ``pptr`` from slot s's window,
        masked by ``need`` (zeros when no refill)."""
        rel = pptr - base
        window = scratch[s, pl.ds(2 * base, 2 * w_band)]
        w0 = jnp.zeros(shape, jnp.int32)
        w1 = jnp.zeros(shape, jnp.int32)
        for q in range(w_band):
            m = iota_band[q] == rel
            w0 = w0 | jnp.where(m, window[2 * q], 0)
            w1 = w1 | jnp.where(m, window[2 * q + 1], 0)
        w0 = jnp.where(need, pltpu.bitcast(w0, u32), u32(0))
        w1 = jnp.where(need, pltpu.bitcast(w1, u32), u32(0))
        return w0, w1

    def pair_refill(s, a, valid, pptr, base):
        need = valid <= 64
        w0, w1 = _gather_pair(s, need, pptr, base)
        # insert the 64 loaded bits at offset `valid` of the 128-bit register
        v = valid.astype(u32)
        r = v & u32(31)
        j0 = valid >> 5  # word containing bit offset `valid`; 0..2
        hi0 = w0 >> r
        lo0 = (w0 << u32(1)) << ((u32(31) - r) & u32(31))
        hi1 = w1 >> r
        lo1 = (w1 << u32(1)) << ((u32(31) - r) & u32(31))
        a = list(a)
        for j in range(4):
            a[j] = (
                a[j]
                | jnp.where(j0 == j, hi0, u32(0))
                | jnp.where(j0 + 1 == j, lo0 | hi1, u32(0))
                | jnp.where(j0 + 2 == j, lo1, u32(0))
            )
        valid = valid + jnp.where(need, 64, 0)
        pptr = pptr + need.astype(jnp.int32)
        return tuple(a), valid, pptr

    def pair_refill_lazy(s, a, valid, pptr, base):
        # After catch_up the packed invariant holds: when valid <= 64 the
        # buffer (s2, s3) is empty, so the fresh pair P splits cleanly —
        # P >> valid tops up the window, P << (64 - valid) becomes the new
        # buffer.  No 4-word one-hot insert needed.
        a0, a1, s2, s3 = a
        need = valid <= 64
        w0, w1 = _gather_pair(s, need, pptr, base)
        # X = P >> valid with valid in [1, 64]: shift P >> 1 first so the
        # variable part stays in [0, 63]
        qhi = w0 >> u32(1)
        qlo = (w0 << u32(31)) | (w1 >> u32(1))
        u = valid - 1
        um = (u & 31).astype(u32)
        ub = u >= 32
        xhi = jnp.where(ub, u32(0), qhi >> um)
        xlo = jnp.where(
            ub, qhi >> um, ((qhi << u32(1)) << (u32(31) - um)) | (qlo >> um)
        )
        a0 = a0 | xhi  # w0/w1 are zero when !need, so this is a no-op then
        a1 = a1 | xlo
        t = 64 - valid
        tm = (t & 31).astype(u32)
        tb = t >= 32
        s2n = jnp.where(
            tb, w1 << tm, (w0 << tm) | ((w1 >> u32(1)) >> (u32(31) - tm))
        )
        s3n = jnp.where(tb, u32(0), w1 << tm)
        s2 = jnp.where(need, s2n, s2)
        s3 = jnp.where(need, s3n, s3)
        valid = valid + jnp.where(need, 64, 0)
        pptr = pptr + need.astype(jnp.int32)
        return (a0, a1, s2, s3), valid, pptr

    U = unroll if unroll else _unroll(iters, w_band * nt, interpret)
    assert iters % U == 0, f"unroll {U} must divide chunk iters {iters}"

    def quad(s, a, valid, pptr, gi, boff):
        base = _mu_base(gi, params_ref[0], boff, cap_pairs, w_band)
        if lazy:
            a0, a1, s2, s3 = a
            a0, a1, l0, s0 = decode_one_lazy(a0, a1)
            a0, a1, l1, s1 = decode_one_lazy(a0, a1)
            a0, a1, l2, s2_ = decode_one_lazy(a0, a1)
            a0, a1, l3, s3_ = decode_one_lazy(a0, a1)
            l4 = l0 + l1 + l2 + l3
            a0, a1, s2, s3 = catch_up(a0, a1, s2, s3, l4)
            valid = valid - l4
            a, valid, pptr = pair_refill_lazy(
                s, (a0, a1, s2, s3), valid, pptr, base
            )
            pack = s0 | (s1 << 8) | (s2_ << 16) | (s3_ << 24)
            return (a, valid, pptr), pack
        a0, a1, a2, a3 = a
        a0, a1, a2, a3, valid, s0 = decode_one(a0, a1, a2, a3, valid)
        a0, a1, a2, a3, valid, s1 = decode_one(a0, a1, a2, a3, valid)
        a0, a1, a2, a3, valid, s2 = decode_one(a0, a1, a2, a3, valid)
        a0, a1, a2, a3, valid, s3 = decode_one(a0, a1, a2, a3, valid)
        a, valid, pptr = pair_refill(s, (a0, a1, a2, a3), valid, pptr, base)
        pack = s0 | (s1 << 8) | (s2 << 16) | (s3 << 24)
        return (a, valid, pptr), pack

    def body(j, st):
        st = list(st)
        i0 = U * j
        # window index is constant over a U-group (every unroll factor
        # divides ILS_WIN), so the anchor loads once per group per slot
        wi = (c_idx * iters + i0) // ILS_WIN
        boffs = [boffs_ref[(g * nt + s) * n_win + wi] for s in range(nt)]
        packs = [[] for _ in range(nt)]
        for u in range(U):
            gi = c_idx * iters + i0 + u
            for s in range(nt):
                st[s], pk = quad(s, *st[s], gi, boffs[s])
                if rot:
                    pk = _rot_inv(pk, gi)
                packs[s].append(pk)
        for s in range(nt):
            out_ref[s, pl.ds(i0, U)] = (
                jnp.stack(packs[s]) if U > 1 else packs[s][0][None]
            )
        return tuple(st)

    state = tuple(
        (
            tuple(pltpu.bitcast(carry[s, j], u32) for j in range(4)),
            carry[s, 4],
            carry[s, 5],
        )
        for s in range(nt)
    )
    state = jax.lax.fori_loop(0, iters // U, body, state, unroll=False)
    for s in range(nt):
        a, valid, pptr = state[s]
        for j in range(4):
            carry[s, j] = pltpu.bitcast(a[j], jnp.int32)
        carry[s, 4] = valid
        carry[s, 5] = pptr


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "w_cap", "w_band", "max_len", "min_len", "n_tiles", "rot",
        "probe", "chain", "interpret", "nt", "unroll", "lazy"
    ),
)
def ils_decode(
    payload_rows,
    row_starts,
    params,
    boffs,
    dec: IlsDecTabs,
    *,
    k,
    w_cap,
    w_band,
    max_len,
    n_tiles,
    min_len=1,
    rot=False,
    probe=False,
    chain=None,
    interpret=False,
    nt=None,
    unroll=None,
    lazy=True,
):
    """Decode n_tiles tiles.

    ``chain`` (optional, static): grouped compare-chain spec from
    `core/canonical.py::chain_spec` — one (level, weight) pair per
    distinct decode limit.  None falls back to the dense per-level chain
    (bit-identical output; the spec only removes duplicate compares).

    Args:
      payload_rows: (total_rows + >=w_cap slack, 8, 128) int32 interleaved
        payload rows.
      row_starts: (n_tiles,) int32 payload row offset per tile.
      params: (2,) int32 [snum, 0].
      boffs: (n_tiles, n_win) int32 windowed decode band anchors.

    Returns (n_tiles * k//4, 8, 128) int32 — the original u32 data.
    """
    if nt is None:
        nt = _decode_nt()
    iters = _chunk_iters(k, CHUNK_I // nt)
    n_chunks = (k // 4) // iters
    n_win = ils_n_win(k)
    n_groups = -(-n_tiles // nt)
    pad = n_groups * nt - n_tiles
    boffs = boffs.reshape(n_tiles, n_win)
    if pad:
        # phantom slots re-decode the last tile (its window DMA and output
        # rows are real but discarded below); keeps the grid rectangular
        row_starts = jnp.concatenate(
            [row_starts, jnp.repeat(row_starts[-1:], pad)]
        )
        boffs = jnp.concatenate(
            [boffs, jnp.repeat(boffs[-1:], pad, axis=0)], axis=0
        )
    boffs = boffs.reshape((n_tiles + pad) * n_win)
    kern = functools.partial(
        _decode_kernel, k=k, w_cap=w_cap, w_band=w_band, max_len=max_len,
        min_len=max(min(min_len, max_len), 1), nt=nt, iters=iters,
        unroll=unroll, lazy=lazy, n_win=n_win, rot=rot, probe=probe,
        chain=chain, interpret=interpret,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 32), lambda t, c, s, p, b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, s, p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, s, p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, s, p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, s, p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda t, c, s, p, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (nt, iters, SUBLANES, LANES),
            lambda t, c, s, p, b: (t, c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((nt, w_cap, SUBLANES, LANES), jnp.int32),
            pltpu.VMEM((nt, 6, SUBLANES, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_groups * nt, k // 4, SUBLANES, LANES), jnp.int32
        ),
        interpret=interpret,
    )(row_starts, params, boffs, dec.lim, dec.bias, dec.sym_lo, dec.sym_hi,
      dec.probe_lo, dec.probe_hi, payload_rows)
    out = out.reshape(n_groups * nt * (k // 4), SUBLANES, LANES)
    # the slice fuses into the consumer under jit; no copy materializes
    return out[: n_tiles * (k // 4)] if pad else out
