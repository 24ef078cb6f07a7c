"""Same-process A/B of the gap-decode pipeline stages (drift-safe).

The tunnel's dispatch latency drifts ~1.4x over process lifetime, so the
only valid comparison interleaves all variants round-robin in ONE process
(bench.py discipline).  Stages measured chained in-jit:

  ranks       — the decode kernel alone
  rows        — transpose + row assembly (the XLA glue between kernels)
  compactN    — the placement kernel alone at N output tiles per grid step
  fusedN      — the whole pipeline at tps=N

Prints ms/rep and GB/s for each.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 26)
    ap.add_argument("--redundancy", type=float, default=0.5)
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--r1", type=int, default=2)
    ap.add_argument("--r2", type=int, default=8)
    ap.add_argument("--variants", default="ranks,rows,compact1,compact16,fused1,fused16")
    args = ap.parse_args()
    size = args.size

    from huffman_tpu.models import GapArrayCodec
    from huffman_tpu.utils import generate_redundant
    from huffman_tpu.ops.pallas.decode_kernel import _ranks_traceable
    from huffman_tpu.ops.compact import (
        CNT_LANE,
        OFF_LANE,
        _rows_lsb,
        _sym_tiles,
        plan_compact,
    )
    from huffman_tpu.ops.pallas.compact_kernel import ragged_concat_pallas

    from huffman_tpu.core import npref

    data = generate_redundant(size, args.redundancy, seed=0)
    codec = GapArrayCodec.fit(data, block_bytes=size, method="pallas")
    # HOST-side encode for the decode-stage fixtures: the device encode's
    # compile alone costs 10+ min through this tunnel, and the decode A/B
    # doesn't care who packed the bits
    log("host encode (npref oracle)...")
    words_h, total_bits = npref.encode_bits(data, codec.table)
    gaps_np, counts_np, _ = npref.segment_metadata(
        data, codec.table, codec.seg_bits
    )
    ns = -(-int(len(counts_np)) // 4096) * 4096
    counts_h = np.zeros(ns, np.int32)
    counts_h[: len(counts_np)] = counts_np
    gaps_h = np.zeros(ns, np.int32)
    gaps_h[: len(gaps_np)] = gaps_np
    plan = plan_compact(counts_h.astype(np.int64), size)
    s = plan.statics
    log(f"n_segs={ns} max_count={counts_h.max()} band={s.band} "
        f"s_cap={s.s_cap} chunk={s.chunk_bytes}")
    max_count = -(-int(counts_h.max()) // 8) * 8
    symlo, symhi = _sym_tiles(np.asarray(codec.table.symtab, np.uint8))

    words = jnp.asarray(words_h)
    gaps_j = jnp.asarray(gaps_h)
    counts_j = jnp.asarray(counts_h)
    bases_j = jnp.asarray(plan.bases)
    s0_j = jnp.asarray(plan.s0_rel)

    rk = dict(spec=codec.spec, seg_bits=codec.seg_bits, n_segs=ns,
              max_count=max_count)

    def ranks_t(w, gaps, counts):
        return _ranks_traceable(w, gaps, counts, codec.dec, **rk)

    def rows_t(packed, counts):
        rows = _rows_lsb(packed)
        r0 = min(rows.shape[0], s.s_pad)
        cnt_pad = jnp.zeros(s.s_pad, jnp.int32).at[:s.n_segs].set(counts)
        ends = jnp.cumsum(cnt_pad, dtype=jnp.int32)
        return (
            jnp.zeros((s.s_pad, 128), jnp.int32)
            .at[:r0, : rows.shape[1]].set(rows[:r0])
            .at[:, OFF_LANE].set(ends - cnt_pad)
            .at[:, CNT_LANE].set(cnt_pad)
        )

    def mk_compact(tps):
        def compact_t(rows_full, bases, s0):
            return ragged_concat_pallas(
                rows_full, bases, s0, symlo, symhi, band=s.band,
                s_cap=s.s_cap, chunk_bytes=s.chunk_bytes, n_tiles=s.n_tiles,
                tps=tps,
            )
        return compact_t

    def mk_fused(tps):
        def fused(w, gaps, counts, bases, s0):
            from huffman_tpu.ops.compact import compact_apply

            packed = ranks_t(w, gaps, counts)
            return compact_apply(
                packed, counts, bases, s0, symlo, symhi, statics=s, tps=tps,
            )
        return fused

    def mk_fused_b(tps):
        # barrier variant: pin the stage boundaries so XLA cannot re-fuse
        # (or re-layout) the glue between the two pallas calls
        def fused(w, gaps, counts, bases, s0):
            packed = ranks_t(w, gaps, counts)
            packed = jax.lax.optimization_barrier(packed)
            rows_full = rows_t(packed, counts)
            rows_full = jax.lax.optimization_barrier(rows_full)
            return mk_compact(tps)(rows_full, bases, s0)
        return fused

    # prebuilt stage inputs (device)
    packed0 = jax.jit(ranks_t)(words, gaps_j, counts_j)
    rows0 = jax.jit(rows_t)(packed0, counts_j)
    jax.block_until_ready((packed0, rows0))

    def chain(body0, x0, *aux):
        """ONE compile per variant: the repeat count is a RUNTIME scalar
        (dynamic fori_loop bound) — through this tunnel every extra jit
        signature costs minutes of remote compile."""
        @jax.jit
        def f(R, x, *a):
            def body(i, carry):
                acc, xx = carry
                xx = xx.at[(0,) * xx.ndim].set(xx[(0,) * xx.ndim] + 1)
                o = body0(xx, *a)
                acc = acc ^ o.reshape(-1)[:8].astype(jnp.int32)
                return acc, xx
            acc, _ = jax.lax.fori_loop(
                0, R, body, (jnp.zeros(8, jnp.int32), x))
            return acc
        return f, (x0, *aux)

    # 2-wide merged-segment variant: every 2nd gap is an exact 2048-bit
    # entry point; counts pair-sum on host.  Halves placement rows, but
    # doubles the ranks kernel's refill one-hot candidates — A/B decides.
    ns2 = ns // 2
    gaps2_h = gaps_h[::2][:ns2]
    counts2_h = counts_h[:ns2 * 2].reshape(-1, 2).sum(1).astype(np.int32)
    plan2 = plan_compact(counts2_h.astype(np.int64), size)
    s2p = plan2.statics
    log(f"merged: n_segs={ns2} max={counts2_h.max()} band={s2p.band}")
    gaps2_j = jnp.asarray(gaps2_h)
    counts2_j = jnp.asarray(counts2_h)
    bases2_j = jnp.asarray(plan2.bases)
    s02_j = jnp.asarray(plan2.s0_rel)
    rk2 = dict(spec=codec.spec, seg_bits=2 * codec.seg_bits, n_segs=ns2,
               max_count=-(-int(counts2_h.max()) // 8) * 8)

    def fused_m(w, gaps, counts, bases, s0):
        from huffman_tpu.ops.compact import compact_apply

        packed = _ranks_traceable(w, gaps, counts, codec.dec, **rk2)
        return compact_apply(
            packed, counts, bases, s0, symlo, symhi, statics=s2p,
        )

    makers = {}
    makers["fused1m"] = lambda: chain(
        fused_m, words, gaps2_j, counts2_j, bases2_j, s02_j
    )
    makers["ranks"] = lambda: chain(ranks_t, words, gaps_j, counts_j)
    makers["rows"] = lambda: chain(rows_t, packed0, counts_j)
    for tps in (1, 4, 16):
        makers[f"compact{tps}"] = (
            lambda tps=tps: chain(mk_compact(tps), rows0, bases_j, s0_j)
        )
        makers[f"fused{tps}"] = (
            lambda tps=tps: chain(
                mk_fused(tps), words, gaps_j, counts_j, bases_j, s0_j
            )
        )
        makers[f"fusedb{tps}"] = (
            lambda tps=tps: chain(
                mk_fused_b(tps), words, gaps_j, counts_j, bases_j, s0_j
            )
        )

    # encode-stage variants: locate the cost inside encode_block
    data_j = jnp.asarray(data)
    enc = codec.enc

    def enc_gather(d):
        di = d.astype(jnp.int32)
        return enc.lengths[di] + enc.codes[di].astype(jnp.int32)

    def enc_cumsum(d):
        return jnp.cumsum(d.astype(jnp.int32), dtype=jnp.int32)

    def enc_segsum(d):
        # representative segment_sum: ~6 bytes/u32 word, sorted indices
        lo = d.astype(jnp.uint32)
        w0 = (jnp.arange(d.shape[0], dtype=jnp.int32) * 175) >> 10
        n_units = (size * 175 >> 10) // 1 + 2
        return jax.ops.segment_sum(
            lo, w0, num_segments=n_units, indices_are_sorted=True
        )

    mw = -(-size * 16 // 32 // 512) * 512
    nsg = -(-size * 16 // codec.seg_bits)

    def enc_full(d):
        from huffman_tpu.ops.encode import encode_block

        w, tb, g, c = encode_block(
            d, enc, seg_bits=codec.seg_bits, max_words=mw, n_segs=nsg,
        )
        return w[:8].astype(jnp.int32) ^ tb

    def enc_fast(d):
        from huffman_tpu.ops.encode import encode_block_fast

        w, tb, g, c = encode_block_fast(
            d, codec.enc_tabs, seg_bits=codec.seg_bits, max_words=mw,
            n_segs=nsg,
        )
        return w[:8].astype(jnp.int32) ^ tb

    makers["enc_gather"] = lambda: chain(enc_gather, data_j)
    makers["enc_cumsum"] = lambda: chain(enc_cumsum, data_j)
    makers["enc_segsum"] = lambda: chain(enc_segsum, data_j)
    makers["enc_full"] = lambda: chain(enc_full, data_j)
    makers["enc_fast"] = lambda: chain(enc_fast, data_j)

    r1 = jnp.int32(args.r1)
    r2 = jnp.int32(args.r2)
    names = [n for n in args.variants.split(",") if n in makers]
    fns = {}
    for n in names:
        f, x = makers[n]()
        jax.block_until_ready(f(r1, *x))
        fns[n] = (f, x)
        log(f"compiled {n}")
    times = {n: ([], []) for n in names}
    for _ in range(args.trials):
        for n in names:
            f, x = fns[n]
            t0 = time.perf_counter()
            jax.block_until_ready(f(r1, *x))
            times[n][0].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(f(r2, *x))
            times[n][1].append(time.perf_counter() - t0)
    for n in names:
        t1, t2 = times[n]
        dt = max((min(t2) - min(t1)) / (args.r2 - args.r1), 1e-9)
        log(f"{n}: {dt*1e3:.2f} ms/rep -> {size/dt/1e9:.2f} GB/s")


if __name__ == "__main__":
    main()
