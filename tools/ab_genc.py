"""Stage-split A/B for the Pallas gap-encode pipeline (r5 item 1 tuning).

Times nested prefixes of `encode_blocks_pallas`'s stages as separate chained
jits (same interleaved-trial discipline as bench.py) and differences them:

  A:      row prepack kernel only
  AB:     + cumsum glue + metadata kernel + slot segment-ops (gaps/counts)
  full:   + assembly + chunk-shared bit placement (the real pipeline)

Each variant consumes its outputs through checksums (pallas stages are
opaque; XLA glue sums are consumed explicitly) so nothing is dead-code
eliminated.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 26)
    ap.add_argument("--redundancy", type=float, default=0.5)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.size = min(args.size, 1 << 18)
        args.trials, args.reps = 1, 2
    import jax.numpy as jnp

    interpret = jax.default_backend() != "tpu"
    log(f"devices: {jax.devices()} interpret={interpret}")

    from huffman_tpu.models import GapArrayCodec
    from huffman_tpu.ops.pallas import gap_encode_kernel as G
    from huffman_tpu.utils import generate_redundant
    from bench import measure_chained_multi

    size = args.size
    data = generate_redundant(size, args.redundancy, seed=4)
    codec = GapArrayCodec.fit(data, block_bytes=size)
    lens = codec.table.lengths.astype(np.int64)
    max_bits = int(lens[data].sum())
    max_words = -(-(-(-max_bits // 32)) // 512) * 512
    n_segs = -(-max_words * 32 // codec.seg_bits)
    kw = dict(
        seg_bits=codec.seg_bits, max_words=max_words, n_segs=n_segs,
        min_len=max(int(codec.table.min_len), 1),
        max_len=int(codec.table.max_len_present),
        interpret=interpret,
    )
    tabs = codec.enc_tabs
    data_j = jnp.asarray(data)[None]

    def _prefix(blocks, enc_tabs, *, upto, seg_bits, max_words, n_segs,
                min_len, max_len, interpret):
        """First `upto` stages of encode_blocks_pallas, checksum-reduced.
        ``upto="A_nt"``: kernel A on a PRE-RELAYOUT input (the transpose
        runs outside the timed chain) — A minus A_nt = transpose cost."""
        cap_pairs = -(-G.ROW_BYTES * max_len // 64)
        cap_words = 2 * cap_pairs
        seg_shift = seg_bits.bit_length() - 1
        n_slots = ((seg_bits - 1 + cap_words * 32 - 1) >> seg_shift) + 1
        if upto == "A_nt":
            data3 = blocks  # caller pre-relayouted (ROW_WORDS, T*8, 128)
            tiles = data3.shape[1] // G.SUBLANES
            n_rows = n_rows_p = tiles * G.TILE_ROWS
            g = 1
            n_rows_b = n_rows
        else:
            g, b = blocks.shape
            n_rows_b = b // G.ROW_BYTES
            n_rows = g * n_rows_b
            tiles = -(-n_rows // G.TILE_ROWS)
            n_rows_p = tiles * G.TILE_ROWS
        if upto != "A_nt":
            w = jax.lax.bitcast_convert_type(
                blocks.reshape(-1, 4), jnp.uint32
            ).reshape(-1)
            arr = jnp.zeros((n_rows_p, G.ROW_WORDS), jnp.int32)
            arr = arr.at[:n_rows].set(
                jax.lax.bitcast_convert_type(w, jnp.int32).reshape(
                    n_rows, G.ROW_WORDS
                )
            )
            data3 = G._relayout(arr, tiles, interpret=interpret)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        kern_a = functools.partial(
            G._row_pack_kernel, cap_pairs=cap_pairs, min_len=min_len,
            max_len=max_len,
        )
        tabspec = pl.BlockSpec(
            (G.SUBLANES, G.LANES), lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        )
        pay, bits3, starts3 = pl.pallas_call(
            kern_a,
            grid=(tiles,),
            in_specs=[
                tabspec, tabspec,
                pl.BlockSpec((G.ROW_WORDS, G.SUBLANES, G.LANES),
                             lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((cap_words, G.SUBLANES, G.LANES),
                             lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G.SUBLANES, G.LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * G.ROW_WORDS, G.SUBLANES, G.LANES),
                             lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(
                    (cap_words, tiles * G.SUBLANES, G.LANES), jnp.int32
                ),
                jax.ShapeDtypeStruct((tiles * G.SUBLANES, G.LANES),
                                     jnp.int32),
                jax.ShapeDtypeStruct(
                    (2 * G.ROW_WORDS, tiles * G.SUBLANES, G.LANES),
                    jnp.int32,
                ),
            ],
            interpret=interpret,
        )(enc_tabs.lo, enc_tabs.hi, data3)
        if upto in ("A", "A_nt"):
            return (
                jnp.sum(bits3) ^ pay[0, 0, :8].astype(jnp.int32)
                ^ starts3[0, 0, :8]
            )

        row_iota = jnp.arange(n_rows_p, dtype=jnp.int32)
        real = row_iota < n_rows
        bits_r = jnp.where(real, bits3.reshape(-1), 0)
        w_pad = -(-(max_words + 1) // G.OUT_TILE_WORDS) * G.OUT_TILE_WORDS
        block_of = jnp.minimum(row_iota // n_rows_b, g - 1)
        bits_blk = bits_r[:n_rows].reshape(g, n_rows_b)
        ends_blk = jnp.cumsum(bits_blk, axis=1, dtype=jnp.int32)
        total_bits = ends_blk[:, -1]
        s_local = jnp.zeros(n_rows_p, jnp.int32).at[:n_rows].set(
            (ends_blk - bits_blk).reshape(-1)
        )
        s_abs = block_of * (w_pad * 32) + s_local

        kern_b = functools.partial(
            G._row_meta_kernel, n_slots=n_slots, seg_shift=seg_shift
        )
        s_abs3 = s_abs.reshape(tiles * G.SUBLANES, G.LANES)
        cnt_s, first_s = pl.pallas_call(
            kern_b,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((2 * G.ROW_WORDS, G.SUBLANES, G.LANES),
                             lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G.SUBLANES, G.LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_slots, G.SUBLANES, G.LANES),
                             lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_slots, G.SUBLANES, G.LANES),
                             lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(
                    (n_slots, tiles * G.SUBLANES, G.LANES), jnp.int32
                ),
                jax.ShapeDtypeStruct(
                    (n_slots, tiles * G.SUBLANES, G.LANES), jnp.int32
                ),
            ],
            interpret=interpret,
        )(starts3, s_abs3)
        big = jnp.int32(jnp.iinfo(jnp.int32).max)
        cnt_s = jnp.where(real[None], cnt_s.reshape(n_slots, -1), 0)
        first_s = jnp.where(real[None], first_s.reshape(n_slots, -1), big)
        sid0 = block_of * n_segs + (s_local >> seg_shift)
        num = g * n_segs
        counts = jnp.zeros(num, jnp.int32)
        firsts = jnp.full(num, big, jnp.int32)
        for k in range(n_slots):
            counts = counts + jax.ops.segment_sum(
                cnt_s[k], sid0 + k, num_segments=num,
                indices_are_sorted=True,
            )
            fk = jnp.where(
                first_s[k] == big, big, first_s[k] - block_of * (w_pad * 32)
            )
            firsts = jnp.minimum(
                firsts,
                jax.ops.segment_min(
                    fk, sid0 + k, num_segments=num, indices_are_sorted=True
                ),
            )
        return jnp.sum(counts) ^ jnp.sum(jnp.where(firsts == big, 0, firsts))

    def mk_maker(upto):
        if upto == "full":
            def mk(R):
                @jax.jit
                def f(d):
                    def body(i, carry):
                        acc, dd = carry
                        dd = dd.at[0, 0].set(dd[0, 0] ^ jnp.uint8(1))
                        w, tb, gp, c = G.encode_blocks_pallas(
                            dd, tabs, **kw
                        )
                        return (
                            acc ^ w[0, :8].astype(jnp.int32) ^ tb[0]
                            ^ jnp.sum(gp) ^ jnp.sum(c),
                            dd,
                        )
                    acc, _ = jax.lax.fori_loop(
                        0, R, body, (jnp.zeros(8, jnp.int32), d))
                    return acc
                return f
            return mk

        def mk(R):
            @jax.jit
            def f(d):
                if upto == "A_nt":
                    # relayout ONCE outside the chain (kernel-only timing)
                    g, b = d.shape
                    n_rows = g * (b // G.ROW_BYTES)
                    tiles = -(-n_rows // G.TILE_ROWS)
                    w = jax.lax.bitcast_convert_type(
                        d.reshape(-1, 4), jnp.uint32
                    ).reshape(-1)
                    arr = jnp.zeros(
                        (tiles * G.TILE_ROWS, G.ROW_WORDS), jnp.int32
                    ).at[:n_rows].set(
                        jax.lax.bitcast_convert_type(w, jnp.int32).reshape(
                            n_rows, G.ROW_WORDS
                        )
                    )
                    d = G._relayout(arr, tiles, interpret=interpret)

                def body(i, carry):
                    acc, dd = carry
                    dd = dd.at[0, 0].set(
                        dd[0, 0] ^ (1 if upto == "A_nt" else jnp.uint8(1))
                    )
                    s = _prefix(dd, tabs, upto=upto, **kw)
                    return acc ^ s, dd
                acc, _ = jax.lax.fori_loop(
                    0, R, body, (jnp.zeros(8, jnp.int32), d))
                return acc
            return f
        return mk

    makers = {u: mk_maker(u) for u in ("A", "A_nt", "AB", "full")}
    reps = args.reps
    ts = measure_chained_multi(
        makers, max(reps // 4, 1), reps, data_j, trials=args.trials
    )
    out = {}
    for name, dt in ts.items():
        out[name + "_ms"] = round(dt * 1e3, 2)
        log(f"{name}: {dt*1e3:.2f} ms  ({size/dt/1e9:.3f} GB/s)")
    out["transpose_ms"] = round(out["A_ms"] - out["A_nt_ms"], 2)
    out["meta_ms"] = round(out["AB_ms"] - out["A_ms"], 2)
    out["place_ms"] = round(out["full_ms"] - out["AB_ms"], 2)
    print(json.dumps({"metric": "genc_stage_split", "size": size, **out}),
          flush=True)


if __name__ == "__main__":
    main()
