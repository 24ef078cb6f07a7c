"""Stage-by-stage profile of the foreign-container (Yamamoto) decode.

VERDICT r5 item 3: yamamoto rides the same fused pipeline as HTC1 after
the counting pass, yet runs ~5x slower.  Every stage here is ≤ the
tunnel's ~25-29 ms dispatch floor, so single-call timing is useless
(the first cut of this tool measured every stage at "25 ms"): each
stage is timed as CHAINED in-jit repeats (bench.measure_chained_multi
discipline) with sum-consumers so XLA cannot DCE transparent stages.

Stages:
  stage_a   `_yam_meta` (counting kernel + fold + plan), g_count=2
  glue_old  the pre-r5 XLA (n_segs, wps+2) -> (wps+2, n_segs) transpose
            that used to feed the counting kernel (kept inline here as
            the measured-rejection record)
  fused_b   `fused_planned_decode` at g_merge=8 with a frozen plan
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 23)
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from bench import measure_chained_multi
    from huffman_tpu.core import canonical_code_table, package_merge_lengths
    from huffman_tpu.io.yamamoto import (
        _SEGMENT_BITS,
        _yam_meta,
        read_yamamoto,
        write_yamamoto,
    )
    from huffman_tpu.ops import dec_spec, device_dec_table
    from huffman_tpu.ops.compact import (
        TILE_BYTES,
        CompactStatics,
        MAX_ROW_BYTES,
        _round_up,
        _sym_tiles,
        pick_chunk,
    )
    from huffman_tpu.ops.pallas.decode_kernel import (
        TILE_SEGS,
        fused_planned_decode,
    )
    from huffman_tpu.utils import generate_redundant

    interpret = jax.default_backend() != "tpu"
    data = generate_redundant(size, 0.5, seed=0)
    freqs = np.bincount(data, minlength=256)
    table = canonical_code_table(package_merge_lengths(freqs, 16), 16)
    blob = write_yamamoto(data, table)
    _, words, gaps, original_size = read_yamamoto(blob)
    dec = device_dec_table(table, two_level=False)
    spec = dec_spec(table)
    n_segs = gaps.shape[0]
    log(f"size={size} n_segs={n_segs} min_len={spec.min_len} "
        f"max_len={spec.max_len} interpret={interpret}")

    words_j = jnp.asarray(np.concatenate([words, np.zeros(2, np.uint32)]))
    gaps_j = jnp.asarray(gaps.astype(np.int32))
    total_bits = jnp.int32((int(words_j.shape[0]) - 2) * 32)

    g_merge, g_count = 8, 2
    n_segs_g = -(-n_segs // g_merge)
    gaps_c = gaps_j[::g_count]
    gaps_g = gaps_j[::g_merge]

    # frozen plan for the fused stage (one real meta pass)
    counts, scal = _yam_meta(
        words_j, gaps_c, total_bits, jnp.int32(original_size), dec,
        spec=spec, seg_bits_count=_SEGMENT_BITS * g_count,
        fold=g_merge // g_count, n_segs_out=n_segs_g,
        out_cap=original_size, interpret=interpret,
    )
    scal_h = np.asarray(scal)
    mx = int(scal_h[0])
    assert mx <= MAX_ROW_BYTES, "g_merge=8 infeasible for this stream"
    band, s_cap, chunk_bytes = pick_chunk(scal_h[3:])
    statics = CompactStatics(
        out_size=original_size,
        n_segs=n_segs_g,
        band=band,
        s_cap=s_cap,
        s_pad=_round_up(max(n_segs_g, 1), 8) + s_cap,
        chunk_bytes=chunk_bytes,
        n_tiles=-(-original_size // TILE_BYTES),
    )
    symlo, symhi = _sym_tiles(np.asarray(table.symtab, np.uint8))
    log(f"plan: max_count={mx} band={band} s_cap={s_cap} "
        f"chunk_bytes={chunk_bytes}")

    def mk_stage_a(R):
        @jax.jit
        def f(w):
            def body(i, carry):
                acc, ww = carry
                ww = ww.at[0].set(ww[0] ^ jnp.uint32(1))
                cc, sc = _yam_meta(
                    ww, gaps_c, total_bits, jnp.int32(original_size), dec,
                    spec=spec, seg_bits_count=_SEGMENT_BITS * g_count,
                    fold=g_merge // g_count, n_segs_out=n_segs_g,
                    out_cap=original_size, interpret=interpret,
                )
                return acc ^ jnp.sum(cc) ^ sc[0], ww
            acc, _ = jax.lax.fori_loop(0, R, body, (jnp.int32(0), w))
            return acc
        return f

    # the pre-r5 transpose glue (what `_segw_glue` replaced)
    wps = (_SEGMENT_BITS * g_count) // 32
    rows = wps + 2
    s_c = gaps_c.shape[0]
    tiles = -(-s_c // TILE_SEGS)
    n_segs_p = tiles * TILE_SEGS
    need_words = (n_segs_p + 1) * wps

    def mk_glue_old(R):
        @jax.jit
        def f(w):
            def body(i, carry):
                acc, ww = carry
                ww = ww.at[0].set(ww[0] ^ jnp.uint32(1))
                n_copy = min(int(ww.shape[0]), need_words)
                words_p = (
                    jnp.zeros(need_words, jnp.uint32).at[:n_copy]
                    .set(ww[:n_copy])
                )
                arr = words_p.reshape(n_segs_p + 1, wps)
                segw = jnp.concatenate([arr[:-1], arr[1:, :2]], axis=1)
                segw = (
                    jax.lax.bitcast_convert_type(segw, jnp.int32)
                    .T.reshape(rows, tiles * 8, 128)
                )
                return acc ^ jnp.sum(segw, dtype=jnp.int32), ww
            acc, _ = jax.lax.fori_loop(0, R, body, (jnp.int32(0), w))
            return acc
        return f

    def mk_fused(R):
        @jax.jit
        def f(w):
            def body(i, carry):
                acc, ww = carry
                ww = ww.at[0].set(ww[0] ^ jnp.uint32(1))
                out = fused_planned_decode(
                    ww, gaps_g, counts, symlo, symhi, dec, spec=spec,
                    seg_bits=_SEGMENT_BITS * g_merge, n_segs=n_segs_g,
                    max_count=-(-max(mx, 1) // 8) * 8, statics=statics,
                    interpret=interpret,
                )
                return acc ^ jnp.sum(out.astype(jnp.int32)), ww
            acc, _ = jax.lax.fori_loop(0, R, body, (jnp.int32(0), w))
            return acc
        return f

    def mk_slices(R):
        # the eager per-call `gaps_j[::g]` strided slices in
        # `_decode_pallas_planned` — 1D minor-dim strided reads are a
        # known XLA pathology class on this chip
        @jax.jit
        def f(w):
            def body(i, carry):
                acc, gg = carry
                gg = gg.at[0].add(1)
                a = gg[::g_count]
                b = gg[::g_merge]
                return (
                    acc
                    ^ jnp.sum(a, dtype=jnp.int32)
                    ^ jnp.sum(b, dtype=jnp.int32),
                    gg,
                )
            acc, _ = jax.lax.fori_loop(
                0, R, body, (jnp.int32(0), gaps_j)
            )
            return acc
        return f

    makers = {
        "stage_a": mk_stage_a,
        "glue_old": mk_glue_old,
        "fused_b": mk_fused,
        "slices": mk_slices,
    }
    ts = measure_chained_multi(
        makers, max(reps // 2, 1), reps, words_j, trials=5
    )
    out = {}
    for name, dt in ts.items():
        out[name + "_ms"] = round(dt * 1e3, 2)
        log(f"{name}: {dt*1e3:.2f} ms  ({size/dt/1e9:.3f} GB/s equiv)")
    print(json.dumps(
        {"metric": "yamamoto_stage_split", "size": size,
         "n_segs": n_segs, **out}
    ), flush=True)


if __name__ == "__main__":
    main()
