"""Stage-by-stage profile of the foreign-container (Yamamoto) decode.

VERDICT r5 item 3: yamamoto rides the same fused pipeline as HTC1 after
the counting pass, yet runs ~5x slower — this splits the two device
stages (`_yam_meta` counting+plan vs `fused_planned_decode`) with the
same chained-repeat discipline as the benches, so the dominant stage is
measured, not inferred.  Stage A is measured at each counting
granularity tier (g_count = 1/2/4/8) to separate the refill-one-hot
cost from the fold.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def t(fn, reps=5, label=""):
    fn()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    log(f"{label}: min {min(ts)*1e3:.2f} ms  med {sorted(ts)[len(ts)//2]*1e3:.2f} ms")
    return min(ts)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 23)
    from huffman_tpu.io.yamamoto import (
        _SEGMENT_BITS,
        _decode_pallas_planned,
        _yam_meta,
        read_yamamoto,
        write_yamamoto,
    )
    from huffman_tpu.ops import dec_spec, device_dec_table
    from huffman_tpu.utils import generate_redundant

    data = generate_redundant(size, 0.5, seed=0)
    from huffman_tpu.core import canonical_code_table, package_merge_lengths
    from huffman_tpu.ops import encode as npref_enc

    freqs = np.bincount(data, minlength=256)
    lengths = package_merge_lengths(freqs, 16)
    table = canonical_code_table(lengths, 16)
    blob = write_yamamoto(data, table)
    _, words, gaps, original_size = read_yamamoto(blob)
    dec = device_dec_table(table, two_level=False)
    spec = dec_spec(table)
    n_segs = gaps.shape[0]
    log(f"size={size} n_segs={n_segs} min_len={spec.min_len} "
        f"max_len={spec.max_len}")

    words_j = jnp.asarray(np.concatenate([words, np.zeros(2, np.uint32)]))
    gaps_j = jnp.asarray(gaps.astype(np.int32))
    total_bits = jnp.int32((int(words_j.shape[0]) - 2) * 32)

    # whole path (both dispatches + scalar pull)
    def whole():
        out = _decode_pallas_planned(
            words_j, gaps_j, dec, spec, table, n_segs,
            original_size, _SEGMENT_BITS // max(spec.min_len, 1) + 1,
        )
        jax.block_until_ready(out)

    w = t(whole, label="whole path (2 dispatches + plan)")
    log(f"  -> {size / w / 1e9:.2f} GB/s")

    # stage A at each counting granularity (g_merge=8 placement fold)
    interpret = jax.default_backend() != "tpu"
    g_merge = 8
    n_segs_g = -(-n_segs // g_merge)
    for g_count in (1, 2, 4, 8):
        if g_count > g_merge:
            continue
        gaps_c = gaps_j[::g_count]

        def stage_a():
            counts, scal = _yam_meta(
                words_j, gaps_c, total_bits, jnp.int32(original_size),
                dec, spec=spec, seg_bits_count=_SEGMENT_BITS * g_count,
                fold=g_merge // g_count, n_segs_out=n_segs_g,
                out_cap=original_size, interpret=interpret,
            )
            jax.block_until_ready((counts, scal))

        a = t(stage_a, label=f"stage A (count g_count={g_count} + plan)")
        log(f"  -> {size / a / 1e9:.2f} GB/s equivalent")

    # the segw glue alone (the (n_segs, wps+2) -> (wps+2, n_segs) XLA
    # transpose feeding the counting kernel) — sum-consumed so XLA cannot
    # DCE it (transparent-stage rule, CLAUDE.md)
    from huffman_tpu.ops.pallas.decode_kernel import TILE_SEGS

    for g_count in (2, 8):
        seg_bits_c = _SEGMENT_BITS * g_count
        wps = seg_bits_c // 32
        rows = wps + 2
        s_c = -(-n_segs // g_count)
        tiles = -(-s_c // TILE_SEGS)
        n_segs_p = tiles * TILE_SEGS
        need_words = (n_segs_p + 1) * wps

        @jax.jit
        def glue(words_j, need_words=need_words, wps=wps, rows=rows,
                 n_segs_p=n_segs_p, tiles=tiles):
            n_copy = min(int(words_j.shape[0]), need_words)
            words_p = (
                jnp.zeros(need_words, jnp.uint32).at[:n_copy]
                .set(words_j[:n_copy])
            )
            arr = words_p.reshape(n_segs_p + 1, wps)
            segw = jnp.concatenate([arr[:-1], arr[1:, :2]], axis=1)
            segw = (
                jax.lax.bitcast_convert_type(segw, jnp.int32)
                .T.reshape(rows, tiles * 8, 128)
            )
            return jnp.sum(segw, dtype=jnp.int32)

        def run_glue():
            jax.block_until_ready(glue(words_j))

        gms = t(run_glue, label=f"segw glue alone (g_count={g_count})")
        log(f"  -> {size / gms / 1e9:.2f} GB/s equivalent")

    log("note: stage B (fused ranks+placement) = whole - stage A(g=2) "
        "minus one dispatch floor; compare vs the HTC1 gap_pallas number")


if __name__ == "__main__":
    main()
