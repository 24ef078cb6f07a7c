"""Stage-split for the self-sync decoder (VERDICT r5 item 4).

Times nested prefixes as chained jits (bench.py discipline):

  trans: transition kernel only (16-entry length-only decode)
  meta:  + composition scan + entry/count selection + plan scalars
         (= `_selfsync_meta`, the whole first dispatch)

The full pipeline number comes from `secondary_bench.py --configs selfsync`
(size-differenced; it includes the host scalar sync + fused decode pass).
Differences give the per-stage budget PERF.md §7 needs.  Prints one JSON
line.
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.size = min(args.size, 1 << 17)
        args.trials, args.reps = 1, 2
    import jax.numpy as jnp

    interpret = jax.default_backend() != "tpu"
    log(f"devices: {jax.devices()} interpret={interpret}")

    from huffman_tpu.core import (
        canonical_code_table,
        npref,
        package_merge_lengths,
    )
    from huffman_tpu.models import selfsync as S
    from huffman_tpu.ops.pallas.selfsync_kernels import sync_transitions
    from huffman_tpu.utils import generate_redundant
    from bench import measure_chained_multi

    size = args.size
    data = generate_redundant(size, args.redundancy, seed=1)
    table = canonical_code_table(
        package_merge_lengths(npref.histogram(data), 16), 16
    )
    words, total_bits = npref.encode_bits(data, table)
    max_len = max(table.max_len_present, 1)
    min_len = max(table.min_len, 1)
    n_subseq = -(-total_bits // S._SEG_BITS)
    n_subseq = 1 << max(n_subseq - 1, 1).bit_length()
    lim = np.zeros((1, 32), np.uint32)
    lim[0, : table.lim_left.shape[0]] = table.lim_left
    out_cap = total_bits // min_len + 4
    words_j = jnp.asarray(words)
    lim_j = jnp.asarray(lim)
    kw = dict(
        seg_bits=S._SEG_BITS, n_subseq=n_subseq, max_len=max_len,
        min_len=min_len, interpret=interpret,
    )

    def mk_trans(R):
        @jax.jit
        def f(w):
            def body(i, carry):
                acc, ww = carry
                ww = ww.at[0].set(ww[0] ^ jnp.uint32(1))
                p = sync_transitions(
                    ww, jnp.int32(total_bits), lim_j, **kw
                )
                return acc ^ jnp.sum(p), ww
            acc, _ = jax.lax.fori_loop(0, R, body, (jnp.int32(0), w))
            return acc
        return f

    def mk_meta(packed):
        def mk(R):
            @jax.jit
            def f(w):
                def body(i, carry):
                    acc, ww = carry
                    ww = ww.at[0].set(ww[0] ^ jnp.uint32(1))
                    entry, counts, scal = S._selfsync_meta(
                        ww, jnp.int32(total_bits), lim_j, out_cap=out_cap,
                        packed_scan=packed, **kw
                    )
                    return (
                        acc ^ jnp.sum(entry) ^ jnp.sum(counts) ^ scal[0],
                        ww,
                    )
                acc, _ = jax.lax.fori_loop(0, R, body, (jnp.int32(0), w))
                return acc
            return f
        return mk

    # fused second dispatch (plan frozen from one real meta pass): the
    # r5 full-path number (0.0235 GB/s) is ~25x the sum of the measured
    # meta stages, so the missing time must be here or in the host glue —
    # measure, don't infer
    from huffman_tpu.models.selfsync import DecSpec, chain_spec
    from huffman_tpu.ops.compact import (
        TILE_BYTES,
        CompactStatics,
        _round_up,
        _sym_tiles,
        pick_chunk,
    )
    from huffman_tpu.ops.pallas.decode_kernel import fused_planned_decode
    from huffman_tpu.ops.tables import device_dec_table

    entry, counts, scal = S._selfsync_meta(
        words_j, jnp.int32(total_bits), lim_j, out_cap=out_cap, **kw
    )
    scal_h = np.asarray(scal)
    total_syms, max_count = int(scal_h[0]), int(scal_h[1])
    band, s_cap, chunk_bytes = pick_chunk(scal_h[2:])
    statics = CompactStatics(
        out_size=total_syms,
        n_segs=n_subseq,
        band=band,
        s_cap=s_cap,
        s_pad=_round_up(max(n_subseq, 1), 8) + s_cap,
        chunk_bytes=chunk_bytes,
        n_tiles=-(-total_syms // TILE_BYTES),
    )
    symlo, symhi = _sym_tiles(np.asarray(table.symtab, np.uint8))
    dec = device_dec_table(table, two_level=False)
    spec = DecSpec(
        lut_bits=max_len, max_len=max_len, min_len=min_len,
        chain=chain_spec(table),
    )
    mc_p = -(-max(max_count, 1) // 8) * 8
    log(f"plan: total_syms={total_syms} max_count={max_count} band={band} "
        f"s_cap={s_cap} chunk_bytes={chunk_bytes}")

    def mk_fused(R):
        @jax.jit
        def f(w):
            def body(i, carry):
                acc, ww = carry
                ww = ww.at[0].set(ww[0] ^ jnp.uint32(1))
                out = fused_planned_decode(
                    ww, entry, counts, symlo, symhi, dec, spec=spec,
                    seg_bits=S._SEG_BITS, n_segs=n_subseq,
                    max_count=mc_p, statics=statics, interpret=interpret,
                )
                return acc ^ jnp.sum(out.astype(jnp.int32)), ww
            acc, _ = jax.lax.fori_loop(0, R, body, (jnp.int32(0), w))
            return acc
        return f

    makers = {
        "trans": mk_trans,
        "meta": mk_meta(True),
        "meta_unpacked": mk_meta(False),
        "fused": mk_fused,
    }
    reps = args.reps
    ts = measure_chained_multi(
        makers, max(reps // 2, 1), reps, words_j, trials=args.trials
    )
    out = {}
    for name, dt in ts.items():
        out[name + "_ms"] = round(dt * 1e3, 2)
        log(f"{name}: {dt*1e3:.2f} ms  ({size/dt/1e9:.4f} GB/s)")
    out["scan_ms"] = round(out["meta_ms"] - out["trans_ms"], 2)
    print(json.dumps(
        {"metric": "selfsync_stage_split", "size": size,
         "n_subseq": n_subseq, **out}
    ), flush=True)


if __name__ == "__main__":
    main()
