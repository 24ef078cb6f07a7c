"""Interleaved rot-ON vs rot-OFF A/B on real TPU (encode + decode).

Round-2 turned the lane-decorrelation rotation (container v4) on by default
without an interleaved measurement; BENCH_r02 then regressed vs r01
(decode 43.8 vs 46.4 GB/s, encode 28.9 vs 39.1).  Cross-process comparisons
on this tunnel are worthless (dispatch drift ~1.4x), so this tool compiles
all four variants (decode/encode x rot on/off) in ONE process and
interleaves chained-repeat trials (`bench.py::measure_chained_multi`).

Usage: python tools/ab_rot.py [--size BYTES] [--redundancy R] [--input F]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import log, measure_chained_multi  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 28)
    ap.add_argument("--redundancy", type=float, default=0.5)
    ap.add_argument("--input", type=str, default=None)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--trials", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from huffman_tpu.core.ils_ref import ILS_LANES
    from huffman_tpu.models import IlsCodec
    from huffman_tpu.ops.ils import _as_tiles_i32, ils_encode_to_device
    from huffman_tpu.ops.pallas.ils_kernels import (
        ils_compact,
        ils_decode,
        ils_pack_certify,
    )
    from huffman_tpu.utils import generate_redundant

    log(f"devices: {jax.devices()}")
    interpret = jax.default_backend() != "tpu"
    if args.input:
        raw = np.fromfile(args.input, np.uint8)
        fit_sample = raw[: 1 << 20]
    else:
        fit_sample = generate_redundant(1 << 20, args.redundancy, seed=0)
    codec0 = IlsCodec.fit(fit_sample)
    k = codec0.k
    tile_bytes = k * ILS_LANES
    if args.input:
        size = max(raw.size // tile_bytes, 1) * tile_bytes
        data = (np.tile(raw, -(-size // raw.size))[:size]
                if raw.size < size else raw[:size])
    else:
        size = max(args.size // tile_bytes, 1) * tile_bytes
        data = generate_redundant(size, args.redundancy, seed=0)
    log(f"{size} bytes, k={k}, {size // tile_bytes} tiles")
    codec = IlsCodec.fit(data, k=k)
    maxlen = max(codec.table.max_len_present, 1)
    minlen = max(codec.table.min_len, 1)
    dec, enc = codec.dec, codec.enc

    data_i32 = jnp.asarray(_as_tiles_i32(data, k))
    conts = {}
    for rot in (False, True):
        t0 = time.perf_counter()
        pay, rs, p = ils_encode_to_device(
            data_i32, enc, k=k, avg_bits=codec.fit_avg_bits,
            max_len=maxlen, rot=rot, interpret=interpret)
        log(f"rot={rot}: encode wall {time.perf_counter() - t0:.1f}s "
            f"w_band={p.w_band} w_cap={p.w_cap} total_rows={p.total_rows}")
        conts[rot] = (pay, rs, p)

    params = jnp.asarray(np.array([conts[False][2].snum, 0], np.int32))

    def mk_decode(rot, R):
        p = conts[rot][2]
        boffs = jnp.asarray(p.boffs, jnp.int32)
        rs = conts[rot][1]

        @jax.jit
        def f(pay_f, pay_t, data0):
            pay0 = pay_t if rot else pay_f

            def body(i, carry):
                acc, pr = carry
                pr = pr.at[0, 0, 0].set(pr[0, 0, 0] ^ 1)
                o = ils_decode(pr, rs, params, boffs, dec, k=p.k,
                               w_cap=p.w_cap, w_band=p.w_band, max_len=maxlen,
                               min_len=minlen, n_tiles=p.n_tiles, rot=p.rot,
                               interpret=interpret)
                return acc ^ o[0, 0, :8], pr
            acc, _ = jax.lax.fori_loop(
                0, R, body, (jnp.zeros(8, jnp.int32), pay0))
            return acc
        return f

    def mk_encode(rot, R):
        p = conts[rot][2]
        rs = conts[rot][1]
        stride_rows = max(2 * (-(-p.k * maxlen // 64)), 4)
        pack = functools.partial(ils_pack_certify, k=p.k,
                                 stride_rows=stride_rows, rot=rot,
                                 interpret=interpret)

        @jax.jit
        def f(pay_f, pay_t, data0):
            def body(i, carry):
                acc, d = carry
                d = d.at[0, 0, 0].set(d[0, 0, 0] ^ 1)
                pay_s, bits, dn, dx, viol = pack(d, params, enc)
                payload = ils_compact(pay_s, rs, stride_rows=stride_rows,
                                      w_cap=p.w_cap, total_rows=p.total_rows,
                                      interpret=interpret)
                return acc ^ payload[0, 0, :8] ^ bits[0, 0, :8] ^ viol[0, 0, :8], d
            acc, _ = jax.lax.fori_loop(
                0, R, body, (jnp.zeros(8, jnp.int32), data0))
            return acc
        return f

    # verify both decode variants on device before timing
    for rot in (False, True):
        p = conts[rot][2]
        boffs = jnp.asarray(p.boffs, jnp.int32)
        out = jax.jit(functools.partial(
            ils_decode, k=p.k, w_cap=p.w_cap, w_band=p.w_band, max_len=maxlen,
            min_len=minlen, n_tiles=p.n_tiles, rot=p.rot, interpret=interpret,
        ), static_argnames=())(conts[rot][0], conts[rot][1], params, boffs, dec)
        ok = bool(jnp.all(out == data_i32))
        log(f"rot={rot}: verify {'PASS' if ok else 'FAIL'}")
        assert ok

    makers = {
        "dec_norot": functools.partial(mk_decode, False),
        "dec_rot": functools.partial(mk_decode, True),
        "enc_norot": functools.partial(mk_encode, False),
        "enc_rot": functools.partial(mk_encode, True),
    }
    reps = min(args.reps * max((1 << 26) // size, 1), 512)
    ts = measure_chained_multi(
        makers, max(reps // 4, 1), reps,
        conts[False][0], conts[True][0], data_i32, trials=args.trials)
    for name in sorted(ts):
        log(f"{name}: {size / ts[name] / 1e9:.3f} GB/s ({ts[name]*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
