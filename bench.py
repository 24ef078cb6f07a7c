"""Headline benchmark: decode GB/s on one chip (plus encode, on stderr).

Prints ONE JSON line on stdout:
    {"metric": "decode_gbps_1chip", "value": N, "unit": "GB/s", "vs_baseline": N}

vs_baseline is relative to the reference repo's own oracle codec
(`sequential.cpp`) measured on this host (it is the only reproducible number
the reference provides — it publishes no benchmark results, see BASELINE.md):
decode 4.93 MB/s = 0.00517 GB/s on 100 MB of generate.cpp r=0.5 data.

Throughput convention matches the reference: uncompressed bytes / second
(`gpuhd/src/demo.cc:240-242` and `decoder/src/decoder.cu` print MB/s of the
original size).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

# Reference sequential.cpp measured on this host (see BASELINE.md).
BASELINE_DECODE_GBPS = 4.92985 * 1024 * 1024 / 1e9  # 0.00517 GB/s
BASELINE_ENCODE_GBPS = 6.23814 * 1024 * 1024 / 1e9


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 28)  # 256 MiB
    ap.add_argument("--redundancy", type=float, default=0.5)
    ap.add_argument("--block-bytes", type=int, default=1 << 24)
    ap.add_argument("--seg-bits", type=int, default=None)
    ap.add_argument("--method", default="lut")
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from huffman_tpu.constants import SEG_BITS
    from huffman_tpu.core import canonical_code_table, package_merge_lengths, npref
    from huffman_tpu.ops import (
        dec_spec,
        device_dec_table,
        device_enc_table,
    )
    from huffman_tpu.ops.decode import decode_block
    from huffman_tpu.ops.encode import encode_block
    from huffman_tpu.utils import generate_redundant

    seg_bits = args.seg_bits or SEG_BITS
    log(f"devices: {jax.devices()}")
    size = args.size - args.size % args.block_bytes
    n_blocks = size // args.block_bytes
    log(f"generating {size} bytes (r={args.redundancy}), "
        f"{n_blocks} x {args.block_bytes}B blocks, seg_bits={seg_bits}")
    data = generate_redundant(size, args.redundancy, seed=0)

    t0 = time.perf_counter()
    table = canonical_code_table(package_merge_lengths(npref.histogram(data), 16), 16)
    log(f"host table construction: {time.perf_counter() - t0:.3f}s")
    enc = device_enc_table(table)
    dec = device_dec_table(table)
    spec = dec_spec(table)

    blocks = jnp.asarray(data.reshape(n_blocks, args.block_bytes))
    bits = table.lengths.astype(np.int64)[data.reshape(n_blocks, -1)].sum(axis=1)
    max_words = (int(bits.max()) // 32 + 512) // 512 * 512
    n_segs = -(-max_words * 32 // seg_bits)

    enc_fn = jax.jit(
        jax.vmap(
            functools.partial(
                encode_block,
                enc=enc,
                seg_bits=seg_bits,
                max_words=max_words,
                n_segs=n_segs,
            )
        )
    )
    words, total_bits, gaps, counts = jax.block_until_ready(enc_fn(blocks))
    max_count = (int(jnp.max(counts)) + 15) // 16 * 16

    dec_fn = jax.jit(
        jax.vmap(
            functools.partial(
                decode_block,
                dec=dec,
                spec=spec,
                seg_bits=seg_bits,
                max_count=max_count,
                out_size=args.block_bytes,
                method=args.method,
            )
        )
    )
    out = jax.block_until_ready(dec_fn(words, gaps, counts))
    ok = bool(np.array_equal(np.asarray(out).reshape(-1), data))
    log(f"verification: {'PASS' if ok else 'FAIL'}")
    if not ok:
        print(json.dumps({"metric": "decode_gbps_1chip", "value": 0.0,
                          "unit": "GB/s", "vs_baseline": 0.0}))
        sys.exit(1)

    def timeit(fn, *xs):
        for _ in range(args.warmup):
            jax.block_until_ready(fn(*xs))
        ts = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*xs))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    t_dec = timeit(dec_fn, words, gaps, counts)
    t_enc = timeit(enc_fn, blocks)
    dec_gbps = size / t_dec / 1e9
    enc_gbps = size / t_enc / 1e9
    comp_bits = int(np.asarray(total_bits, np.int64).sum())
    meta_bits = 16 * int(sum(-(-int(b) // seg_bits) for b in np.asarray(total_bits)))
    ratio = (comp_bits + meta_bits) / 8 / size
    log(f"decode: {dec_gbps:.3f} GB/s ({t_dec*1e3:.1f} ms)")
    log(f"encode: {enc_gbps:.3f} GB/s ({t_enc*1e3:.1f} ms)")
    log(f"compression ratio (payload+seg metadata): {ratio*100:.2f}%")
    log(f"vs sequential.cpp decode baseline ({BASELINE_DECODE_GBPS:.5f} GB/s): "
        f"{dec_gbps / BASELINE_DECODE_GBPS:.0f}x")

    print(json.dumps({
        "metric": "decode_gbps_1chip",
        "value": round(dec_gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(dec_gbps / BASELINE_DECODE_GBPS, 2),
        "extra": {
            "encode_gbps_1chip": round(enc_gbps, 4),
            "compression_ratio": round(ratio, 5),
            "size_bytes": size,
            "redundancy": args.redundancy,
            "verified": ok,
            "baseline": "sequential.cpp decode measured on this host (BASELINE.md)",
        },
    }))


if __name__ == "__main__":
    main()
