"""Command-line interface: generate / encode / decode / roundtrip / bench.

Replaces the reference's per-variant demo binaries (`generate.cpp` CLI,
`gpuhd/src/demo.cc`, `Huffman_coding_Gap_arrays/run_huffman.sh`) with one
entry point::

    python -m huffman_tpu.cli generate --size 100000000 --redundancy 0.5 -o data.bin
    python -m huffman_tpu.cli encode data.bin -o data.htc
    python -m huffman_tpu.cli decode data.htc -o out.bin
    python -m huffman_tpu.cli roundtrip data.bin
    python -m huffman_tpu.cli bench --size 268435456 --redundancy 0.5
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _add_codec_args(p):
    p.add_argument("--max-len", type=int, default=16)
    p.add_argument("--seg-bits", type=int, default=None)
    p.add_argument("--block-bytes", type=int, default=None)
    p.add_argument(
        "--method", choices=["lut", "canonical"], default="lut",
        help="decode inner-step implementation",
    )


def _codec_kwargs(args):
    from .constants import DEFAULT_BLOCK_BYTES, SEG_BITS

    return dict(
        max_len=args.max_len,
        seg_bits=args.seg_bits or SEG_BITS,
        block_bytes=args.block_bytes or DEFAULT_BLOCK_BYTES,
        method=args.method,
    )


def cmd_generate(args):
    from .utils import generate_redundant

    data = generate_redundant(args.size, args.redundancy, seed=args.seed)
    with open(args.output, "wb") as f:
        f.write(data.tobytes())
    print(f"Generated {args.size} bytes in {args.output}")


def cmd_encode(args):
    from .models import GapArrayCodec
    from .io import write_container

    data = np.fromfile(args.input, np.uint8)
    t0 = time.perf_counter()
    codec = GapArrayCodec.fit(data, **_codec_kwargs(args))
    comp = codec.encode(data)
    blob = write_container(comp)
    dt = time.perf_counter() - t0
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"Original size:   {data.size} bytes")
    print(f"Compressed size: {len(blob)} bytes")
    print(f"Ratio:           {100.0 * len(blob) / max(data.size, 1):.2f}%")
    print(f"Encode time:     {dt * 1e3:.1f} ms ({data.size / dt / 1e9:.3f} GB/s inc. fit+IO)")


def cmd_decode(args):
    from .models import GapArrayCodec
    from .io import read_container

    blob = open(args.input, "rb").read()
    try:
        comp = read_container(blob)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        sys.exit(1)
    codec = GapArrayCodec(
        comp.table, seg_bits=comp.seg_bits, block_bytes=comp.block_bytes,
        method=args.method,
    )
    t0 = time.perf_counter()
    out = codec.decode(comp)
    dt = time.perf_counter() - t0
    out.tofile(args.output)
    print(f"Decompressed {out.size} bytes in {dt * 1e3:.1f} ms "
          f"({out.size / dt / 1e9:.3f} GB/s inc. host staging)")


def cmd_roundtrip(args):
    from .models import GapArrayCodec
    from .io import write_container, read_container

    data = np.fromfile(args.input, np.uint8)
    codec = GapArrayCodec.fit(data, **_codec_kwargs(args))
    comp = read_container(write_container(codec.encode(data)))
    out = codec.decode(comp)
    ok = np.array_equal(out, data)
    print(f"Original size:   {data.size} bytes")
    print(f"Compressed size: {comp.compressed_bytes} bytes "
          f"({100.0 * comp.compressed_bytes / max(data.size, 1):.2f}%)")
    print(f"Verification:    {'PASS' if ok else 'FAIL'}")
    if not ok:
        bad = np.nonzero(out != data)[0]
        i = int(bad[0])
        print(f"first difference at byte {i}: got {out[i]}, expected {data[i]}")
        sys.exit(1)


def cmd_bench(args):
    from .utils import generate_redundant
    from .utils.timing import bench_fn
    from .models import GapArrayCodec

    data = generate_redundant(args.size, args.redundancy, seed=args.seed)
    codec = GapArrayCodec.fit(data, **_codec_kwargs(args))
    comp = codec.encode(data)
    enc = bench_fn("encode", lambda: codec.encode(data), data.size,
                   warmup=args.warmup, repeat=args.repeat)
    dec = bench_fn("decode", lambda: codec.decode(comp), data.size,
                   warmup=args.warmup, repeat=args.repeat)
    ok = np.array_equal(codec.decode(comp), data)
    print(enc)
    print(dec)
    print(f"verification: {'PASS' if ok else 'FAIL'}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="huffman_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("generate", help="write synthetic data (generate.cpp semantics)")
    p.add_argument("--size", type=int, required=True)
    p.add_argument("--redundancy", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-o", "--output", default="data.bin")
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("encode", help="compress a file to an HTC1 container")
    p.add_argument("input")
    p.add_argument("-o", "--output", required=True)
    _add_codec_args(p)
    p.set_defaults(fn=cmd_encode)

    p = sub.add_parser("decode", help="decompress an HTC1 container")
    p.add_argument("input")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--method", choices=["lut", "canonical"], default="lut")
    p.set_defaults(fn=cmd_decode)

    p = sub.add_parser("roundtrip", help="encode+decode+verify a file")
    p.add_argument("input")
    _add_codec_args(p)
    p.set_defaults(fn=cmd_roundtrip)

    p = sub.add_parser("bench", help="throughput benchmark on synthetic data")
    p.add_argument("--size", type=int, default=1 << 28)
    p.add_argument("--redundancy", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--repeat", type=int, default=5)
    _add_codec_args(p)
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
