"""Build the heterogeneous real-data corpus (VERDICT r5 item 6).

Six files exercising the policy tiers the synthetic benches cannot: the
ILS anchor escalation (mu -> laggard -> two-pass), rotate="auto"'s band
narrowing on 4 KB-periodic content, and the gap/yamamoto paths' entropy
sensitivity.  All content is sourced locally (no network):

  src.tar      tar of a site-packages subtree (mixed source/data, the
               reference-fixture analog of a real project tree)
  binary.bin   large ELF shared objects (dense, structured binary)
  text.bin     concatenated Python/text sources (natural-ish text)
  precomp.bin  gzip of src.tar (already-compressed, ~incompressible)
  zeros.bin    degenerate all-zero run
  blocky.bin   alternating zero / random / text 1 MB blocks (the
               heterogeneous schedule-drift case behind the per-window
               band anchors)

Usage: python tools/make_corpus.py [outdir] [--size-mb 48]
"""

import argparse
import gzip
import io
import os
import sys
import tarfile

import numpy as np

SP = "/opt/venv/lib/python3.12/site-packages"


def _cap_write(path, chunks, size):
    n = 0
    with open(path, "wb") as f:
        for c in chunks:
            take = min(len(c), size - n)
            f.write(c[:take])
            n += take
            if n >= size:
                break
    # cycle to fill if the source ran short
    if 0 < n < size:
        with open(path, "rb") as f:
            buf = f.read()
        with open(path, "ab") as f:
            while n < size:
                take = min(len(buf), size - n)
                f.write(buf[:take])
                n += take
    print(f"{path}: {n} bytes")


def iter_files(root, exts=None, limit_each=None):
    for dirpath, _, names in sorted(os.walk(root)):
        for name in sorted(names):
            if exts and not any(name.endswith(e) for e in exts):
                continue
            p = os.path.join(dirpath, name)
            try:
                with open(p, "rb") as f:
                    yield f.read(limit_each) if limit_each else f.read()
            except OSError:
                continue


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="/root/corpus")
    ap.add_argument("--size-mb", type=int, default=48)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    size = args.size_mb << 20

    # src.tar: a real mixed tree (numpy: C sources, .py, .pyi, tests, data)
    tar_buf = io.BytesIO()
    with tarfile.open(fileobj=tar_buf, mode="w") as tf:
        for sub in ("numpy", "jax"):
            root = os.path.join(SP, sub)
            if os.path.isdir(root):
                tf.add(root, arcname=sub)
            if tar_buf.tell() > size + (4 << 20):
                break
    tar_bytes = tar_buf.getvalue()
    _cap_write(os.path.join(args.outdir, "src.tar"), [tar_bytes], size)

    so_files = []
    for dirpath, _, names in os.walk(SP):
        for n in names:
            if n.endswith(".so"):
                p = os.path.join(dirpath, n)
                try:
                    if os.path.getsize(p) > (4 << 20):
                        so_files.append(p)
                except OSError:
                    pass
    so_files.sort(key=os.path.getsize, reverse=True)
    _cap_write(
        os.path.join(args.outdir, "binary.bin"),
        (open(p, "rb").read(size) for p in so_files[:8]),
        size,
    )

    _cap_write(
        os.path.join(args.outdir, "text.bin"),
        iter_files(os.path.join(SP, "numpy"), exts=(".py", ".pyi", ".txt")),
        size,
    )

    gz = gzip.compress(tar_bytes[: size], compresslevel=6)
    _cap_write(os.path.join(args.outdir, "precomp.bin"), [gz], size)

    with open(os.path.join(args.outdir, "zeros.bin"), "wb") as f:
        f.write(b"\0" * size)
    print(f"{args.outdir}/zeros.bin: {size} bytes")

    rng = np.random.default_rng(7)
    text = open(os.path.join(args.outdir, "text.bin"), "rb").read(1 << 20)
    blocks = []
    kinds = ["zero", "rand", "text"]
    for i in range(size >> 20):
        k = kinds[i % 3]
        if k == "zero":
            blocks.append(b"\0" * (1 << 20))
        elif k == "rand":
            blocks.append(rng.integers(0, 256, 1 << 20, np.uint8).tobytes())
        else:
            blocks.append(text)
    _cap_write(os.path.join(args.outdir, "blocky.bin"), blocks, size)


if __name__ == "__main__":
    main()
