"""Multi-chip scaling benchmark: sharded ILS decode over 1..N devices.

Measures BASELINE configs 4/5 (multi-chip data-parallel decode with ordered
gather) on whatever device population is present: a TPU pod slice reports
real scaling efficiency; a single chip degenerates to the 1-device row; a
CPU host can smoke-test the code path with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
python tools/scaling_bench.py --size $((1<<24)) --interpret``.

Usage:
    python tools/scaling_bench.py [--size BYTES] [--redundancy R] [--k K]

Prints one JSON line per device count with decode GB/s and efficiency
relative to the 1-device run.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 27)
    ap.add_argument("--redundancy", type=float, default=0.5)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax

    if args.interpret:
        # force CPU BEFORE any backend query: probing the pinned remote-TPU
        # platform initializes it (and hangs when the tunnel is down)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from huffman_tpu.core.ils_ref import ILS_LANES
    from huffman_tpu.models import IlsCodec
    from huffman_tpu.ops.ils import _as_tiles_i32, ils_encode_to_device
    from huffman_tpu.parallel import data_mesh, make_ils_sharded_decode
    from huffman_tpu.utils import generate_redundant
    from huffman_tpu.utils.distributed import init_multihost

    init_multihost()
    n_dev = len(jax.devices())
    print(f"devices: {n_dev}", file=sys.stderr)

    codec0 = IlsCodec.fit(
        generate_redundant(1 << 20, args.redundancy, seed=0), k=args.k
    )
    k = codec0.k
    tile_bytes = k * ILS_LANES
    # tile count divisible by every device count we test
    n_tiles = max(args.size // tile_bytes, 1)
    n_tiles -= n_tiles % n_dev or 0
    n_tiles = max(n_tiles, n_dev)
    size = n_tiles * tile_bytes
    data = generate_redundant(size, args.redundancy, seed=0)
    codec = IlsCodec.fit(data, k=k)

    data_i32 = jnp.asarray(_as_tiles_i32(data, k))
    payload_rows, _, p = ils_encode_to_device(
        data_i32, codec.enc, k=k, avg_bits=codec._avg_bits(data),
        interpret=args.interpret,
    )
    payload = np.asarray(payload_rows[: p.total_rows]).reshape(
        p.total_rows, ILS_LANES
    ).view(np.uint32)
    maxlen = max(codec.table.max_len_present, 1)

    from huffman_tpu.parallel.ils import shard_ils_payload

    base_gbps = None
    counts = [d for d in range(1, n_dev + 1) if n_tiles % d == 0]
    for d in counts:
        mesh = data_mesh(d)
        tpd = p.n_tiles // d
        payload_dev, starts_dev = shard_ils_payload(
            payload, p.row_starts, p.w_cap, d
        )
        dec_fn = make_ils_sharded_decode(
            mesh, k=p.k, w_cap=p.w_cap, w_band=p.w_band, max_len=maxlen,
            tiles_per_device=tpd, interpret=args.interpret,
        )
        params = jnp.asarray(np.array([p.snum, 0], np.int32))
        boffs_dev = jnp.asarray(p.boffs.reshape(d, tpd, -1))
        pd = jnp.asarray(payload_dev)
        sd = jnp.asarray(starts_dev)

        out = dec_fn(pd, sd, params, boffs_dev, codec.dec)
        got = np.asarray(out[0, 0, 0, :8])  # force + sanity
        del got

        def run():
            return np.asarray(dec_fn(pd, sd, params, boffs_dev, codec.dec)[0, 0, 0, :8])

        run()
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        t = ts[len(ts) // 2]
        gbps = size / t / 1e9
        if base_gbps is None:
            base_gbps = gbps
        eff = gbps / (base_gbps * d)
        print(json.dumps({
            "devices": d, "decode_gbps": round(gbps, 3),
            "efficiency_vs_1dev": round(eff, 3), "size_bytes": size,
        }))


if __name__ == "__main__":
    main()
