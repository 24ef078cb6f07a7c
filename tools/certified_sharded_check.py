"""Certified sharded pipeline at scale on the virtual 8-device CPU mesh.

VERDICT r3 item 3's acceptance run: a >= 64 MB heterogeneous stream through
the PRODUCTION configuration — per-device fused certify+pack, ONE global
certification, per-device compaction, CERTIFIED-band sharded decode — bit
exact.  (The pytest version runs the same pipeline at smoke scale; this
script is the full-size evidence run, interpret-mode Pallas on the CPU
mesh, so expect tens of minutes.)

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python tools/certified_sharded_check.py [size_bytes]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax

# BEFORE any backend probe: the container pins the TPU platform via the
# config API, and probing (`default_backend()`) would initialize it
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from huffman_tpu.core import canonical_code_table, npref, package_merge_lengths
from huffman_tpu.core.canonical import chain_spec
from huffman_tpu.core.ils_ref import ILS_LANES, ils_n_win
from huffman_tpu.ops.ils import _as_tiles_i32
from huffman_tpu.ops.pallas.ils_kernels import ils_dec_tabs, ils_enc_tabs
from huffman_tpu.parallel import (
    data_mesh,
    ils_sharded_certified_encode,
    make_ils_sharded_decode,
)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 26
    n_devices, k = 8, 1024
    tile_bytes = k * ILS_LANES
    tpd = max(size // (n_devices * tile_bytes), 1)
    n = n_devices * tpd * tile_bytes
    print(f"{n} bytes, {n_devices} devices x {tpd} tiles of k={k}", flush=True)

    rng = np.random.default_rng(42)
    data = np.concatenate([
        np.zeros(n // 4, np.uint8),
        rng.integers(0, 256, n // 2).astype(np.uint8),
        np.tile(np.frombuffer(b"certified sharded pipeline! ", np.uint8),
                -(-(n - n // 4 - n // 2) // 28))[: n - n // 4 - n // 2],
    ])
    table = canonical_code_table(
        package_merge_lengths(npref.histogram(data), 16), 16
    )
    avg_bits = float(
        (npref.histogram(data) * table.lengths.astype(np.int64)).sum()
    ) / n
    mesh = data_mesh(n_devices)
    enc, dec = ils_enc_tabs(table), ils_dec_tabs(table)
    data_dev = jnp.asarray(
        _as_tiles_i32(data, k).reshape(n_devices, tpd * (k // 4), 8, 128)
    )

    t0 = time.time()
    sec = ils_sharded_certified_encode(
        mesh, data_dev, enc, k=k, max_len=max(table.max_len_present, 1),
        avg_bits=avg_bits, tiles_per_device=tpd, interpret=True,
    )
    p = sec.params
    print(f"encode {time.time()-t0:.0f}s: w_band={p.w_band} w_cap={p.w_cap} "
          f"(banded: {p.w_band <= p.w_cap // 2})", flush=True)

    dec_fn = make_ils_sharded_decode(
        mesh, k=k, w_cap=p.w_cap, w_band=p.w_band,
        max_len=max(table.max_len_present, 1),
        min_len=max(table.min_len, 1), tiles_per_device=tpd,
        chain=chain_spec(table), interpret=True,
    )
    t0 = time.time()
    out = dec_fn(
        sec.payload_dev, sec.starts_dev,
        jnp.asarray(np.array([p.snum, 0], np.int32)),
        jnp.asarray(p.boffs.reshape(n_devices, tpd, ils_n_win(k))),
        dec,
    )
    got = np.asarray(out).reshape(-1, 8, 128).view(np.uint32).reshape(-1)
    ok = np.array_equal(got.view(np.uint8), data)
    print(f"decode {time.time()-t0:.0f}s: bit-exact={ok}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
