"""Sharded interleaved-stream codec: tiles over a device mesh.

Multi-device orchestration for the flagship ILS layout (SURVEY §2.7): tiles
are fully independent given the replicated code table, so the tile axis
shards over the mesh's ``data`` axis, each device decodes its contiguous
tile range from its own payload row slice, and the ordered gather of decoded
tiles is simply the output sharding of the jitted step.  Contrast with the
reference's broken multi-GPU split at arbitrary unit boundaries
(`gpuhd/multigpu_demo.cc:186-204`, README "TESTS FAIL"): ILS tiles are
self-contained at *encode* time, so any split at tile granularity is correct
by construction.

The roundtrip step runs in *full-band* mode (``w_band == w_cap``): the
refill window always covers every payload row, which is unconditionally
correct without a certification pass (the banded fast path needs the
encoder-measured envelope, which requires a host sync — fine for the codec,
not for a single fused device step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import DATA_AXIS, Mesh, P
from ..core.ils_ref import ils_n_win
from ..ops.pallas.ils_kernels import ils_decode, ils_pack

__all__ = [
    "shard_ils_payload",
    "make_ils_sharded_decode",
    "make_ils_sharded_roundtrip",
]


def _cdiv(a, b):
    return -(-a // b)


def shard_ils_payload(payload: np.ndarray, row_starts: np.ndarray, w_cap: int,
                      n_devices: int):
    """Repartition a compact ILS payload for a D-way tile shard.

    Args:
      payload: (total_rows, 1024) uint32 compact rows.
      row_starts: (n_tiles + 1,) row offset per tile (cumsum of W_t).
      n_devices: D; n_tiles must be a multiple of D.

    Returns (payload_dev (D, R_dev, 8, 128) int32, starts_dev (D, T/D) int32)
    where R_dev rows include w_cap slack so in-kernel DMAs never overrun.
    """
    n_tiles = len(row_starts) - 1
    if n_tiles % n_devices:
        raise ValueError(f"{n_tiles} tiles not divisible by {n_devices} devices")
    tpd = n_tiles // n_devices
    rows3 = payload.view(np.int32).reshape(-1, 8, 128)
    r_dev = max(
        int(row_starts[(d + 1) * tpd] - row_starts[d * tpd])
        for d in range(n_devices)
    ) + w_cap
    payload_dev = np.zeros((n_devices, r_dev, 8, 128), np.int32)
    starts_dev = np.zeros((n_devices, tpd), np.int32)
    for d in range(n_devices):
        lo = int(row_starts[d * tpd])
        hi = int(row_starts[(d + 1) * tpd])
        payload_dev[d, : hi - lo] = rows3[lo:hi]
        starts_dev[d] = row_starts[d * tpd : (d + 1) * tpd] - lo
    return payload_dev, starts_dev


def make_ils_sharded_decode(
    mesh: Mesh,
    *,
    k: int,
    w_cap: int,
    w_band: int,
    max_len: int,
    tiles_per_device: int,
    rot: bool = False,
    chain: tuple | None = None,
    interpret: bool = False,
):
    """Jitted sharded ILS decode.

    Returns fn(payload_dev, starts_dev, params, boffs_dev, dec) ->
    (D*T/D*k//4, 8, 128) int32 sharded over the leading axis — reshape(-1)
    is the original u32 stream in order.  boffs_dev is
    (D, tiles_per_device, n_win) windowed band anchors.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None, None), P(DATA_AXIS, None), P(),
                  P(DATA_AXIS, None, None), P()),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    def dec_fn(payload_dev, starts_dev, params, boffs_dev, dec):
        out = ils_decode(
            payload_dev[0],
            starts_dev[0],
            params,
            boffs_dev[0],
            dec,
            k=k,
            w_cap=w_cap,
            w_band=w_band,
            max_len=max_len,
            n_tiles=tiles_per_device,
            rot=rot,
            chain=chain,
            interpret=interpret,
        )
        return out[None]

    dec_jit = jax.jit(dec_fn)

    def fn(payload_dev, starts_dev, params, boffs_dev, dec):
        d, t = payload_dev.shape[0], tiles_per_device
        out = dec_jit(payload_dev, starts_dev, params, boffs_dev, dec)
        return out.reshape(d * t * (k // 4), 8, 128)

    return dec_jit, fn


def make_ils_sharded_roundtrip(
    mesh: Mesh,
    *,
    k: int,
    max_len: int,
    tiles_per_device: int,
    rot: bool = False,
    interpret: bool = False,
):
    """Full device step over the mesh: ILS pack -> decode -> bit-exact check.

    This is the framework's "training step" analog: one jitted program,
    sharded over all chips, replicated tables, full-band (certification-free)
    windows, ordered recombination, collective verification (pmin).
    Returns fn(data_i32 (D, T/D*k//4, 8, 128), enc, dec) -> (decoded, ok).
    """
    # worst-case even row count: always sufficient, full-band schedule
    w_cap = 2 * (_cdiv(k * max_len, 64) + 2)
    params = jnp.zeros(2, jnp.int32)  # snum=0, boff=0

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None, None), P(), P()),
        out_specs=(P(DATA_AXIS, None, None, None), P()),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    def step(data_dev, enc, dec):
        local = data_dev[0]
        boffs = jnp.zeros((tiles_per_device, ils_n_win(k)), jnp.int32)
        starts = jnp.arange(tiles_per_device, dtype=jnp.int32) * w_cap
        rows = ils_pack(
            local, params, boffs, starts, enc, k=k, w_cap=w_cap,
            w_band=w_cap // 2, total_rows=tiles_per_device * w_cap,
            rot=rot, interpret=interpret,
        )
        out = ils_decode(
            rows, starts, params, boffs, dec, k=k, w_cap=w_cap,
            w_band=w_cap // 2, max_len=max_len, n_tiles=tiles_per_device,
            rot=rot, interpret=interpret,
        )
        ok_local = jnp.all(out == local).astype(jnp.int32)
        ok = jax.lax.pmin(ok_local, DATA_AXIS)
        return out[None], ok

    return jax.jit(step)
