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
from ..core.ils_ref import IlsParams, ils_n_win, ils_schedule_numer
from ..ops.pallas.ils_kernels import (
    ils_compact,
    ils_decode,
    ils_pack,
    ils_pack_certify,
)

__all__ = [
    "shard_ils_payload",
    "make_ils_sharded_decode",
    "make_ils_sharded_roundtrip",
    "ils_sharded_certified_encode",
    "IlsShardedSection",
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
    min_len: int = 1,
    rot: bool = False,
    chain: tuple | None = None,
    interpret: bool = False,
):
    """Jitted sharded ILS decode.

    Returns ONE jitted fn(payload_dev, starts_dev, params, boffs_dev, dec)
    -> (D, T/D * k//4, 8, 128) int32 sharded over the leading axis —
    reshape(-1, 8, 128) stacks devices' tiles in order, whose u32 view is
    the original stream.  boffs_dev is (D, tiles_per_device, n_win)
    windowed band anchors.
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
            min_len=min_len,  # the grouped chain is exact only from the
            n_tiles=tiles_per_device,  # table's own min_len
            rot=rot,
            chain=chain,
            interpret=interpret,
        )
        return out[None]

    return jax.jit(dec_fn)


class IlsShardedSection:
    """Device-sharded certified section: per-device compact payload + the
    global certified params (uniform w_cap/w_band across devices)."""

    def __init__(self, payload_dev, starts_dev, params: IlsParams):
        self.payload_dev = payload_dev  # (D, R_dev, 8, 128) int32
        self.starts_dev = starts_dev  # (D, T/D) int32 local row starts
        self.params = params  # global; boffs is (D*T/D, n_win)


def ils_sharded_certified_encode(
    mesh: Mesh,
    data_dev,
    enc,
    *,
    k: int,
    max_len: int,
    avg_bits: float,
    tiles_per_device: int,
    rot: bool = False,
    interpret: bool = False,
) -> IlsShardedSection:
    """Certified sharded encode: the PRODUCTION configuration, multi-device
    (VERDICT r3 item 3 — the old sharded roundtrip only exercised the
    certification-free full-band mode).

    Per device (shard_map over the ``data`` axis): the fused certify+pack
    kernel at worst-case stride, with the schedule envelopes reduced to
    per-(tile, window) scalars on device.  On host: ONE global
    certification over all devices' envelopes (uniform w_cap/w_band so
    every device runs the same compiled decode — the multi-device analog of
    `ops/ils.py::certify_params`).  Per device again: the DMA compaction to
    certified row starts.  Only O(n_tiles) metadata crosses the link.

    This is the encode-time partitioning the reference's prescan demo was
    groping toward (`gpuhd-multigpu/multigpu_demo_prescan.cc:276-319`):
    tiles are self-contained at encode time, so device boundaries are
    always codeword-aligned by construction.

    Retries with the "laggard" anchor on fused-band violation; raises
    ValueError for sections that need the two-pass path (use the
    single-device codec for those).
    """
    from ..ops.ils import FUSED_STRIDE_BUDGET, certify_params, fused_e_band

    n_dev = mesh.devices.size
    n_tiles = n_dev * tiles_per_device
    n_win = ils_n_win(k)
    snum = ils_schedule_numer(avg_bits)
    stride_rows = max(2 * (-(-k * max_len // 64)), 4)
    # the same feasibility gates the single-device path applies BEFORE any
    # kernel launches (`ops/ils.py::ils_encode_to_device`): stride_rows < 8
    # can never pass the compact gate, and past FUSED_STRIDE_BUDGET the pack
    # scratch exceeds VMEM — launching anyway dies in a Mosaic compile
    # failure (which can wedge the shared TPU tunnel) instead of the clean
    # ValueError promised below
    if stride_rows < 8 or stride_rows > FUSED_STRIDE_BUDGET:
        raise ValueError(
            f"stride_rows={stride_rows} outside the fused certify+pack "
            "budget; this section needs the two-pass single-device path"
        )
    e_band = fused_e_band(k)
    params_j = jnp.asarray(np.array([snum, 0], np.int32))

    def mk_pack(anchor):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None, None, None), P(), P()),
            out_specs=(
                P(DATA_AXIS, None, None, None),
                P(DATA_AXIS, None),
                P(DATA_AXIS, None, None),
                P(DATA_AXIS, None, None),
                P(DATA_AXIS),
            ),
            check_vma=False,
        )
        def pack_fn(data_dev, params, enc):
            pay_s, bits, dn, dx, viol = ils_pack_certify(
                data_dev[0], params, enc, k=k, stride_rows=stride_rows,
                e_band=e_band, rot=rot, anchor=anchor, interpret=interpret,
            )
            w_tiles = jnp.maximum(2 * (-(-jnp.max(bits, axis=(1, 2)) // 64)), 4)
            dmin = jnp.min(dn, axis=(2, 3))  # (tpd, n_win)
            dmax = jnp.max(dx, axis=(2, 3))
            return (
                pay_s[None],
                w_tiles[None],
                dmin[None],
                dmax[None],
                jnp.max(viol)[None],
            )

        return jax.jit(pack_fn)

    for anchor in ("mu", "laggard"):
        pay_s, w_tiles, dmin, dmax, viol = mk_pack(anchor)(
            data_dev, params_j, enc
        )
        if not int(jnp.max(viol)):
            break
    else:
        raise ValueError(
            "fused certify+pack violated its emission band at both anchors; "
            "this section needs the two-pass single-device path"
        )

    w_tiles_h = np.asarray(w_tiles).astype(np.int64)  # (D, tpd)
    params = certify_params(
        k=k, snum=snum, n_tiles=n_tiles,
        w_tiles=w_tiles_h.reshape(-1),
        dec_min=np.asarray(dmin).reshape(n_tiles, n_win),
        dec_max=np.asarray(dmax).reshape(n_tiles, n_win),
        rot=rot,
    )
    if params.w_cap > 2 * stride_rows:
        raise ValueError(
            "envelope-widened w_cap exceeds the strided slack; this section "
            "needs the two-pass single-device path"
        )

    starts_local = np.zeros((n_dev, tiles_per_device), np.int32)
    starts_local[:, 1:] = np.cumsum(w_tiles_h, axis=1)[:, :-1]
    r_dev = int(w_tiles_h.sum(axis=1).max()) + params.w_cap

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None, None, None),
        check_vma=False,
    )
    def compact_fn(pay_s, starts_dev):
        rows = ils_compact(
            pay_s[0], starts_dev[0], stride_rows=stride_rows,
            w_cap=params.w_cap, total_rows=r_dev, interpret=interpret,
        )
        return rows[None]

    starts_dev = jnp.asarray(starts_local)
    payload_dev = jax.jit(compact_fn)(pay_s, starts_dev)
    return IlsShardedSection(payload_dev, starts_dev, params)


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
