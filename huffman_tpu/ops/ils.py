"""Device orchestration for the interleaved-stream (ILS) codec.

Encode = two kernel passes (schedule certification, then banded bit-pack)
plus a host-side row compaction; decode = ONE kernel dispatch whose int32
output *is* the original data (see `core/ils_ref.py` for the layout).  These
functions speak NumPy at the boundary — the byte<->u32 reinterpretation is a
zero-copy little-endian view on the host, so device code never touches a
sub-word gather.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..core.canonical import CodeTable
from ..core.ils_ref import (
    ILS_LANES,
    IlsParams,
    ils_schedule_numer,
)
from .pallas.ils_kernels import (
    IlsDecTabs,
    IlsEncTabs,
    ils_dec_tabs,
    ils_decode,
    ils_enc_tabs,
    ils_lengths_pass,
    ils_pack,
)

__all__ = [
    "IlsSection",
    "ils_encode_device",
    "ils_decode_device",
    "round_band",
    "round_cap",
]

_BAND_BUCKETS = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512)
_CAP_BUCKETS = (
    8, 16, 32, 64, 96, 128, 192, 256, 320, 384, 448, 512, 640, 768, 896,
    1024, 1280, 1536, 1792, 2048,
)

# VMEM row budget per tile: input/output block (k/4 rows) + payload scratch
# (w_cap rows) must fit comfortably inside the ~16 MB/core VMEM (4 KB/row).
VMEM_ROW_BUDGET = 2300


def pick_k(avg_bits: float, max_k: int = 16384) -> int:
    """Largest k (symbols per stream) whose tile fits the VMEM budget.

    Larger k amortizes per-stream padding (the ILS analog of gap-array
    metadata overhead) — worth it for short codes / low entropy.
    """
    best = 2048
    for k in (2048, 4096, 8192, 16384):
        if k > max_k:
            break
        w_est = round_cap(int(k * max(avg_bits, 1.0) / 32 * 1.25) + 8)
        if k // 4 + w_est <= VMEM_ROW_BUDGET:
            best = k
    return best


def round_band(span: int) -> int:
    for b in _BAND_BUCKETS:
        if span <= b:
            return b
    return span


def round_cap(rows: int) -> int:
    for b in _CAP_BUCKETS:
        if rows <= b:
            return b
    return -(-rows // 256) * 256


@dataclasses.dataclass
class IlsSection:
    """One uniform-k run of tiles plus its interleaved payload."""

    params: IlsParams
    payload: np.ndarray  # (total_rows, 1024) uint32

    @property
    def nbytes_payload(self) -> int:
        return int(self.payload.nbytes)


def _as_tiles_i32(data: np.ndarray, k: int) -> np.ndarray:
    """Flat bytes (multiple of k*1024) -> (n_tiles*k//4, 8, 128) int32."""
    u32 = data.view("<u4")
    return u32.view(np.int32).reshape(-1, 8, 128)


def ils_encode_device(
    data: np.ndarray,
    table: CodeTable,
    enc: IlsEncTabs,
    *,
    k: int,
    avg_bits: float,
    interpret: bool = False,
) -> IlsSection:
    """Encode flat bytes (size must be a multiple of k*1024) into one section.

    Two dispatches + one host sync.  Raises ValueError if the certified band
    cannot be honored (never happens: the pack pass uses the exact envelope
    measured by the schedule pass).
    """
    data = np.ascontiguousarray(data, np.uint8)
    if data.size % (k * ILS_LANES):
        raise ValueError("data size must be a multiple of k * 1024")
    n_tiles = data.size // (k * ILS_LANES)
    data_i32 = jnp.asarray(_as_tiles_i32(data, k))

    snum = ils_schedule_numer(avg_bits)
    params_a = jnp.asarray(np.array([snum, 0], np.int32))
    bits, dmin, dmax = ils_lengths_pass(
        data_i32, params_a, enc, k=k, interpret=interpret
    )
    bits = np.asarray(bits)
    dev_min = int(np.asarray(dmin).min())
    dev_max = int(np.asarray(dmax).max())

    w_tiles = np.maximum(-(-bits.max(axis=(1, 2)) // 32), 2).astype(np.int64)
    w_cap = round_cap(int(w_tiles.max()))
    w_band = min(round_band(dev_max - dev_min + 2), w_cap)
    boff = dev_min
    params = IlsParams(
        k=k,
        snum=snum,
        boff=boff,
        w_band=int(w_band),
        w_cap=int(w_cap),
        w_tiles=w_tiles.astype(np.int32),
        n_tiles=n_tiles,
    )

    params_b = jnp.asarray(np.array([snum, boff], np.int32))
    padded = ils_pack(
        data_i32, params_b, enc, k=k, w_cap=w_cap, w_band=w_band, interpret=interpret
    )
    padded = np.asarray(padded).reshape(n_tiles, w_cap, ILS_LANES)
    payload = np.concatenate(
        [padded[t, : int(w_tiles[t])] for t in range(n_tiles)], axis=0
    ).view(np.uint32)
    return IlsSection(params=params, payload=payload)


def ils_decode_device(
    section: IlsSection,
    table: CodeTable,
    dec: IlsDecTabs,
    *,
    interpret: bool = False,
) -> np.ndarray:
    """Decode one section back to flat bytes (n_tiles * k * 1024 of them)."""
    p = section.params
    rows = section.payload.view(np.int32).reshape(-1, 8, 128)
    slack = np.zeros((p.w_cap, 8, 128), np.int32)
    payload_rows = jnp.asarray(np.concatenate([rows, slack], axis=0))
    row_starts = jnp.asarray(p.row_starts[:-1].astype(np.int32))
    params = jnp.asarray(np.array([p.snum, p.boff], np.int32))
    out = ils_decode(
        payload_rows,
        row_starts,
        params,
        dec,
        k=p.k,
        w_cap=p.w_cap,
        w_band=p.w_band,
        max_len=max(table.max_len_present, 1),
        n_tiles=p.n_tiles,
        interpret=interpret,
    )
    return np.asarray(out).view(np.uint32).reshape(-1).view("<u4").view(np.uint8)
