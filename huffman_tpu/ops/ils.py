"""Device orchestration for the interleaved-stream (ILS) codec.

Encode = ONE fused certify+pack pass plus a DMA compaction (falling back
to two passes — schedule certification, then banded bit-pack — for
pathological schedules or oversized worst-case strides); decode = ONE
kernel dispatch whose int32 output *is* the original data (see
`core/ils_ref.py` for the layout).  These functions speak NumPy at the
boundary — the byte<->u32 reinterpretation is a zero-copy little-endian
view on the host, so device code never touches a sub-word gather.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..core.canonical import CodeTable, chain_spec
from ..core.ils_ref import (
    ILS_LANES,
    IlsParams,
    ils_schedule_numer,
)
from .pallas.ils_kernels import (
    CHUNK_I,
    FUSED_E_BAND,
    IlsDecTabs,
    IlsEncTabs,
    ils_compact,
    ils_dec_tabs,
    ils_decode,
    ils_enc_tabs,
    ils_lengths_pass,
    ils_pack,
    ils_pack_certify,
    ils_pack_certify_stream,
    ils_stream_span_rows,
)

__all__ = [
    "IlsSection",
    "IlsVmemError",
    "certify_params",
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

# VMEM row budget per tile: the kernels chunk the data/output blocks over a
# second grid dimension (CHUNK_I rows, double-buffered ~8 MB) and keep the
# whole-tile payload in single-buffered scratch (w_cap rows, 4 KB each,
# DMA'd to/from HBM), so w_cap alone must fit the remaining ~11.5 MB.
VMEM_ROW_BUDGET = 2800

# smallest k the retry path falls back to (a 2048-symbol stream is at most
# 1024 words, always within budget)
MIN_K = 2048

# fused certify+pack writes at worst-case tile stride; the stride must fit
# the pack scratch alongside the data chunks (see VMEM_ROW_BUDGET).  Beyond
# it the certified two-pass pipeline takes over.
FUSED_STRIDE_BUDGET = 2048

# Measured decision (v5e, 64 MB r=0.9 k=16384, same-process interleaved
# A/B): the certified two-pass encode runs 28.5 GB/s vs 22.4 for the
# streaming one-pass — the streaming pack must provision its emission band
# for worst-case drift (e_band = 64 at k=16384) while the two-pass pack
# gets the exact measured envelope (w_band_enc ~= 48), and the banded RMW
# write scales with the band.  Same container bytes either way (identical
# schedule + envelopes), so two-pass is the big-k default; the streaming
# kernel remains available here and stays A/B'd by bench.py.
PREFER_STREAM_PACK = False

# bodies per grid chunk for the streaming pack (tests shrink this to
# exercise the sliding window at small k)
_STREAM_CHUNK_CAP = CHUNK_I

def fused_e_band(k: int) -> int:
    """Emission-band width for the fused certify+pack passes.

    With laggard-anchored emission windows the band only has to cover the
    CROSS-LANE emission spread (common-mode drift is followed, not
    predicted), which grows ~sqrt(k) like the decode band; the k=4096
    anchor of 32 pairs is measured (BASELINE.md).  Wider bands slow the
    banded RMW write (~60% of pack cost scales with it), so the scale stays
    as tight as the spread allows — the violation flag still catches any
    pathological section and falls back to the exact two-pass path."""
    return max(FUSED_E_BAND, round_band(int(32 * (k / 4096) ** 0.5)))


def auto_rot_band(k: int) -> int:
    """rot="auto": bands at or under this many pairs never re-encode with
    rotation — the rotation rolls cost ~10-15% of decode and ~27% of pack
    on v5e, which one band bucket of narrowing does not repay.  Wider bands
    mean lane-correlated content (measured at k=4096: a 64 MB tarball
    certifies w_band=96 unrotated but 32 rotated, decoding 25 vs 40 GB/s),
    so the encoder retries rotated and keeps whichever band is strictly
    narrower.  The schedule deviation of lane-UNcorrelated content grows
    ~sqrt(k) (a random walk over the stream), so the suspicion threshold
    scales the same way from the measured k=4096 anchor of 32 pairs."""
    return max(round_band(int(32 * (k / 4096) ** 0.5)), 8)


class IlsVmemError(ValueError):
    """Tile shape would exceed the VMEM budget; retry with a smaller k."""


def pick_k(avg_bits: float, optimize: str = "speed") -> int:
    """Choose k (symbols per stream) for the table's mean code length.

    Larger k amortizes per-stream padding (ratio improves ~1/sqrt(k)) but
    widens the refill band (~sqrt(k)), slowing decode.  ``optimize="speed"``
    caps k at 4096 (band stays narrow); ``optimize="ratio"`` uses the
    largest k whose payload scratch fits VMEM.
    """
    max_k = 4096 if optimize == "speed" else 16384
    best = 2048
    for k in (2048, 4096, 8192, 16384):
        if k > max_k:
            break
        w_est = round_cap(int(k * max(avg_bits, 1.0) / 32 * 1.10) + 8)
        if w_est <= VMEM_ROW_BUDGET:
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


def certify_params(
    *,
    k: int,
    snum: int,
    n_tiles: int,
    w_tiles: np.ndarray,
    dec_min: np.ndarray,
    dec_max: np.ndarray,
    extra_band_pairs: int = 0,
    rot: bool = False,
) -> IlsParams:
    """Turn measured schedule envelopes into certified container params.

    The refill/emission window ``[base, base + band)`` must fit the tile's
    pair capacity (kernel scratch bound: ``band <= w_cap // 2``).  When the
    measured envelope needs more, the cap is WIDENED — the extra rows are
    pure zero slack — rather than the band silently narrowed below the
    envelope, which would corrupt the stream with no error (the container
    invariant `core/ils_ref.py::ils_decode_np` enforces).  Raises
    ``IlsVmemError`` when even the widened cap exceeds the VMEM budget (the
    codec retries with a smaller k).
    """
    w_cap = round_cap(int(w_tiles.max()))
    dec_span = int(np.maximum(dec_max - dec_min, 0).max(initial=0))
    w_band = round_band(dec_span + 2)  # in pairs
    need_cap = 2 * max(w_band, extra_band_pairs)
    if need_cap > w_cap:
        w_cap = round_cap(need_cap)
    if w_cap > VMEM_ROW_BUDGET and k > MIN_K:
        # at MIN_K the real budget always fits: k=2048 bounds both the
        # storage rows (2*ceil(2048*16/64) = 1024) and the widened band cap
        # (round_cap(2*round_band(span+2)) <= 1280) well under the budget
        raise IlsVmemError(
            f"k={k} with w_cap={w_cap} exceeds the VMEM row budget; "
            "re-encode with a smaller k"
        )
    assert w_band <= w_cap // 2  # guaranteed by the widening above
    boffs = np.where(dec_min <= dec_max, dec_min, 0).astype(np.int32)
    return IlsParams(
        k=k, snum=snum, boffs=boffs, w_band=int(w_band),
        w_cap=int(w_cap), w_tiles=w_tiles.astype(np.int32),
        n_tiles=n_tiles, rot=rot,
    )


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


def ils_encode_to_device(
    data_i32,
    enc: IlsEncTabs,
    *,
    k: int,
    avg_bits: float,
    max_len: int | None = None,
    rot: bool | str = False,
    interpret: bool = False,
):
    """Device-resident encode: returns (payload_rows, row_starts_dev, params).

    payload_rows stays on device (compacted, with w_cap slack rows); only
    small per-tile metadata syncs to host.  D2H traffic is O(n_tiles), not
    O(payload) — essential when the host link is slow.

    Fast path: ONE fused certify+pack pass over the data at worst-case tile
    stride, then a DMA compaction (`ils_pack_certify` + `ils_compact`).
    Falls back to the two-pass path (schedule pass, then banded pack) when
    the worst-case stride exceeds VMEM or when any tile's emissions leave
    the fused path's estimated band (flagged exactly; see FUSED_E_BAND).

    ``rot="auto"`` (the library default) chooses the lane-decorrelation
    rotation per section from the measured schedule envelope: encode
    unrotated first; if the certified band exceeds ``auto_rot_band(k)``
    (the signature of lane-correlated content), re-encode rotated and keep
    whichever band is strictly narrower.  Homogeneous data pays no rotation
    tax; periodic real files get the 96->32 band narrowing that rotation
    exists for (`core/ils_ref.py::ILS_ROT_SUB`).
    """
    if rot == "auto":
        res_plain = ils_encode_to_device(
            data_i32, enc, k=k, avg_bits=avg_bits, max_len=max_len,
            rot=False, interpret=interpret,
        )
        if res_plain[2].w_band <= auto_rot_band(k):
            return res_plain
        res_rot = ils_encode_to_device(
            data_i32, enc, k=k, avg_bits=avg_bits, max_len=max_len,
            rot=True, interpret=interpret,
        )
        return res_rot if res_rot[2].w_band < res_plain[2].w_band else res_plain

    n_tiles = data_i32.shape[0] // (k // 4)
    snum = ils_schedule_numer(avg_bits)
    params_j = jnp.asarray(np.array([snum, 0], np.int32))

    def finish(bits_dev, dn_dev, dx_dev, extra_band_pairs=0):
        # even word counts (pair granularity), >= 4 for the 128-bit
        # register init.  dn/dx are per-(tile, ILS_WIN window) envelopes
        # (n_tiles, n_win, 8, 128); lanes reduce on device.
        w_tiles = np.asarray(
            jnp.maximum(2 * (-(-jnp.max(bits_dev, axis=(1, 2)) // 64)), 4)
        ).astype(np.int64)
        dec_min = np.asarray(jnp.min(dn_dev, axis=(2, 3)))  # (n_tiles, n_win)
        dec_max = np.asarray(jnp.max(dx_dev, axis=(2, 3)))
        return certify_params(
            k=k, snum=snum, n_tiles=n_tiles, w_tiles=w_tiles,
            dec_min=dec_min, dec_max=dec_max,
            extra_band_pairs=extra_band_pairs, rot=rot,
        )

    if max_len is None:
        # worst-case codeword length from the device tables (costs two
        # small D2H syncs; callers that hold the CodeTable pass it in)
        max_len = int(
            max(int(np.asarray(enc.lo).max()), int(np.asarray(enc.hi).max()))
        ) >> 20
    stride_rows = max(2 * (-(-k * max_len // 64)), 4)
    fused = None
    if stride_rows < 8:
        # the compact gate below (w_cap <= 2 * stride_rows) can never pass:
        # the certified cap is at least round_cap(2 * round_band(...)) = 16,
        # so the fused pack would run only to be discarded.  Tiny tail
        # sections (k_tail * max_len < 256 bits) go straight to two-pass.
        pass
    elif stride_rows <= FUSED_STRIDE_BUDGET:
        fused = ils_pack_certify
    elif PREFER_STREAM_PACK:
        # worst-case stride exceeds the pack scratch (k=8192/16384 ratio
        # mode): the streaming variant holds only the live emission span
        # in VMEM and ships fixed-size windows per chunk.  Measured SLOWER
        # than the two-pass pipeline on v5e (see PREFER_STREAM_PACK), so
        # this is opt-in; correctness is pinned by tests either way.
        span = ils_stream_span_rows(
            k, stride_rows, fused_e_band(k), chunk_cap=_STREAM_CHUNK_CAP
        )
        if span is not None and span <= FUSED_STRIDE_BUDGET:
            fused = functools.partial(
                ils_pack_certify_stream, chunk_cap=_STREAM_CHUNK_CAP
            )
    if fused is not None:
        # tiered window anchoring: "mu" (scalar base, fastest) first; a
        # violation there usually means common-mode schedule drift through
        # heterogeneous content, which the "laggard" anchor (cross-lane
        # min; ~25% slower pack, measured) absorbs — only genuine
        # cross-lane spread can violate it, and that falls to two-pass.
        for anchor in ("mu", "laggard"):
            pay_s, bits, dn, dx, viol = fused(
                data_i32, params_j, enc, k=k, stride_rows=stride_rows,
                e_band=fused_e_band(k), rot=rot, anchor=anchor,
                interpret=interpret,
            )
            if int(jnp.max(viol)):
                continue
            params = finish(bits, dn, dx)
            # ils_compact over-reads w_cap rows per tile from the strided
            # region; the last tile's over-read must stay inside the
            # trailing stride_rows of slack.  An envelope-widened w_cap can
            # (pathologically) exceed that — use the two-pass path then,
            # whose buffers size themselves to w_cap (anchor-independent,
            # so no point retrying the other anchor).
            if params.w_cap > 2 * stride_rows:
                break
            row_starts_dev = jnp.asarray(
                params.row_starts[:-1].astype(np.int32)
            )
            payload_rows = ils_compact(
                pay_s, row_starts_dev, stride_rows=stride_rows,
                w_cap=params.w_cap, total_rows=params.total_rows,
                interpret=interpret,
            )
            return payload_rows, row_starts_dev, params
        # out-of-band emission at both anchors or oversized widened cap:
        # certify first

    bits, dec_min, dec_max, enc_min, enc_max = ils_lengths_pass(
        data_i32, params_j, enc, k=k, rot=rot, interpret=interpret
    )
    enc_min = np.asarray(jnp.min(enc_min, axis=(2, 3)))  # (n_tiles, n_win)
    enc_max = np.asarray(jnp.max(enc_max, axis=(2, 3)))
    enc_span = int(np.maximum(enc_max - enc_min, 0).max(initial=0))
    w_band_enc = round_band(enc_span + 2)
    # the emission window needs w_band_enc <= w_cap // 2 as well; let finish
    # widen the cap for whichever envelope is larger
    params = finish(bits, dec_min, dec_max, extra_band_pairs=w_band_enc)
    boffs_enc = np.where(enc_min <= enc_max, enc_min, 0).astype(np.int32)

    row_starts_dev = jnp.asarray(params.row_starts[:-1].astype(np.int32))
    payload_rows = ils_pack(
        data_i32, params_j, jnp.asarray(boffs_enc), row_starts_dev, enc,
        k=k, w_cap=params.w_cap, w_band=w_band_enc,
        total_rows=params.total_rows, rot=rot, interpret=interpret,
    )
    return payload_rows, row_starts_dev, params


def ils_encode_device(
    data: np.ndarray,
    table: CodeTable,
    enc: IlsEncTabs,
    *,
    k: int,
    avg_bits: float,
    rot: bool | str = False,
    interpret: bool = False,
) -> IlsSection:
    """Encode flat bytes (size must be a multiple of k*1024) into one section.

    The fused fast path packs against an ESTIMATED emission band and falls
    back to the two-pass pipeline whenever its violation flag fires (the
    two-pass pack uses the exact envelope measured by the schedule pass),
    so the certified band in the container always holds."""
    data = np.ascontiguousarray(data, np.uint8)
    if data.size % (k * ILS_LANES):
        raise ValueError("data size must be a multiple of k * 1024")
    data_i32 = jnp.asarray(_as_tiles_i32(data, k))
    payload_rows, _, params = ils_encode_to_device(
        data_i32, enc, k=k, avg_bits=avg_bits,
        max_len=int(table.max_len_present), rot=rot, interpret=interpret,
    )
    payload = (
        np.asarray(payload_rows[: params.total_rows])
        .reshape(params.total_rows, ILS_LANES)
        .view(np.uint32)
    )
    return IlsSection(params=params, payload=payload)


def ils_decode_device(
    section: IlsSection,
    table: CodeTable,
    dec: IlsDecTabs,
    *,
    probe: bool | None = None,
    interpret: bool = False,
) -> np.ndarray:
    """Decode one section back to flat bytes (n_tiles * k * 1024 of them).

    ``probe`` opts into the 256-entry LUT-probe symbol step.  Measured OFF
    by default at every max_len (v5e, interleaved A/B: 10.9 vs 86.4 GB/s at
    max_len=8, 10.5 vs 47.1 at max_len=16): the probe derives the code
    LENGTH from a cross-lane permute, putting the permute's latency on the
    serial window-update chain, while the canonical compare chain computes
    the length in cheap register ALU and keeps all permutes (symbol lookup)
    off the critical path.  See docs/PERF.md §2."""
    p = section.params
    if probe is None:
        probe = False
    if not (1 <= p.w_band <= p.w_cap // 2):
        # our encoder guarantees this (finish() widens w_cap); a foreign or
        # corrupted container must not drive the kernel out of its scratch
        raise ValueError(
            f"invalid ILS section: w_band={p.w_band} outside "
            f"[1, w_cap//2={p.w_cap // 2}]"
        )
    rows = section.payload.view(np.int32).reshape(-1, 8, 128)
    slack = np.zeros((p.w_cap, 8, 128), np.int32)
    payload_rows = jnp.asarray(np.concatenate([rows, slack], axis=0))
    row_starts = jnp.asarray(p.row_starts[:-1].astype(np.int32))
    params = jnp.asarray(np.array([p.snum, 0], np.int32))
    out = ils_decode(
        payload_rows,
        row_starts,
        params,
        jnp.asarray(p.boffs, jnp.int32),
        dec,
        k=p.k,
        w_cap=p.w_cap,
        w_band=p.w_band,
        max_len=max(table.max_len_present, 1),
        min_len=max(table.min_len, 1),
        n_tiles=p.n_tiles,
        rot=p.rot,
        probe=probe,
        chain=chain_spec(table),
        interpret=interpret,
    )
    return np.asarray(out).view(np.uint32).reshape(-1).view("<u4").view(np.uint8)
