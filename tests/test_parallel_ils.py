"""Sharded ILS path on the virtual 8-device CPU mesh (SURVEY §4: multi-host
logic testable with xla_force_host_platform_device_count)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from huffman_tpu.core import canonical_code_table, package_merge_lengths, npref
from huffman_tpu.core.ils_ref import ILS_LANES
from huffman_tpu.models import IlsCodec
from huffman_tpu.ops.ils import _as_tiles_i32
from huffman_tpu.ops.pallas.ils_kernels import ils_dec_tabs, ils_enc_tabs
from huffman_tpu.parallel import (
    data_mesh,
    make_ils_sharded_decode,
    make_ils_sharded_roundtrip,
    shard_ils_payload,
)
from huffman_tpu.utils import generate_redundant


def _fit(data):
    return canonical_code_table(
        package_merge_lengths(npref.histogram(data), 16), 16
    )


@pytest.mark.parametrize("n_devices", [2, 8])
def test_ils_sharded_roundtrip(n_devices):
    mesh = data_mesh(n_devices)
    k, tpd = 8, 2  # tiles per device
    n = n_devices * tpd * k * ILS_LANES
    data = generate_redundant(n, 0.5, seed=7)
    table = _fit(data)
    enc, dec = ils_enc_tabs(table), ils_dec_tabs(table)
    step = make_ils_sharded_roundtrip(
        mesh, k=k, max_len=max(table.max_len_present, 1),
        tiles_per_device=tpd, interpret=True,
    )
    data_dev = jnp.asarray(
        _as_tiles_i32(data, k).reshape(n_devices, tpd * (k // 4), 8, 128)
    )
    out, ok = step(data_dev, enc, dec)
    assert int(ok) == 1
    got = np.asarray(out).reshape(-1, 8, 128).view(np.uint32).reshape(-1)
    assert np.array_equal(got.view(np.uint8), data)


def test_ils_sharded_decode_matches_codec():
    n_devices, k, tpd = 4, 8, 3
    mesh = data_mesh(n_devices)
    n = n_devices * tpd * k * ILS_LANES
    data = generate_redundant(n, 0.7, seed=8)
    codec = IlsCodec.fit(data, k=k, interpret=True)
    comp = codec.encode(data)
    (sec,) = comp.sections
    p = sec.params

    payload_dev, starts_dev = shard_ils_payload(
        sec.payload, p.row_starts, p.w_cap, n_devices
    )
    dec_fn = make_ils_sharded_decode(
        mesh,
        k=p.k,
        w_cap=p.w_cap,
        w_band=p.w_band,
        max_len=max(codec.table.max_len_present, 1),
        tiles_per_device=tpd,
        rot=p.rot,  # follow the container's per-section rotation decision
        interpret=True,
    )
    params = jnp.asarray(np.array([p.snum, 0], np.int32))
    tpd_ = p.n_tiles // n_devices
    boffs_dev = jnp.asarray(p.boffs.reshape(n_devices, tpd_, -1))
    out = dec_fn(
        jnp.asarray(payload_dev), jnp.asarray(starts_dev), params, boffs_dev,
        codec.dec,
    )
    got = np.asarray(out).reshape(-1, 8, 128).view(np.uint32).reshape(-1)
    assert np.array_equal(got.view(np.uint8), data)


def test_shard_payload_rejects_indivisible():
    with pytest.raises(ValueError):
        shard_ils_payload(
            np.zeros((4, ILS_LANES), np.uint32), np.array([0, 2, 4]), 8, 4
        )


@pytest.mark.parametrize("rot", [False, True])
def test_ils_sharded_certified_pipeline(rot):
    """The PRODUCTION configuration end-to-end over the mesh (VERDICT r3
    item 3): fused certify+pack per device, global host certification,
    per-device compaction, CERTIFIED-band sharded decode, bit-exact.
    Heterogeneous content (zeros next to random) forces real per-window
    band anchors rather than the trivial all-zero schedule."""
    from huffman_tpu.parallel import ils_sharded_certified_encode

    n_devices, k, tpd = 4, 64, 2
    mesh = data_mesh(n_devices)
    n = n_devices * tpd * k * ILS_LANES
    rng = np.random.default_rng(17)
    data = np.concatenate([
        np.zeros(n // 4, np.uint8),
        rng.integers(0, 256, n // 2).astype(np.uint8),
        np.full(n - n // 4 - n // 2, 65, np.uint8),
    ])
    table = _fit(data)
    enc, dec = ils_enc_tabs(table), ils_dec_tabs(table)
    avg_bits = float(
        (npref.histogram(data) * table.lengths.astype(np.int64)).sum()
    ) / max(data.size, 1)

    data_dev = jnp.asarray(
        _as_tiles_i32(data, k).reshape(n_devices, tpd * (k // 4), 8, 128)
    )
    sec = ils_sharded_certified_encode(
        mesh, data_dev, enc, k=k, max_len=max(table.max_len_present, 1),
        avg_bits=avg_bits, tiles_per_device=tpd, rot=rot, interpret=True,
    )
    p = sec.params
    assert p.w_band <= p.w_cap // 2  # genuinely banded, not full-band

    from huffman_tpu.core.canonical import chain_spec
    from huffman_tpu.core.ils_ref import ils_n_win

    dec_fn = make_ils_sharded_decode(
        mesh, k=k, w_cap=p.w_cap, w_band=p.w_band,
        max_len=max(table.max_len_present, 1),
        min_len=max(table.min_len, 1), tiles_per_device=tpd,
        rot=rot, chain=chain_spec(table), interpret=True,
    )
    params_j = jnp.asarray(np.array([p.snum, 0], np.int32))
    boffs_dev = jnp.asarray(
        p.boffs.reshape(n_devices, tpd, ils_n_win(k))
    )
    out = dec_fn(sec.payload_dev, sec.starts_dev, params_j, boffs_dev, dec)
    got = np.asarray(out).reshape(-1, 8, 128).view(np.uint32).reshape(-1)
    assert np.array_equal(got.view(np.uint8), data)


def test_streamed_sections_decode_on_mesh(tmp_path):
    """Section-streamed container + multi-device decode compose (VERDICT r5
    item 5's mesh-functional half): a file streamed to disk in bounded
    sections, then each full section decoded over the 8-device mesh with
    bounded host memory — the big-stream orchestration a 16 GB multi-host
    run would use, proven at test scale."""
    from huffman_tpu.core.canonical import chain_spec
    from huffman_tpu.core.ils_ref import ils_n_win
    from huffman_tpu.io.container import IlsStreamReader

    n_devices, k = 8, 8
    mesh = data_mesh(n_devices)
    tile_bytes = k * ILS_LANES
    section_bytes = n_devices * 2 * tile_bytes  # 16 tiles/section
    n = 3 * section_bytes + 5000  # 3 full sections + a padded tail
    data = generate_redundant(n, 0.5, seed=51)
    src = tmp_path / "src.bin"
    data.tofile(src)

    codec = IlsCodec.fit_file(str(src), k=k, interpret=True)
    cpath = tmp_path / "out.ils"
    codec.encode_file(str(src), str(cpath), section_bytes=section_bytes)

    out = np.zeros(0, np.uint8)
    with open(cpath, "rb") as f:
        reader = IlsStreamReader(f)
        dec = ils_dec_tabs(reader.table)
        while True:
            sec = reader.read_section()
            if sec is None:
                break
            p = sec.params
            if p.n_tiles % n_devices == 0 and p.n_tiles >= n_devices:
                payload_dev, starts_dev = shard_ils_payload(
                    sec.payload, p.row_starts, p.w_cap, n_devices
                )
                dec_fn = make_ils_sharded_decode(
                    mesh, k=p.k, w_cap=p.w_cap, w_band=p.w_band,
                    max_len=max(reader.table.max_len_present, 1),
                    min_len=max(reader.table.min_len, 1),
                    tiles_per_device=p.n_tiles // n_devices, rot=p.rot,
                    chain=chain_spec(reader.table), interpret=True,
                )
                got = dec_fn(
                    jnp.asarray(payload_dev), jnp.asarray(starts_dev),
                    jnp.asarray(np.array([p.snum, 0], np.int32)),
                    jnp.asarray(p.boffs.reshape(n_devices, -1, ils_n_win(p.k))),
                    dec,
                )
                piece = (
                    np.asarray(got).reshape(-1, 8, 128).view(np.uint32)
                    .reshape(-1).view(np.uint8)
                )
            else:  # tail section: single-device decode
                from huffman_tpu.ops.ils import ils_decode_device

                piece = np.asarray(
                    ils_decode_device(
                        sec, reader.table, dec, interpret=True
                    )
                )
            out = np.concatenate([out, piece])
        reader.close()
    assert np.array_equal(out[:n], data)
