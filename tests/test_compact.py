"""Device ragged-concat (compaction) kernel tests.

The kernel is the TPU-native form of the reference's on-GPU ragged placement
(`Huffman_coding_Gap_arrays/decoder/src/decoder.cu:571-729`): the oracle here
is plain NumPy concatenation of each segment's first `count` bytes.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from huffman_tpu.ops import compact as compact_mod
from huffman_tpu.ops.compact import MAX_ROW_BYTES, compact_ranks_device


def _pack_case(n_segs, max_count, seed, zero_frac=0.1, min_count=0):
    """Random ragged segments -> (packed LSB-first ranks, counts, expect).

    The ranks kernel packs 4 ranks per int32 little-endian (stream order ==
    byte order), so the oracle packing is a plain LE byte view."""
    rng = np.random.default_rng(seed)
    counts = rng.integers(min_count, max_count + 1, n_segs)
    counts[rng.random(n_segs) < zero_frac] = 0
    segs = [rng.integers(0, 256, c).astype(np.uint8) for c in counts]
    ranks = np.concatenate(segs) if n_segs else np.zeros(0, np.uint8)
    out_rows = -(-max(max_count, 1) // 4)
    padded = np.zeros((n_segs, out_rows * 4), np.uint8)
    for s, seg in enumerate(segs):
        padded[s, : seg.size] = seg
    packed = padded.view("<u4").astype(np.uint32).T
    symtab = rng.permutation(256).astype(np.uint8)
    return packed.view(np.int32), counts, symtab, symtab[ranks]


@pytest.mark.parametrize("chunked", [False, True])
@pytest.mark.parametrize(
    "n_segs,max_count,seed",
    [(7, 16, 4), (40, 100, 1), (200, 256, 2), (640, MAX_ROW_BYTES, 3)],
)
def test_compact_matches_numpy_concat(n_segs, max_count, seed, chunked):
    # both placement kernels (banded per-tile and chunk-shared) must agree
    # with the NumPy ragged-concat oracle
    packed, counts, symtab, expect = _pack_case(n_segs, max_count, seed)
    out = compact_ranks_device(
        jnp.asarray(packed), counts, symtab, expect.size, chunked=chunked,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_compact_chunk_crossing(monkeypatch):
    # shrink the chunk so multiple kernel invocations + straddling segments
    # are exercised without interpret-mode cost
    monkeypatch.setattr(compact_mod, "CHUNK_OUT_BYTES", 1 << 14)
    packed, counts, symtab, expect = _pack_case(400, 300, seed=9)
    assert expect.size > 3 * (1 << 14)
    out = compact_ranks_device(
        jnp.asarray(packed), counts, symtab, expect.size, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_compact_all_empty_and_single():
    packed, counts, symtab, expect = _pack_case(16, 64, seed=11, zero_frac=1.0)
    assert expect.size == 0
    out = compact_ranks_device(
        jnp.asarray(packed), counts, symtab, 0, interpret=True
    )
    assert np.asarray(out).size == 0

    packed, counts, symtab, expect = _pack_case(1, 480, seed=12, zero_frac=0)
    out = compact_ranks_device(
        jnp.asarray(packed), counts, symtab, expect.size, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_compact_vmem_budget_shrinks_chunk(monkeypatch):
    # a dense run of tiny segments would overflow VMEM at the default chunk
    # size: the planner must halve the chunk until the segment window fits,
    # preserving bit-exact output (VERDICT r2 review: unbounded s_cap)
    monkeypatch.setattr(compact_mod, "CHUNK_OUT_BYTES", 1 << 14)
    monkeypatch.setattr(compact_mod, "_S_CAP_MAX", 320)
    # counts in [32, 96]: band <= ~136, so the 4 KiB-tile window fits 320,
    # but a 16 KiB chunk's ~650-segment window does not -> forces the halving
    packed, counts, symtab, expect = _pack_case(
        400, 96, seed=21, zero_frac=0, min_count=32
    )
    out = compact_ranks_device(
        jnp.asarray(packed), counts, symtab, expect.size, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_compact_vmem_infeasible_raises(monkeypatch):
    # even a single 4 KiB tile's band can exceed a (pathologically small)
    # budget: the call must fail loudly, never emit a kernel that cannot fit
    monkeypatch.setattr(compact_mod, "_S_CAP_MAX", 8)
    packed, counts, symtab, expect = _pack_case(400, 6, seed=22, zero_frac=0)
    with pytest.raises(ValueError, match="VMEM budget"):
        compact_ranks_device(
            jnp.asarray(packed), counts, symtab, expect.size, interpret=True
        )


def test_device_plan_matches_host_plan():
    """`compact_plan_arrays`/`compact_scalars` + `pick_chunk` (the device
    planning used when counts are born on device — self-sync, gap-only
    containers) must reproduce `plan_compact`'s arrays bit-for-bit."""
    from huffman_tpu.ops.compact import (
        compact_plan_arrays,
        compact_scalars,
        pick_chunk,
        plan_compact,
    )

    rng = np.random.default_rng(5)
    counts = rng.integers(0, 300, 5000).astype(np.int64)
    out_size = int(counts.sum())
    host = plan_compact(counts, out_size)

    scal = np.asarray(compact_scalars(jnp.asarray(counts.astype(np.int32)),
                                      out_size))
    band, s_cap, chunk = pick_chunk(scal)
    s = host.statics
    assert (band, s_cap, chunk) == (s.band, s.s_cap, s.chunk_bytes)
    bases, s0_rel, ngroups = compact_plan_arrays(
        jnp.asarray(counts.astype(np.int32)), statics=s
    )
    np.testing.assert_array_equal(np.asarray(bases), host.bases)
    np.testing.assert_array_equal(np.asarray(s0_rel), host.s0_rel)
    np.testing.assert_array_equal(np.asarray(ngroups), host.ngroups)


def test_compact_rejects_oversized_rows():
    packed, counts, symtab, expect = _pack_case(8, 64, seed=13)
    counts = counts.copy()
    counts[0] = MAX_ROW_BYTES + 1
    with pytest.raises(ValueError, match="MAX_ROW_BYTES|XLA path"):
        compact_ranks_device(
            jnp.asarray(packed), counts, symtab, int(counts.sum()),
            interpret=True,
        )
