"""Full-Pallas gap/HTC1 encode pipeline vs the XLA reference encode.

`encode_blocks_pallas` (row prepack + bit-granular banded placement +
slot metadata, `ops/pallas/gap_encode_kernel.py`) must be BIT-IDENTICAL to
`ops/encode.py::encode_block` — words, total_bits, gaps, counts — which is
itself pinned against the NumPy oracle elsewhere (tests/test_ops.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huffman_tpu.core import canonical_code_table, package_merge_lengths, npref
from huffman_tpu.ops import device_enc_table
from huffman_tpu.ops.encode import encode_block
from huffman_tpu.ops.pallas.ils_kernels import ils_enc_tabs
from huffman_tpu.ops.pallas.gap_encode_kernel import encode_blocks_pallas
from huffman_tpu.utils import generate_redundant


def _run(data, g, seg_bits=1024, max_len=16):
    n = data.size // g
    table = canonical_code_table(
        package_merge_lengths(npref.histogram(data), max_len), max_len
    )
    enc = device_enc_table(table)
    tabs = ils_enc_tabs(table)
    lens = table.lengths.astype(np.int64)
    max_bits = max(
        int(lens[data.reshape(g, n)[i]].sum()) for i in range(g)
    )
    max_words = -(-(-(-max_bits // 32)) // 512) * 512
    n_segs = -(-max_words * 32) // seg_bits
    blocks = jnp.asarray(data.reshape(g, n))
    ref = jax.vmap(
        lambda d: encode_block(
            d, enc, seg_bits=seg_bits, max_words=max_words, n_segs=n_segs
        )
    )(blocks)
    out = encode_blocks_pallas(
        blocks,
        tabs,
        seg_bits=seg_bits,
        max_words=max_words,
        n_segs=n_segs,
        min_len=max(int(table.min_len), 1),
        max_len=int(table.max_len_present),
        interpret=True,
    )
    for name, a, b in zip(("words", "total_bits", "gaps", "counts"), out, ref):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


@pytest.mark.parametrize("r", [0.1, 0.5, 0.9])
def test_bit_identical_entropies(r):
    _run(generate_redundant(8192, r, seed=31), g=1)


def test_bit_identical_multiblock():
    _run(generate_redundant(3 * 4096, 0.5, seed=32), g=3)


def test_bit_identical_single_symbol():
    _run(np.full(4096, 7, np.uint8), g=1)


def test_bit_identical_ref_seg_bits():
    # the reference's 128-bit segments drive the 18-slot metadata form
    _run(generate_redundant(4096, 0.6, seed=33), g=1, seg_bits=128)


def test_bit_identical_short_codes():
    _run(generate_redundant(4096, 0.7, seed=34), g=1, max_len=8)


def test_codec_encode_device_uses_kernel_path():
    # end-to-end: GapArrayCodec.encode_device -> container path roundtrip
    from huffman_tpu.models import GapArrayCodec

    data = generate_redundant(12288, 0.5, seed=35)
    codec = GapArrayCodec.fit(data, block_bytes=4096)
    comp = codec.encode(data)
    assert np.array_equal(codec.decode(comp), data)
    dcomp = codec.encode_device(jnp.asarray(data.reshape(3, 4096)))
    out = codec.decode_device(dcomp)
    assert np.array_equal(np.asarray(out).reshape(-1), data)
