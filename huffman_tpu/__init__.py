"""huffman_tpu — a TPU-native parallel Huffman codec framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the CUDA
reference (dek226/CSE375-FinalProj-Huffman-Decoding): canonical
length-limited Huffman coding with host-side package-merge table
construction, massively data-parallel encoding (prefix-sum bit offsets +
vectorized bit packing), and gap-array-assisted data-parallel decoding over
fixed-size segments — scaled from one TPU chip to a multi-host pod slice via
`jax.sharding` meshes.
"""

__version__ = "0.1.0"

from .core import (
    CodeTable,
    canonical_code_table,
    package_merge_lengths,
    huffman_lengths_unbounded,
    build_flat_lut,
    build_two_level_table,
)
from . import constants

__all__ = [
    "CodeTable",
    "canonical_code_table",
    "package_merge_lengths",
    "huffman_lengths_unbounded",
    "build_flat_lut",
    "build_two_level_table",
    "constants",
]
