from .package_merge import (
    package_merge_lengths,
    huffman_lengths_unbounded,
    kraft_sum,
)
from .canonical import (
    CodeTable,
    canonical_code_table,
    build_flat_lut,
    build_two_level_table,
    TwoLevelTable,
)
from . import npref

__all__ = [
    "package_merge_lengths",
    "huffman_lengths_unbounded",
    "kraft_sum",
    "CodeTable",
    "canonical_code_table",
    "build_flat_lut",
    "build_two_level_table",
    "TwoLevelTable",
    "npref",
]
