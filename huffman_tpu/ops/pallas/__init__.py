from .decode_kernel import (
    decode_block_pallas,
    decode_blocks_pallas,
    decode_ranks_pallas,
)

__all__ = [
    "decode_block_pallas",
    "decode_blocks_pallas",
    "decode_ranks_pallas",
]
