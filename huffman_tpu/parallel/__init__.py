from .mesh import data_mesh, DATA_AXIS, Mesh, P
from .codec import (
    sharded_histogram,
    make_sharded_encode,
    make_sharded_decode,
    make_sharded_roundtrip,
)
from .ils import (
    shard_ils_payload,
    make_ils_sharded_decode,
    make_ils_sharded_roundtrip,
    ils_sharded_certified_encode,
    IlsShardedSection,
)

__all__ = [
    "ils_sharded_certified_encode",
    "IlsShardedSection",
    "data_mesh",
    "DATA_AXIS",
    "Mesh",
    "P",
    "sharded_histogram",
    "make_sharded_encode",
    "make_sharded_decode",
    "make_sharded_roundtrip",
    "shard_ils_payload",
    "make_ils_sharded_decode",
    "make_ils_sharded_roundtrip",
]
