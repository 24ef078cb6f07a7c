from .tables import (
    DeviceEncTable,
    DeviceDecTable,
    DecSpec,
    device_enc_table,
    device_dec_table,
    dec_spec,
)
from .encode import encode_block, histogram
from .decode import decode_block, count_segments
from .bitops import extract_window32
from .ils import (
    IlsSection,
    ils_decode_device,
    ils_encode_device,
    ils_encode_to_device,
    pick_k,
)

__all__ = [
    "DeviceEncTable",
    "DeviceDecTable",
    "DecSpec",
    "device_enc_table",
    "device_dec_table",
    "dec_spec",
    "encode_block",
    "histogram",
    "decode_block",
    "count_segments",
    "extract_window32",
    "IlsSection",
    "ils_decode_device",
    "ils_encode_device",
    "ils_encode_to_device",
    "pick_k",
]
