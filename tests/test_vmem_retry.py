import numpy as np
from huffman_tpu.models import IlsCodec
from huffman_tpu.core.ils_ref import ILS_LANES

def test_vmem_retry_on_pathological_stream():
    # mean length tiny (mostly one symbol) but ONE stream is all rare bytes:
    # per-stream max words far exceeds the mean-based estimate at k=8192
    k = 8192
    n = k * ILS_LANES
    data = np.zeros(n, np.uint8)
    rare = np.arange(1, 256, dtype=np.uint8)
    data[::37] = rare[np.arange((n + 36) // 37) % 255]  # keep mean low-ish
    # stream 5 (u32 words w % 1024 == 5) gets all-rare bytes -> max len codes
    u32_idx = np.arange(5, n // 4, ILS_LANES)
    byte_idx = (u32_idx[:, None] * 4 + np.arange(4)[None]).reshape(-1)
    data[byte_idx] = rare[np.arange(byte_idx.size) % 255]
    codec = IlsCodec.fit(data, k=k, interpret=True)
    comp = codec.encode(data)  # must retry with smaller k, not crash
    assert np.array_equal(codec.decode(comp), data)
    assert all(s.params.k <= k for s in comp.sections)
