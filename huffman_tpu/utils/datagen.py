"""Synthetic test-data generators.

Ports the *semantics* of the reference's generators:
- `generate.cpp:36-53`: each byte is one of 'A'..'D' with probability
  ``redundancy``, else uniform over 0..255.
- `gpuhd/src/demo.cc:68-77`: binomially distributed bytes (n=255, p=0.5),
  which concentrates mass near 128 and exercises skewed code lengths.
"""

from __future__ import annotations

import numpy as np

__all__ = ["generate_redundant", "generate_binomial", "generate_single_symbol"]


def generate_redundant(
    size: int, redundancy: float, seed: int | None = 0
) -> np.ndarray:
    """generate.cpp-style data: low-entropy A-D mixed with uniform bytes.

    Generated in bounded chunks: the naive vectorized form holds ~40 bytes
    of float64/int64 temporaries per output byte, which is ~160 GB of RAM
    at a 4 GB output."""
    redundancy = float(min(max(redundancy, 0.0), 1.0))
    rng = np.random.default_rng(seed)
    out = np.empty(size, np.uint8)
    chunk = 1 << 26
    for off in range(0, size, chunk):
        n = min(chunk, size - off)
        r = rng.random(n)
        low = ord("A") + rng.integers(0, 4, size=n, dtype=np.uint8)
        full = rng.integers(0, 256, size=n, dtype=np.uint8)
        out[off : off + n] = np.where(r < redundancy, low, full)
    return out


def generate_binomial(size: int, seed: int | None = 0) -> np.ndarray:
    """CUHD-demo-style binomial(255, 0.5) bytes."""
    rng = np.random.default_rng(seed)
    return rng.binomial(255, 0.5, size=size).astype(np.uint8)


def generate_single_symbol(size: int, symbol: int = 65) -> np.ndarray:
    return np.full(size, symbol, np.uint8)
