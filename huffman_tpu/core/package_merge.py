"""Length-limited Huffman code construction (package-merge / coin collector).

Host-side table math, NumPy only.  This plays the role of the reference's two
C++ package-merge implementations: the coin-collector form in
`gpuhd/encoder/src/llhuffman_encoder.cc:52-157` and the boundary
package-merge in
`Huffman_coding_Gap_arrays/encoder/src/package_merge.cpp:104-182`.  The
algorithm here is the textbook coin-collector formulation (Larmore &
Hirschberg 1990), implemented with vectorized NumPy instead of linked node
chains; it produces optimal length-limited prefix codes, which is all that is
required for format parity (codeword *lengths* fully determine the canonical
code).
"""

from __future__ import annotations

import numpy as np

from ..constants import ALPHABET_SIZE, MAX_CODEWORD_LENGTH

__all__ = ["package_merge_lengths", "huffman_lengths_unbounded", "kraft_sum"]


def kraft_sum(lengths: np.ndarray) -> float:
    """Kraft sum of a length assignment (0 = absent symbol)."""
    ls = np.asarray(lengths)
    ls = ls[ls > 0].astype(np.float64)
    return float(np.sum(2.0 ** (-ls)))


def package_merge_lengths(
    freqs: np.ndarray, max_len: int = MAX_CODEWORD_LENGTH
) -> np.ndarray:
    """Optimal length-limited code lengths for a byte alphabet.

    Args:
      freqs: (256,) nonnegative symbol frequencies.
      max_len: maximum codeword length L.

    Returns:
      (256,) uint8 code lengths; 0 marks an absent symbol.
    """
    freqs = np.asarray(freqs, dtype=np.int64)
    if freqs.shape != (ALPHABET_SIZE,):
        raise ValueError(f"freqs must be shape (256,), got {freqs.shape}")
    if np.any(freqs < 0):
        raise ValueError("negative frequency")
    from .. import native

    if native.available():
        # C++ coin-collector (native/huffman_native.cpp), bit-identical to
        # the NumPy path below (tests/test_native.py enforces it).
        return native.package_merge_lengths(freqs, max_len)

    syms = np.nonzero(freqs)[0]
    k = len(syms)
    lengths = np.zeros(ALPHABET_SIZE, np.uint8)
    if k == 0:
        return lengths
    if k == 1:
        # Lone symbol still gets a 1-bit code, matching the reference's fake
        # second leaf (`sequential.cpp:129-135`).
        lengths[syms[0]] = 1
        return lengths
    if k > (1 << max_len):
        raise ValueError(f"{k} symbols cannot fit in max_len={max_len} bits")

    order = np.argsort(freqs[syms], kind="stable")
    sorted_syms = syms[order]
    w = freqs[sorted_syms]  # ascending leaf weights

    # Coin collector: start at the deepest level (denomination 2^-L) with the
    # leaf list; at each level package adjacent pairs and merge with the
    # leaves of the level above.  Each package carries a per-symbol leaf
    # count; after the level-1 merge, the first 2k-2 items' counts are the
    # code lengths.
    leaf_counts = np.eye(k, dtype=np.int32)
    pkg_w = w.copy()
    pkg_c = leaf_counts.copy()
    for _ in range(max_len - 1):
        p = len(pkg_w) & ~1
        merged_w = pkg_w[0:p:2] + pkg_w[1:p:2]
        merged_c = pkg_c[0:p:2] + pkg_c[1:p:2]
        all_w = np.concatenate([w, merged_w])
        all_c = np.concatenate([leaf_counts, merged_c], axis=0)
        o = np.argsort(all_w, kind="stable")
        pkg_w = all_w[o]
        pkg_c = all_c[o]

    take = 2 * k - 2
    lens_sorted = pkg_c[:take].sum(axis=0)
    if np.any(lens_sorted <= 0) or np.any(lens_sorted > max_len):
        raise AssertionError("package-merge produced an invalid length")
    lengths[sorted_syms] = lens_sorted.astype(np.uint8)
    return lengths


def huffman_lengths_unbounded(freqs: np.ndarray) -> np.ndarray:
    """Unbounded greedy Huffman code lengths (reference oracle semantics).

    Matches the depth profile of the reference's greedy tree
    (`sequential.cpp:123-144`): ties broken by heap order there, but the
    multiset of lengths of any optimal Huffman code is unique up to
    sibling-swaps with equal total cost, and only lengths matter for the
    canonical code.  Implemented as the classic two-queue O(k log k) build.
    """
    freqs = np.asarray(freqs, dtype=np.int64)
    syms = np.nonzero(freqs)[0]
    k = len(syms)
    lengths = np.zeros(ALPHABET_SIZE, np.uint8)
    if k == 0:
        return lengths
    if k == 1:
        lengths[syms[0]] = 1
        return lengths

    import heapq

    # heap items: (weight, tiebreak, node). Leaves are ints, internal = tuple.
    heap = [(int(freqs[s]), i, int(s)) for i, s in enumerate(syms)]
    heapq.heapify(heap)
    counter = k
    while len(heap) > 1:
        wa, _, a = heapq.heappop(heap)
        wb, _, b = heapq.heappop(heap)
        heapq.heappush(heap, (wa + wb, counter, (a, b)))
        counter += 1
    root = heap[0][2]

    stack = [(root, 0)]
    while stack:
        node, depth = stack.pop()
        if isinstance(node, tuple):
            stack.append((node[0], depth + 1))
            stack.append((node[1], depth + 1))
        else:
            lengths[node] = max(depth, 1)
    return lengths
