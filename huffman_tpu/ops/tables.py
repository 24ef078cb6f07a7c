"""Device-side decode-table pytrees built from a host CodeTable.

Static configuration (LUT width, min/max code length) is kept OUT of the
pytrees — jit would trace pytree leaves — and carried in ``DecSpec``, which is
hashable and passed as a static argument.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.canonical import CodeTable, build_flat_lut

__all__ = [
    "DeviceEncTable",
    "DeviceDecTable",
    "DecSpec",
    "device_enc_table",
    "device_dec_table",
    "dec_spec",
]


class DeviceEncTable(NamedTuple):
    """Encoder-side table: per-symbol (code, length)."""

    codes: jnp.ndarray  # (256,) uint32 right-aligned canonical codes
    lengths: jnp.ndarray  # (256,) int32


class DeviceDecTable(NamedTuple):
    """Decoder-side tables (arrays only; static config lives in DecSpec).

    Carries both representations; kernels pick one:
    - flat LUT (``lut_sym``/``lut_len``, 2^lut_bits entries) — role of the
      reference's 2^11 LUT (`gpuhd/encoder/src/llhuffman_encoder.cc:240-262`);
    - canonical limit arithmetic (``lim_left``/``offsets``/``first_code``/
      ``symtab``) — code length via <=15 vector compares, symbol via one
      256-entry gather; this is the VPU-friendly form.
    """

    lut_sym: jnp.ndarray  # (2^lut_bits,) int32
    lut_len: jnp.ndarray  # (2^lut_bits,) int32
    lim_left: jnp.ndarray  # (max_len+1,) uint32
    offsets: jnp.ndarray  # (max_len+1,) int32
    first_code: jnp.ndarray  # (max_len+1,) uint32
    symtab: jnp.ndarray  # (256,) int32 (zero-padded past num_symbols)


@dataclasses.dataclass(frozen=True)
class DecSpec:
    """Hashable static decode configuration."""

    lut_bits: int
    max_len: int  # deepest occupied level
    min_len: int  # shallowest occupied level


def device_enc_table(table: CodeTable) -> DeviceEncTable:
    return DeviceEncTable(
        codes=jnp.asarray(table.codes, jnp.uint32),
        lengths=jnp.asarray(table.lengths.astype(np.int32)),
    )


def dec_spec(table: CodeTable, lut_bits: int | None = None) -> DecSpec:
    b = int(lut_bits if lut_bits is not None else max(table.max_len_present, 1))
    return DecSpec(
        lut_bits=b,
        max_len=max(table.max_len_present, 1),
        min_len=max(table.min_len, 1),
    )


def device_dec_table(table: CodeTable, lut_bits: int | None = None) -> DeviceDecTable:
    b = int(lut_bits if lut_bits is not None else max(table.max_len_present, 1))
    lut_sym, lut_len = build_flat_lut(table, b)
    symtab = np.zeros(256, np.int32)
    symtab[: table.num_symbols] = table.symtab
    return DeviceDecTable(
        lut_sym=jnp.asarray(lut_sym.astype(np.int32)),
        lut_len=jnp.asarray(lut_len.astype(np.int32)),
        lim_left=jnp.asarray(table.lim_left, jnp.uint32),
        offsets=jnp.asarray(table.offsets, jnp.int32),
        first_code=jnp.asarray(table.first_code, jnp.uint32),
        symtab=jnp.asarray(symtab),
    )
