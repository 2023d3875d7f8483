"""Cross-type JSON collation ordering.

The reference orders mixed-type JSON values with a total collation
``null < false < true < number < string < array < object``
(``/root/reference/src/json_value.rs:113-123``), arrays element-wise
then by length (``:67-85``), objects by sorted key/value pairs then by
length (``:87-111``) — pinned by ``repl-tests/collation.noise``.

Spark columns are monotyped, so the rebuild carries a dynamic value as
JSON text and sorts it via :func:`collation_key`: an ORDER-PRESERVING
byte encoding (FoundationDB-tuple style) computed in one Arrow-batched
``pandas_udf``. Unsigned lexicographic comparison of the encoded bytes
(Spark's ``BinaryType`` ordering) equals the reference's collation:

- type tag byte: ``\\x01`` null … ``\\x07`` object (the collation rank)
- number: IEEE-754 big-endian with the sign-flip trick (negative →
  all bits inverted, non-negative → sign bit set) — total order on f64
- string: UTF-8 (code-point order) with ``\\x00`` escaped as
  ``\\x00\\xff``, terminated ``\\x00\\x00`` — prefix-free, so a prefix
  string sorts first
- array/object: concatenated element (or sorted key,value pair)
  encodings terminated by ``\\x00`` — element-wise compare, then length
"""

from __future__ import annotations

import json
import struct

__all__ = ["encode_value", "collation_key"]


def _enc_num(x: float) -> bytes:
    bits = struct.unpack(">Q", struct.pack(">d", float(x)))[0]
    if bits & (1 << 63):
        bits = ~bits & 0xFFFFFFFFFFFFFFFF  # negative: invert everything
    else:
        bits |= 1 << 63  # non-negative: set sign bit above all negatives
    return bits.to_bytes(8, "big")


def _enc_str(s: str) -> bytes:
    return s.encode("utf-8").replace(b"\x00", b"\x00\xff") + b"\x00\x00"


def encode_value(v) -> bytes:
    """Order-preserving encoding of one parsed JSON value."""
    if v is None:
        return b"\x01"
    if v is False:
        return b"\x02"
    if v is True:
        return b"\x03"
    if isinstance(v, (int, float)):
        return b"\x04" + _enc_num(v)
    if isinstance(v, str):
        return b"\x05" + _enc_str(v)
    if isinstance(v, list):
        return b"\x06" + b"".join(encode_value(x) for x in v) + b"\x00"
    if isinstance(v, dict):
        # sorted key/value pairs — the reference iterates an ordered map
        # (json_value.rs:87-104; collation.noise pins {"bar":..,"foo":..}
        # before {"foo":..})
        pairs = b"".join(
            _enc_str(k) + encode_value(val) for k, val in sorted(v.items())
        )
        return b"\x07" + pairs + b"\x00"
    raise TypeError(f"not a JSON value: {type(v)}")


def collation_key(col):
    """Column[json text] → Column[binary sort key]. ``orderBy`` on the
    result reproduces the reference's cross-type collation. NULL input
    (absent value) sorts first, like JSON null."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    def _key(js):
        return js.map(
            lambda s: b"\x01" if s is None else encode_value(json.loads(s))
        )

    # real annotation objects (the module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf rejects)
    _key.__annotations__ = {"js": pd.Series, "return": pd.Series}
    return pandas_udf(_key, BinaryType())(col)
