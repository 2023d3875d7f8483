import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from noise_spark.index import codec


def test_varbyte_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**56 + 7], dtype=np.uint64)
    assert list(codec.varbyte_decode(codec.varbyte_encode(vals))) == list(vals)


def test_varbyte_empty():
    assert codec.varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varbyte_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = codec.varbyte_decode(codec.varbyte_encode(arr))
    assert list(out) == vals


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True))
def test_delta_roundtrip_property(ids):
    ids = sorted(ids)
    arr = np.array(ids, dtype=np.int64)
    out = codec.delta_decode(codec.delta_encode(arr))
    assert list(out) == ids


def test_positions_roundtrip():
    per_doc = [[0, 3, 9], [5], [], [1, 2, 3, 4, 1000]]
    buf = codec.encode_positions(per_doc)
    out = codec.decode_positions(buf, len(per_doc))
    assert [list(x) for x in out] == per_doc


def test_varbyte_compression_ratio():
    # dense doc-id deltas should compress to ~1 byte per id
    ids = np.arange(0, 100000, 3, dtype=np.int64)
    buf = codec.delta_encode(ids)
    assert len(buf) < ids.size * 1.1


def test_for_roundtrip_small():
    vals = np.array([100, 101, 105, 230, 1000, 2**40], dtype=np.uint64)
    out = codec.for_decode(codec.for_encode(vals))
    assert list(out) == list(vals)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**50), min_size=1, max_size=200))
def test_for_roundtrip_property(vals):
    arr = np.array(sorted(vals), dtype=np.uint64)
    out = codec.for_decode(codec.for_encode(arr))
    assert list(out) == sorted(vals)


def test_for_beats_varbyte_on_dense_blocks():
    # dense docID runs: FOR bit-packs tiny relative offsets
    ids = np.arange(10_000_000, 10_000_128, dtype=np.int64)
    f = codec.for_encode(ids.astype(np.uint64))
    v = codec.delta_encode(ids)
    assert len(f) < len(v) + 16  # comparable or better incl. header
