"""Property tests for the TiKV row-KV codec beyond the byte goldens:
memory-comparable ordering, varint roundtrips, and v2 layout
self-consistency."""

import datetime as dt
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from tidb_lightning_release_4_0_spark.functions.kv_codec import (
    encode_int_comparable,
    encode_row_v1,
    encode_row_v2,
    encode_uvarint,
    encode_varint,
    pack_datetime,
    record_key,
)

I64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


def _decode_uvarint(b: bytes) -> tuple[int, int]:
    v, shift, i = 0, 0, 0
    while True:
        byte = b[i]
        v |= (byte & 0x7F) << shift
        i += 1
        if byte < 0x80:
            return v, i
        shift += 7


@given(I64, I64)
@settings(max_examples=200)
def test_comparable_int_preserves_order(a, b):
    # the whole point of the memory-comparable encoding: byte order
    # == numeric order (so TiKV range scans see sorted handles)
    assert (encode_int_comparable(a) < encode_int_comparable(b)) == (a < b)


@given(I64, I64)
@settings(max_examples=200)
def test_record_key_order_follows_handle(a, b):
    assert (record_key(7, a) < record_key(7, b)) == (a < b)


@given(I64)
@settings(max_examples=200)
def test_varint_roundtrip(v):
    u, n = _decode_uvarint(encode_varint(v))
    assert n == len(encode_varint(v))
    # inverse zigzag
    back = (u >> 1) ^ -(u & 1)
    # interpret as signed 64-bit
    back = struct.unpack("<q", struct.pack("<Q", back & 0xFFFFFFFFFFFFFFFF))[0]
    assert back == v


@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
@settings(max_examples=200)
def test_uvarint_roundtrip(v):
    u, _ = _decode_uvarint(encode_uvarint(v))
    assert u == v


@given(
    st.lists(
        st.one_of(
            st.none(),
            I64,
            st.floats(allow_nan=False, allow_infinity=False),
            st.text(max_size=20),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=100)
def test_v2_layout_self_consistent(values):
    col_ids = list(range(1, len(values) + 1))
    b = encode_row_v2(col_ids, values)
    assert b[0] == 0x80
    big = b[1] & 0x1
    n_notnull = struct.unpack("<H", b[2:4])[0]
    n_null = struct.unpack("<H", b[4:6])[0]
    assert n_notnull == sum(1 for v in values if v is not None)
    assert n_null == sum(1 for v in values if v is None)
    idw = 4 if big else 1
    offw = 4 if big else 2
    ids_end = 6 + idw * (n_notnull + n_null)
    offs_end = ids_end + offw * n_notnull
    offs = [
        struct.unpack("<I" if big else "<H", b[ids_end + i * offw: ids_end + (i + 1) * offw])[0]
        for i in range(n_notnull)
    ]
    # offsets ascend and the last one covers exactly the payload
    assert offs == sorted(offs)
    assert len(b) - offs_end == (offs[-1] if offs else 0)


@given(
    st.datetimes(
        min_value=dt.datetime(1000, 1, 1), max_value=dt.datetime(9999, 12, 31)
    )
)
@settings(max_examples=200)
def test_pack_datetime_order_and_fields(d):
    d = d.replace(microsecond=0)
    p = pack_datetime(d)
    later = d + dt.timedelta(seconds=1)
    if later.year <= 9999:
        assert pack_datetime(later) > p
    assert (p >> 24) & 0x3F == d.second


def test_v1_deterministic_and_prefix_free_per_column():
    # each column contributes [colid][datum]; concatenation equality
    # implies per-column equality for these fixed ids
    a = encode_row_v1([1, 2], ["x", 1])
    b = encode_row_v1([1], ["x"]) + encode_row_v1([2], [1])
    assert a == b


@given(
    st.lists(
        st.one_of(
            st.just(float("nan")),
            st.just(float("inf")),
            st.just(-0.0),
            st.floats(allow_nan=False, width=64),
            st.none(),
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=60, deadline=None)
def test_nan_double_kernels_identical_property(vals):
    """The r8 NaN fix, pinned as a property: a genuine NaN double in a
    checksummed column must encode as a FLOAT datum (never conflated
    with NULL — NULLness comes only from the explicit isnull flag),
    and the vectorized kernel's double fragments must be byte-
    identical with the scalar oracle for every double shape including
    NaN / ±inf / -0.0, in value, key, and v2-cell positions."""
    import numpy as np
    import pandas as pd

    from tidb_lightning_release_4_0_spark.functions import kv_codec as KC
    from tidb_lightning_release_4_0_spark.functions import (
        kv_codec_np as KNP,
    )

    mask = np.array([v is None for v in vals])
    # the projection coalesces NULL doubles to 0.0 (NULLness rides the
    # explicit flag); genuine NaNs pass through untouched
    series = pd.Series(
        [0.0 if v is None else v for v in vals], dtype=np.float64
    )

    vparts, vvalid = KNP._value_datum_frag(
        series, mask, "double", None
    )
    vmat, vlens = KNP._concat_frags(vparts)
    kmat, klens = KNP._concat_frags(
        KNP._key_datum_frag(series, mask, "double", None)
    )
    (cmat, clens), _ = KNP._cell_v2_frag(series, mask, "double", None)
    for i, v in enumerate(vals):
        if v is None:
            # the caller overlays NilFlag/CanSkip off this flag
            assert not vvalid[i]
            assert klens[i] == 1 and kmat[i, 0] == 0x00  # NilFlag
            assert clens[i] == 0
            continue
        assert vvalid[i]
        want_v = KC._encode_datum_v1(v)
        assert bytes(vmat[i, : vlens[i]]) == want_v
        want_k = KC.encode_key_datum(v)
        assert bytes(kmat[i, : klens[i]]) == want_k
        want_c = KC._encode_cell_v2(v)
        assert bytes(cmat[i, : clens[i]]) == want_c
