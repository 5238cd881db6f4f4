"""Property tests for the pure-stdlib wire codecs: BSON documents and
Kafka v2 record batches roundtrip for arbitrary inputs — the codecs are
the trust anchor for three native connectors, so fuzz them beyond the
hand-picked fixtures."""

from __future__ import annotations

import gzip
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from dozer_spark.sources.bson_codec import decode_doc, encode_doc
from dozer_spark.sources.kafka_wire import (
    crc32c, parse_record_batch, read_varint,
)

# BSON field names: no NULs (cstring limitation of the format itself)
_names = st.text(min_size=1, max_size=12).filter(lambda s: "\x00" not in s)

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=True),
    st.text(max_size=40),
)

_values = st.recursive(
    _scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=4),
        st.dictionaries(_names, kids, max_size=4),
    ),
    max_leaves=12,
)


@settings(max_examples=200, deadline=None)
@given(doc=st.dictionaries(_names, _values, max_size=6))
def test_bson_roundtrip_property(doc):
    enc = encode_doc(doc)
    dec, end = decode_doc(enc)
    assert end == len(enc)
    # tuples come back as lists; normalize before comparing
    def norm(v):
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [norm(x) for x in v]
        return v
    assert dec == norm(doc)


def _varint_enc(v: int) -> bytes:
    z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = b""
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


@settings(max_examples=300, deadline=None)
@given(v=st.integers(min_value=-(2**62), max_value=2**62))
def test_varint_roundtrip_property(v):
    got, n = read_varint(_varint_enc(v), 0)
    assert got == v and n == len(_varint_enc(v))


def _build_batch(base_offset, records, codec):
    recs = b""
    for i, (k, val) in enumerate(records):
        body = b"\x00" + _varint_enc(0) + _varint_enc(i)
        body += _varint_enc(-1) if k is None else _varint_enc(len(k)) + k
        body += _varint_enc(-1) if val is None else _varint_enc(len(val)) + val
        body += _varint_enc(0)
        recs += _varint_enc(len(body)) + body
    payload = gzip.compress(recs) if codec == 1 else recs
    mid = struct.pack(">hiqqqhii", codec, len(records) - 1, 0, 0, -1, -1, -1,
                      len(records))
    after = mid + payload
    return (struct.pack(">qi", base_offset, len(after) + 9)
            + struct.pack(">IbI", 0, 2, crc32c(after)) + after)


@settings(max_examples=100, deadline=None)
@given(
    base=st.integers(min_value=0, max_value=2**40),
    records=st.lists(
        st.tuples(st.one_of(st.none(), st.binary(max_size=24)),
                  st.one_of(st.none(), st.binary(max_size=64))),
        min_size=1, max_size=8,
    ),
    codec=st.sampled_from([0, 1]),
)
def test_record_batch_roundtrip_property(base, records, codec):
    out = parse_record_batch(_build_batch(base, records, codec))
    assert [(r["offset"], r["key"], r["value"]) for r in out] == [
        (base + i, k, v) for i, (k, v) in enumerate(records)
    ]
