"""Minimal pure-stdlib BSON codec — the subset MongoDB commands and
change-stream events use.

BSON is a PUBLIC specification (bsonspec.org). Implemented element types:
double, string, embedded document, array, binary, ObjectId, boolean,
UTC datetime, null, int32, timestamp, int64, Decimal128 (opaque
passthrough). Everything else fails loud — better a clear error than a
silently mis-framed stream (same policy as mysql_binlog's unsupported
column types).
"""

from __future__ import annotations

import struct


class ObjectId:
    """12-byte document id, kept as opaque hex (the engine treats ids as
    strings; no generation machinery needed client-side)."""

    __slots__ = ("hex",)

    def __init__(self, raw: bytes):
        if len(raw) != 12:
            raise ValueError("ObjectId must be 12 bytes")
        self.hex = raw.hex()

    def __eq__(self, other):
        return isinstance(other, ObjectId) and other.hex == self.hex

    def __repr__(self):
        return f"ObjectId({self.hex})"


class Timestamp:
    """BSON timestamp (seconds, per-second ordinal) — the clusterTime
    type. as_long() is the monotone (sec << 32) | ordinal ordering key."""

    __slots__ = ("seconds", "ordinal")

    def __init__(self, seconds: int, ordinal: int):
        self.seconds, self.ordinal = seconds, ordinal

    def as_long(self) -> int:
        return (self.seconds << 32) | self.ordinal

    def __repr__(self):
        return f"Timestamp({self.seconds},{self.ordinal})"


class Binary:
    __slots__ = ("subtype", "data")

    def __init__(self, subtype: int, data: bytes):
        self.subtype, self.data = subtype, data


# -- encoding ----------------------------------------------------------------


def _enc_cstr(s: str) -> bytes:
    b = s.encode()
    if b"\x00" in b:
        raise ValueError("BSON cstrings cannot contain NUL")
    return b + b"\x00"


def _enc_element(name: str, v) -> bytes:
    n = _enc_cstr(name)
    if isinstance(v, bool):  # before int (bool is an int subclass)
        return b"\x08" + n + (b"\x01" if v else b"\x00")
    if isinstance(v, float):
        return b"\x01" + n + struct.pack("<d", v)
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + n + struct.pack("<i", v)
        return b"\x12" + n + struct.pack("<q", v)
    if isinstance(v, str):
        b = v.encode()
        return b"\x02" + n + struct.pack("<i", len(b) + 1) + b + b"\x00"
    if v is None:
        return b"\x0a" + n
    if isinstance(v, dict):
        return b"\x03" + n + encode_doc(v)
    if isinstance(v, (list, tuple)):
        return b"\x04" + n + encode_doc({str(i): x for i, x in enumerate(v)})
    if isinstance(v, Timestamp):
        return b"\x11" + n + struct.pack("<II", v.ordinal, v.seconds)
    if isinstance(v, ObjectId):
        return b"\x07" + n + bytes.fromhex(v.hex)
    if isinstance(v, Binary):
        return b"\x05" + n + struct.pack("<iB", len(v.data), v.subtype) + v.data
    if isinstance(v, bytes):
        return b"\x05" + n + struct.pack("<iB", len(v), 0) + v
    raise TypeError(f"cannot BSON-encode {type(v).__name__}")


def encode_doc(doc: dict) -> bytes:
    body = b"".join(_enc_element(k, v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


# -- decoding ----------------------------------------------------------------


def _dec_cstr(buf: bytes, i: int) -> tuple[str, int]:
    end = buf.index(b"\x00", i)
    return buf[i:end].decode(), end + 1


def decode_doc(buf: bytes, i: int = 0) -> tuple[dict, int]:
    """Decode one document starting at offset i; returns (doc, next_i)."""
    (length,) = struct.unpack_from("<i", buf, i)
    end = i + length - 1  # position of the trailing NUL
    i += 4
    out: dict = {}
    while i < end:
        t = buf[i]
        i += 1
        name, i = _dec_cstr(buf, i)
        if t == 0x01:
            (out[name],) = struct.unpack_from("<d", buf, i)
            i += 8
        elif t == 0x02:
            (ln,) = struct.unpack_from("<i", buf, i)
            out[name] = buf[i + 4:i + 4 + ln - 1].decode()
            i += 4 + ln
        elif t in (0x03, 0x04):
            sub, i = decode_doc(buf, i)
            out[name] = list(sub.values()) if t == 0x04 else sub
        elif t == 0x05:
            (ln,) = struct.unpack_from("<i", buf, i)
            subtype = buf[i + 4]
            out[name] = Binary(subtype, buf[i + 5:i + 5 + ln])
            i += 5 + ln
        elif t == 0x07:
            out[name] = ObjectId(buf[i:i + 12])
            i += 12
        elif t == 0x08:
            out[name] = buf[i] == 1
            i += 1
        elif t == 0x09:  # UTC datetime: ms since epoch
            (out[name],) = struct.unpack_from("<q", buf, i)
            i += 8
        elif t == 0x0A:
            out[name] = None
        elif t == 0x10:
            (out[name],) = struct.unpack_from("<i", buf, i)
            i += 4
        elif t == 0x11:
            ordinal, seconds = struct.unpack_from("<II", buf, i)
            out[name] = Timestamp(seconds, ordinal)
            i += 8
        elif t == 0x12:
            (out[name],) = struct.unpack_from("<q", buf, i)
            i += 8
        elif t == 0x13:  # Decimal128: opaque passthrough
            out[name] = Binary(0x13, buf[i:i + 16])
            i += 16
        else:
            raise ValueError(f"unsupported BSON element type 0x{t:02x} ({name!r})")
    return out, end + 1


def to_jsonable(v):
    """BSON value tree -> JSON-serializable tree (ObjectId -> hex string,
    Timestamp -> (sec<<32)|ordinal long, Binary -> hex string)."""
    if isinstance(v, dict):
        return {k: to_jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [to_jsonable(x) for x in v]
    if isinstance(v, ObjectId):
        return v.hex
    if isinstance(v, Timestamp):
        return v.as_long()
    if isinstance(v, Binary):
        return v.data.hex()
    return v
