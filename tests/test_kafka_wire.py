"""Native Kafka consumer: CRC32C vectors, varint/record-batch codec
roundtrip (including gzip batches and fail-loud unsupported codecs), a
fake wire broker e2e (metadata -> list_offsets -> fetch -> spool ->
Debezium changelog -> snapshot), and a SPARK_GRAFT_KAFKA_BOOTSTRAP live
gate."""

from __future__ import annotations

import gzip
import json
import os
import socket
import struct
import threading

import pytest

from dozer_spark.sources.kafka_wire import (
    KafkaWireClient, crc32c, parse_record_batch, parse_record_set,
    read_varint, tail_kafka_to_spool,
)


def test_crc32c_known_vectors():
    # RFC 3720 / common test vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


# -- batch builder (test-side encoder; the module only needs to decode) ------


def _varint(v: int) -> bytes:
    z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = b""
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def build_batch(base_offset: int, records: list[tuple[bytes | None, bytes | None]],
                first_ts: int = 1_700_000_000_000, codec: int = 0,
                control: bool = False, producer_id: int = -1) -> bytes:
    recs = b""
    for i, (k, v) in enumerate(records):
        body = b"\x00" + _varint(0) + _varint(i)
        body += _varint(-1) if k is None else _varint(len(k)) + k
        body += _varint(-1) if v is None else _varint(len(v)) + v
        body += _varint(0)  # headers
        recs += _varint(len(body)) + body
    payload = gzip.compress(recs) if codec == 1 else recs
    attrs = codec | (0x20 if control else 0)
    mid = struct.pack(">hiqqqhii", attrs, len(records) - 1, first_ts,
                      first_ts, producer_id, -1, -1, len(records))
    # fields: attributes, lastOffsetDelta, firstTs, maxTs, producerId,
    # producerEpoch, baseSequence, recordCount
    body_after_crc = mid + payload
    crc = crc32c(body_after_crc)
    after_len = struct.pack(">IbI", 0, 2, crc) + body_after_crc
    # partitionLeaderEpoch(0) magic(2) crc
    return struct.pack(">qi", base_offset, len(after_len)) + after_len


def test_batch_roundtrip_plain_and_gzip():
    for codec in (0, 1):
        raw = build_batch(100, [(b"k1", b"v1"), (None, b"v2"), (b"k3", None)],
                          codec=codec)
        out = parse_record_batch(raw)
        assert [(r["offset"], r["key"], r["value"]) for r in out] == [
            (100, b"k1", b"v1"), (101, None, b"v2"), (102, b"k3", None),
        ]


def test_batch_crc_and_codec_fail_loud():
    raw = bytearray(build_batch(0, [(b"k", b"v")]))
    raw[-1] ^= 0xFF  # corrupt payload
    with pytest.raises(ValueError, match="CRC32C"):
        parse_record_batch(bytes(raw))
    snappy = build_batch(0, [(b"k", b"v")], codec=2)
    with pytest.raises(ValueError, match="unsupported compression"):
        parse_record_batch(snappy)


def test_record_set_concatenation_and_partial_tail():
    b1 = build_batch(0, [(b"a", b"1")])
    b2 = build_batch(1, [(b"b", b"2")], codec=1)
    assert [r["offset"] for r in parse_record_set(b1 + b2)] == [0, 1]
    # broker-truncated trailing batch is skipped, not misparsed
    assert [r["offset"] for r in parse_record_set(b1 + b2[:20])] == [0]


def test_varint_zigzag():
    for v in (0, 1, -1, 63, 64, -64, -65, 300, -300, 1 << 30):
        enc = _varint(v)
        got, n = read_varint(enc, 0)
        assert got == v and n == len(enc)


def test_transactional_abort_filtering():
    """read_committed semantics client-side: data of an aborted
    transaction and ALL control marker batches are dropped; committed
    producers' data passes. Matches the Java consumer's algorithm."""
    abort_marker = struct.pack(">hh", 0, 0)   # version 0, type ABORT
    commit_marker = struct.pack(">hh", 0, 1)  # type COMMIT
    stream = (
        build_batch(0, [(b"k0", b"committed-before")], producer_id=7)
        + build_batch(1, [(b"k1", b"aborted-1"), (b"k2", b"aborted-2")],
                      producer_id=9)
        + build_batch(3, [(abort_marker, b"")], control=True, producer_id=9)
        + build_batch(4, [(b"k3", b"committed-after")], producer_id=9)
        + build_batch(5, [(commit_marker, b"")], control=True, producer_id=7)
    )
    out = parse_record_set(stream, aborted=[(9, 1)])
    assert [(r["offset"], r["value"]) for r in out] == [
        (0, b"committed-before"), (4, b"committed-after"),
    ]
    # without the aborted list (read_uncommitted server) control markers
    # are still never data
    out2 = parse_record_set(stream)
    assert [r["offset"] for r in out2] == [0, 1, 2, 4]


# -- fake broker --------------------------------------------------------------


def _s(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">h", len(b)) + b


class FakeBroker(threading.Thread):
    """Speaks ApiVersions v0 / Metadata v1 / ListOffsets v1 / Fetch v4
    for one topic-partition whose log is `batches`."""

    def __init__(self, topic: str, batches: list[bytes], earliest: int = 0,
                 advertise: tuple[str, int] | None = None):
        super().__init__(daemon=True)
        self.topic, self.batches, self.earliest = topic, batches, earliest
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        # metadata advertises this address as the partition leader —
        # point it at ANOTHER broker to exercise leader routing
        self.advertise = advertise or ("127.0.0.1", self.port)

    def _serve(self, conn):
        buf = b""
        while True:
            while len(buf) < 4:
                c = conn.recv(65536)
                if not c:
                    return
                buf += c
            (ln,) = struct.unpack_from(">i", buf, 0)
            while len(buf) < 4 + ln:
                buf += conn.recv(65536)
            req, buf = buf[4:4 + ln], buf[4 + ln:]
            api, ver, corr = struct.unpack_from(">hhi", req, 0)
            # skip client_id
            (cl,) = struct.unpack_from(">h", req, 8)
            body = req[10 + max(cl, 0):]
            if api == 18:
                resp = struct.pack(">hi", 0, 3) + struct.pack(">hhh", 1, 0, 11) \
                    + struct.pack(">hhh", 2, 0, 5) + struct.pack(">hhh", 3, 0, 9)
            elif api == 3:
                resp = (
                    struct.pack(">i", 1)
                    + struct.pack(">i", 0) + _s(self.advertise[0])
                    + struct.pack(">i", self.advertise[1]) + struct.pack(">h", -1)
                    + struct.pack(">i", 0)  # controller
                    + struct.pack(">i", 1)
                    + struct.pack(">h", 0) + _s(self.topic) + b"\x00"
                    + struct.pack(">i", 1)
                    + struct.pack(">hii", 0, 0, 0)
                    + struct.pack(">i", 0) + struct.pack(">i", 0)
                )
            elif api == 2:
                # body: replica(4) ntopics(4) topic(2+len) nparts(4) partition(4) ts(8)
                (ts,) = struct.unpack_from(">q", body, 4 + 4 + 2 + len(self.topic) + 4 + 4)
                n = len(self.batches)
                off = self.earliest if ts == -2 else self.earliest + n
                resp = (
                    struct.pack(">i", 1) + _s(self.topic)
                    + struct.pack(">i", 1)
                    + struct.pack(">ihqq", 0, 0, -1, off)
                )
            elif api == 1:
                # fetch_offset lives after replica(4) wait(4) min(4) max(4)
                # iso(1) ntopics(4) topic nparts(4) partition(4)
                o = 17 + 4 + 2 + len(self.topic) + 4 + 4
                (fetch_off,) = struct.unpack_from(">q", body, o)
                idx = fetch_off - self.earliest
                recs = b"".join(self.batches[max(idx, 0):])
                resp = (
                    struct.pack(">i", 0)  # throttle
                    + struct.pack(">i", 1) + _s(self.topic)
                    + struct.pack(">i", 1)
                    + struct.pack(">ihqq", 0, 0,
                                  self.earliest + len(self.batches), -1)
                    + struct.pack(">i", 0)  # aborted txns
                    + struct.pack(">i", len(recs)) + recs
                )
            else:
                resp = b""
            out = struct.pack(">i", corr) + resp
            conn.sendall(struct.pack(">i", len(out)) + out)

    def run(self):
        try:
            conn, _ = self.srv.accept()
            self._serve(conn)
        except OSError:
            pass
        finally:
            self.srv.close()


DBZ = [
    {"op": "c", "ts_ms": 1, "after": {"id": 1, "v": "a"},
     "source": {"txId": 1, "lsn": 10}},
    {"op": "u", "ts_ms": 2, "after": {"id": 1, "v": "a2"},
     "source": {"txId": 2, "lsn": 20}},
    {"op": "d", "ts_ms": 3, "before": {"id": 1, "v": "a2"},
     "source": {"txId": 3, "lsn": 30}},
]


def test_fetch_spool_debezium_e2e(spark, tmp_path):
    batches = [
        build_batch(5, [(b"1", json.dumps(DBZ[0]).encode()),
                        (b"1", json.dumps(DBZ[1]).encode())]),
        build_batch(7, [(b"1", json.dumps(DBZ[2]).encode())], codec=1),
    ]
    srv = FakeBroker("cdc.t", batches, earliest=5)
    srv.start()
    spool = str(tmp_path / "spool")
    n = tail_kafka_to_spool(f"127.0.0.1:{srv.port}", "cdc.t", 0, spool,
                            max_records=3)
    assert n == 3
    with open(os.path.join(spool, "_offset_p0")) as f:
        assert int(f.read()) == 8

    from pyspark.sql import types as T

    from dozer_spark.sources.kafka import debezium_changelog
    from dozer_spark.sources.kafka_wire import spool_kafka_frame
    from dozer_spark.streaming.changelog import apply_changelog

    row_schema = T.StructType([T.StructField("id", T.LongType()),
                               T.StructField("v", T.StringType())])
    raw = spool_kafka_frame(spark, spool)
    cl = debezium_changelog(raw, row_schema)
    assert [(r["__op"], r.id) for r in
            sorted(cl.collect(), key=lambda r: r["__seq"])] == [
        ("I", 1), ("U", 1), ("D", 1)]
    assert apply_changelog(cl, ["id"]).count() == 0  # I->U->D replays empty


def test_client_metadata_and_offsets():
    srv = FakeBroker("t", [build_batch(0, [(b"k", b"v")])])
    srv.start()
    cli = KafkaWireClient("127.0.0.1", srv.port).connect()
    vers = cli.api_versions()
    assert vers[1] == (0, 11)
    md = cli.metadata(["t"])
    assert md["topics"]["t"]["partitions"][0]["leader"] == 0
    assert cli.list_offsets("t", 0, -2) == 0
    assert cli.list_offsets("t", 0, -1) == 1
    recs = cli.fetch("t", 0, 0)
    assert [(r["key"], r["value"]) for r in recs] == [(b"k", b"v")]
    cli.close()


def test_leader_routing_two_brokers(tmp_path):
    """Bootstrap node is NOT the partition leader: the tail must follow
    metadata to the advertised leader for fetches (a bootstrap-only
    client fails with NOT_LEADER_FOR_PARTITION on real clusters)."""
    leader = FakeBroker("t", [build_batch(0, [(b"k", b"v")])])
    leader.start()
    boot = FakeBroker("t", [], advertise=("127.0.0.1", leader.port))
    boot.start()
    spool = str(tmp_path / "spool")
    n = tail_kafka_to_spool(f"127.0.0.1:{boot.port}", "t", 0, spool,
                            max_records=1)
    assert n == 1
    with open(os.path.join(spool, "_offset_p0")) as f:
        assert int(f.read()) == 1


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP"),
    reason="needs SPARK_GRAFT_KAFKA_BOOTSTRAP (live broker)",
)
def test_live_kafka_fetch(tmp_path):
    bootstrap = os.environ["SPARK_GRAFT_KAFKA_BOOTSTRAP"]
    topic = os.environ.get("SPARK_GRAFT_KAFKA_TOPIC", "dozer-spark-live")
    spool = str(tmp_path / "spool")
    n = tail_kafka_to_spool(bootstrap, topic, 0, spool, max_records=10,
                            idle_rounds=2)
    assert n >= 0  # tail works even on an empty topic


def test_chunked_flush_bounded_memory(tmp_path):
    """flush_every bounds tailer memory: a 3-record backlog with
    flush_every=2 publishes two files, and the offset cursor advanced
    durably after EACH chunk (an interrupted backfill resumes from the
    last chunk, not from zero)."""
    import glob

    batches = [build_batch(0, [(b"a", b"1"), (b"b", b"2"), (b"c", b"3")])]
    srv = FakeBroker("t", batches)
    srv.start()
    spool = str(tmp_path / "spool")
    n = tail_kafka_to_spool(f"127.0.0.1:{srv.port}", "t", 0, spool,
                            max_records=3, flush_every=2)
    assert n == 3
    files = sorted(glob.glob(os.path.join(spool, "kafka-p0-*.jsonl")))
    assert len(files) == 2
    with open(os.path.join(spool, "_offset_p0")) as f:
        assert int(f.read()) == 3
