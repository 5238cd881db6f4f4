"""Native Kafka consumer — pure stdlib, no broker jar or client lib.

The reference's Kafka connector consumes CDC topics directly
(dozer-ingestion/src/lib.rs:109-112). Spark's own kafka source needs the
spark-sql-kafka package; this module implements the PUBLIC Kafka wire
protocol (https://kafka.apache.org/protocol) at fixed CLASSIC-encoding
versions — ApiVersions v0, Metadata v1, ListOffsets v1, Fetch v4 — plus
the v2 record-batch format (varint records, CRC32C integrity,
gzip-or-none compression), completing the native-client treatment the
Postgres / MySQL / MongoDB / ClickHouse connectors already have.

Spool contract matches the other tails: records land as JSON lines with
a durable per-partition offset file, files publish by atomic rename,
at-least-once on crash. The spool feeds kafka.debezium_changelog (CDC
topics) or plain row parsing, so everything downstream is shared.
"""

from __future__ import annotations

import gzip
import json
import os
import socket
import struct

API_FETCH, API_LIST_OFFSETS, API_METADATA, API_VERSIONS = 1, 2, 3, 18


# -- CRC32C (Castagnoli) ------------------------------------------------------

_CRC32C_TABLE = []


def _crc32c_table():
    if not _CRC32C_TABLE:
        poly = 0x82F63B78
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC32C_TABLE.append(c)
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    tbl = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# -- primitive encoders -------------------------------------------------------


def _str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _read_str(buf: bytes, i: int) -> tuple[str | None, int]:
    (ln,) = struct.unpack_from(">h", buf, i)
    i += 2
    if ln == -1:
        return None, i
    return buf[i:i + ln].decode(), i + ln


def read_varint(buf: bytes, i: int) -> tuple[int, int]:
    """Zigzag varint (record fields)."""
    shift, acc = 0, 0
    while True:
        b = buf[i]
        i += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), i


# -- record batch v2 ----------------------------------------------------------


CONTROL_BATCH = 0x20  # attributes bit: transaction control marker batch


def parse_record_batch(buf: bytes, verify_crc: bool = True,
                       with_meta: bool = False):
    """One v2 batch -> [{offset, timestamp, key, value}] (with_meta adds
    (attrs, producer_id, records)). Fails loud on unsupported
    magic/compression — silent misparse of a CDC stream is the one
    unforgivable failure mode (same policy as mysql_binlog)."""
    base_offset, _blen, _epoch = struct.unpack_from(">qiI", buf, 0)
    magic = buf[16]
    if magic != 2:
        raise ValueError(f"unsupported record batch magic {magic} (v2 only)")
    (crc,) = struct.unpack_from(">I", buf, 17)
    if verify_crc and crc32c(buf[21:]) != crc:
        raise ValueError("record batch CRC32C mismatch (corrupt fetch)")
    attrs, _last_delta, first_ts = struct.unpack_from(">hiq", buf, 21)
    (producer_id,) = struct.unpack_from(">q", buf, 43)
    (count,) = struct.unpack_from(">i", buf, 57)
    payload = buf[61:]
    codec = attrs & 0x07
    if codec == 1:
        payload = gzip.decompress(payload)
    elif codec != 0:
        raise ValueError(
            f"unsupported compression codec {codec} (none/gzip only — "
            "snappy/lz4/zstd libs are not in this environment)"
        )
    out, i = [], 0
    for _ in range(count):
        _rlen, i = read_varint(payload, i)
        i += 1  # record attributes (unused)
        ts_delta, i = read_varint(payload, i)
        off_delta, i = read_varint(payload, i)
        klen, i = read_varint(payload, i)
        key = None
        if klen >= 0:
            key = payload[i:i + klen]
            i += klen
        vlen, i = read_varint(payload, i)
        value = None
        if vlen >= 0:
            value = payload[i:i + vlen]
            i += vlen
        nheaders, i = read_varint(payload, i)
        for _ in range(nheaders):
            hk, i = read_varint(payload, i)
            i += hk
            hv, i = read_varint(payload, i)
            if hv > 0:
                i += hv
        out.append({
            "offset": base_offset + off_delta,
            "timestamp": first_ts + ts_delta,
            "key": key,
            "value": value,
        })
    if with_meta:
        return attrs, producer_id, out
    return out


def parse_record_set(buf: bytes,
                     aborted: list[tuple[int, int]] | None = None) -> list[dict]:
    """A fetch response's record SET may concatenate several batches.

    Transactional correctness (the Java consumer's read_committed
    algorithm): `aborted` is the fetch response's (producer_id,
    first_offset) list. Walking batches in offset order, a producer
    becomes ABORT-ACTIVE once its first_offset is reached; its data
    batches are dropped until its ABORT control marker (control-record
    key type 0) passes by. Control marker batches themselves are never
    data. Without this, phantom rows from aborted transactions and the
    commit/abort markers of EVERY transaction would be spooled as CDC
    records — silent corruption."""
    pending = sorted(aborted or [], key=lambda t: t[1])
    active: set[int] = set()
    out, i, p = [], 0, 0
    while i + 12 <= len(buf):
        (blen,) = struct.unpack_from(">i", buf, i + 8)
        total = 12 + blen
        if i + total > len(buf):
            break  # trailing partial batch (broker may truncate) — next fetch re-reads
        (base_offset,) = struct.unpack_from(">q", buf, i)
        while p < len(pending) and pending[p][1] <= base_offset:
            active.add(pending[p][0])
            p += 1
        attrs, producer_id, records = parse_record_batch(
            buf[i:i + total], with_meta=True)
        if attrs & CONTROL_BATCH:
            for r in records:
                if r["key"] is not None and len(r["key"]) >= 4:
                    _ver, ctype = struct.unpack(">hh", r["key"][:4])
                    if ctype == 0:  # ABORT marker ends this producer's range
                        active.discard(producer_id)
        elif producer_id in active:
            pass  # aborted transaction's data: drop
        else:
            out.extend(records)
        i += total
    return out


# -- the client ---------------------------------------------------------------


class KafkaWireClient:
    def __init__(self, host: str, port: int = 9092,
                 client_id: str = "dozer_spark", timeout: float = 10.0):
        self.host, self.port, self.client_id = host, port, client_id
        self.timeout = timeout
        self.sock: socket.socket | None = None
        self._corr = 0
        self._buf = b""

    def connect(self) -> "KafkaWireClient":
        self.sock = socket.create_connection((self.host, self.port),
                                             timeout=self.timeout)
        return self

    def close(self) -> None:
        if self.sock is not None:
            self.sock.close()
            self.sock = None

    def _roundtrip(self, api_key: int, api_version: int, body: bytes) -> bytes:
        self._corr += 1
        header = struct.pack(">hhi", api_key, api_version, self._corr) \
            + _str(self.client_id)
        msg = header + body
        self.sock.sendall(struct.pack(">i", len(msg)) + msg)
        while len(self._buf) < 4:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("broker closed connection")
            self._buf += chunk
        (ln,) = struct.unpack_from(">i", self._buf, 0)
        while len(self._buf) < 4 + ln:
            chunk = self.sock.recv(65536)
            if not chunk:
                # a FIN'd socket returns b"" forever — without this guard
                # the loop would spin instead of failing
                raise ConnectionError("broker closed connection mid-response")
            self._buf += chunk
        resp, self._buf = self._buf[4:4 + ln], self._buf[4 + ln:]
        (corr,) = struct.unpack_from(">i", resp, 0)
        if corr != self._corr:
            raise RuntimeError(f"correlation mismatch {corr} != {self._corr}")
        return resp[4:]

    def api_versions(self) -> dict[int, tuple[int, int]]:
        b = self._roundtrip(API_VERSIONS, 0, b"")
        (err, n) = struct.unpack_from(">hi", b, 0)
        if err:
            raise RuntimeError(f"ApiVersions error {err}")
        out, i = {}, 6
        for _ in range(n):
            k, lo, hi = struct.unpack_from(">hhh", b, i)
            out[k] = (lo, hi)
            i += 6
        return out

    def metadata(self, topics: list[str]) -> dict:
        body = struct.pack(">i", len(topics)) + b"".join(_str(t) for t in topics)
        b = self._roundtrip(API_METADATA, 1, body)
        i = 0
        (nb,) = struct.unpack_from(">i", b, i)
        i += 4
        brokers = {}
        for _ in range(nb):
            (nid,) = struct.unpack_from(">i", b, i)
            i += 4
            host, i = _read_str(b, i)
            (port,) = struct.unpack_from(">i", b, i)
            i += 4
            _rack, i = _read_str(b, i)
            brokers[nid] = (host, port)
        (_controller,) = struct.unpack_from(">i", b, i)
        i += 4
        (nt,) = struct.unpack_from(">i", b, i)
        i += 4
        topics_out = {}
        for _ in range(nt):
            (terr,) = struct.unpack_from(">h", b, i)
            i += 2
            name, i = _read_str(b, i)
            i += 1  # is_internal
            (np_,) = struct.unpack_from(">i", b, i)
            i += 4
            parts = {}
            for _ in range(np_):
                perr, pid, leader = struct.unpack_from(">hii", b, i)
                i += 10
                (nrep,) = struct.unpack_from(">i", b, i)
                i += 4 + 4 * nrep
                (nisr,) = struct.unpack_from(">i", b, i)
                i += 4 + 4 * nisr
                parts[pid] = {"error": perr, "leader": leader}
            topics_out[name] = {"error": terr, "partitions": parts}
        return {"brokers": brokers, "topics": topics_out}

    def list_offsets(self, topic: str, partition: int, timestamp: int = -2) -> int:
        """-2 = earliest, -1 = latest."""
        body = struct.pack(">i", -1) + struct.pack(">i", 1) + _str(topic) \
            + struct.pack(">i", 1) + struct.pack(">iq", partition, timestamp)
        b = self._roundtrip(API_LIST_OFFSETS, 1, body)
        i = 4  # skip topics count (1)
        _name, i = _read_str(b, i)
        i += 4  # partitions count (1)
        pid, err, _ts, offset = struct.unpack_from(">ihqq", b, i)
        if err:
            raise RuntimeError(f"ListOffsets error {err} for {topic}/{partition}")
        return offset

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 20, max_wait_ms: int = 500) -> list[dict]:
        body = (
            struct.pack(">iiii", -1, max_wait_ms, 1, max_bytes)
            # read_committed: the broker bounds the fetch at the LSO and
            # supplies the aborted-transaction list the record-set parser
            # filters with — a CDC consumer must never see aborted rows
            + struct.pack(">b", 1)
            + struct.pack(">i", 1) + _str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", partition, offset, max_bytes)
        )
        b = self._roundtrip(API_FETCH, 4, body)
        i = 4  # throttle_time_ms
        (nt,) = struct.unpack_from(">i", b, i)
        i += 4
        records: list[dict] = []
        for _ in range(nt):
            _name, i = _read_str(b, i)
            (np_,) = struct.unpack_from(">i", b, i)
            i += 4
            for _ in range(np_):
                pid, err, _hw, _lso = struct.unpack_from(">ihqq", b, i)
                i += 22
                (nab,) = struct.unpack_from(">i", b, i)
                i += 4
                aborted: list[tuple[int, int]] = []
                for _ in range(max(nab, 0)):
                    producer_id, first_off = struct.unpack_from(">qq", b, i)
                    aborted.append((producer_id, first_off))
                    i += 16
                (rlen,) = struct.unpack_from(">i", b, i)
                i += 4
                if err:
                    raise RuntimeError(f"Fetch error {err} for {topic}/{pid}")
                if rlen > 0:
                    records.extend(parse_record_set(b[i:i + rlen], aborted))
                    i += rlen
        # the broker may return records below the requested offset (batch
        # alignment); filter client-side like every consumer does
        return [r for r in records if r["offset"] >= offset]

    def client_for_leader(self, topic: str, partition: int) -> "KafkaWireClient":
        """Fetch/ListOffsets must go to the partition LEADER, not the
        bootstrap node — on a multi-broker cluster the bootstrap answers
        metadata but NOT_LEADER_FOR_PARTITION rejects fetches. Returns
        self when the bootstrap already leads (single broker)."""
        md = self.metadata([topic])
        t = md["topics"].get(topic)
        if t is None or t.get("error"):
            raise RuntimeError(f"metadata error for topic {topic!r}: {t}")
        part = t["partitions"].get(partition)
        if part is None or part.get("error"):
            raise RuntimeError(
                f"metadata error for {topic}/{partition}: {part}")
        leader = md["brokers"].get(part["leader"])
        if leader is None:
            raise RuntimeError(
                f"leader node {part['leader']} not in broker list")
        host, port = leader
        if (host, port) == (self.host, self.port):
            return self
        return KafkaWireClient(host, port, self.client_id,
                               self.timeout).connect()


def tail_kafka_to_spool(bootstrap: str, topic: str, partition: int,
                        spool_dir: str, max_records: int | None = None,
                        idle_rounds: int = 3,
                        flush_every: int = 50_000) -> int:
    """Tail one topic-partition into JSON-line spool files (key/value
    utf-8, offset + timestamp preserved) with a chunked durable offset
    cursor — the same contract as the PG/Mongo tails. At scale: one
    tailer per partition, one spool each (SCALE.md spool sharding)."""
    from dozer_spark.sources.spool import SpoolWriter

    host, _, port = bootstrap.partition(":")
    w = SpoolWriter(spool_dir, f"kafka-p{partition}", f"_offset_p{partition}",
                    flush_every)
    boot = KafkaWireClient(host, int(port or 9092)).connect()
    cli = boot.client_for_leader(topic, partition)
    if cli is not boot:
        boot.close()
    try:
        stored = w.read_cursor()
        if stored:
            offset = int(stored)
        else:
            offset = cli.list_offsets(topic, partition, -2)
        idle = 0
        while True:
            batch = cli.fetch(topic, partition, offset)
            if not batch:
                idle += 1
                if idle >= idle_rounds:
                    break
                continue
            idle = 0
            for r in batch:
                w.add(json.dumps({
                    "offset": r["offset"], "timestamp": r["timestamp"],
                    "key": r["key"].decode("utf-8", "replace") if r["key"] is not None else None,
                    "value": r["value"].decode("utf-8", "replace") if r["value"] is not None else None,
                }, separators=(",", ":")).encode(), str(r["offset"] + 1))
            offset = batch[-1]["offset"] + 1
            if max_records is not None and w.total >= max_records:
                break
        w.flush()
        return w.total
    finally:
        cli.close()


def spool_kafka_frame(spark, spool_dir: str):
    """Spool files -> (key, value, offset, timestamp) frame, the shape
    kafka.debezium_changelog consumes."""
    return spark.read.schema(
        "offset long, timestamp long, key string, value string"
    ).json(os.path.join(spool_dir, "kafka-*.jsonl"))
