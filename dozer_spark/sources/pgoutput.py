"""pgoutput logical-replication decoder — pure stdlib.

wal2json (sources/wal2json.py) is the friendliest decoding plugin, but it
is an EXTENSION — stock PostgreSQL ships only `pgoutput`, the binary
plugin logical replication itself uses (and what Debezium speaks). This
module decodes the PUBLIC pgoutput message format
(https://www.postgresql.org/docs/current/protocol-logicalrep-message-formats.html,
protocol version 1) into the SAME wal2json-v2-shaped JSON records the
existing spool pipeline consumes, so everything downstream — spool files,
`wal2json_changelog`, the changelog operators — is unchanged. Reference
parity: the reference's Postgres connector likewise decodes the
replication stream natively (dozer-ingestion/postgres/, lib.rs:51-64).

Message layout (all integers big-endian):
  'B' Begin:    final_lsn i64, commit_ts i64, xid i32
  'C' Commit:   flags i8, commit_lsn i64, end_lsn i64, commit_ts i64
  'R' Relation: relid i32, namespace cstr, relname cstr, replident i8,
                ncols i16, then per column: flags i8 (1 = key part),
                name cstr, type_oid i32, typmod i32
  'I' Insert:   relid i32, 'N', TupleData
  'U' Update:   relid i32, ['K'|'O', TupleData(old)], 'N', TupleData(new)
  'D' Delete:   relid i32, 'K'|'O', TupleData(old)
  TupleData:    ncols i16, then per column: 'n' (NULL), 'u' (unchanged
                TOAST), 't' i32 len + text bytes
"""

from __future__ import annotations

import json
import struct

# common pg type OIDs -> wal2json-style type names (informational only:
# the engine casts values by the caller-supplied DDL, not by this name)
_TYPE_NAMES = {
    16: "boolean", 17: "bytea", 20: "bigint", 21: "smallint",
    23: "integer", 25: "text", 700: "real", 701: "double precision",
    1042: "character", 1043: "character varying", 1082: "date",
    1083: "time without time zone", 1114: "timestamp without time zone",
    1184: "timestamp with time zone", 1700: "numeric", 2950: "uuid",
    114: "json", 3802: "jsonb",
}


class UnchangedToastError(ValueError):
    """An Update carried an unchanged-TOAST column ('u'): the wire does
    not include the value, so the new image is unknowable here. Set
    REPLICA IDENTITY FULL on the table (the reference requires the same
    for complete old images) or keep oversized values out of replicated
    tables."""


def _cstr(buf: bytes, i: int) -> tuple[str, int]:
    end = buf.index(b"\x00", i)
    return buf[i:end].decode(), end + 1


def _tuple_data(buf: bytes, i: int) -> tuple[list[str | None], int]:
    (n,) = struct.unpack_from(">H", buf, i)
    i += 2
    vals: list[str | None] = []
    for _ in range(n):
        kind = buf[i:i + 1]
        i += 1
        if kind == b"n":
            vals.append(None)
        elif kind == b"u":
            raise UnchangedToastError(UnchangedToastError.__doc__)
        elif kind in (b"t", b"b"):
            (ln,) = struct.unpack_from(">i", buf, i)
            i += 4
            raw = buf[i:i + ln]
            i += ln
            # 't' is the type's text output; 'b' (binary option, which
            # this client never requests) is hex-encoded to stay JSON
            vals.append(raw.decode() if kind == b"t" else raw.hex())
        else:
            raise ValueError(f"unknown TupleData column kind {kind!r}")
    return vals, i


class Relation:
    __slots__ = ("relid", "namespace", "name", "columns", "key_flags")

    def __init__(self, relid: int, namespace: str, name: str,
                 columns: list[tuple[str, int]], key_flags: list[int]):
        self.relid = relid
        self.namespace = namespace
        self.name = name
        self.columns = columns  # [(colname, type_oid)]
        self.key_flags = key_flags


class PgOutputDecoder:
    """Stateful decoder: Relation messages register table metadata that
    the following change messages reference by relid; Begin establishes
    the xid stamped onto each change until Commit."""

    def __init__(self) -> None:
        self.relations: dict[int, Relation] = {}
        self.xid: int = 0

    # -- per-message ---------------------------------------------------------

    def decode(self, payload: bytes, lsn: str = "0/0") -> dict | None:
        """One XLogData payload -> a wal2json-v2-shaped dict for I/U/D, or
        None for transaction control / metadata messages."""
        tag = payload[:1]
        if tag == b"B":
            _final_lsn, _ts, xid = struct.unpack_from(">QQI", payload, 1)
            self.xid = xid
            return None
        if tag == b"C":
            return None
        if tag == b"R":
            self._relation(payload)
            return None
        if tag in (b"Y", b"O", b"M", b"T"):
            # type metadata / origin / logical message / truncate: nothing
            # for the row changelog (truncate is not a row operation; the
            # reference connector ignores it too)
            return None
        # tuple-marker validation must be explicit raises, not asserts:
        # python -O strips asserts and a misframed stream would then be
        # decoded at the wrong offset — the exact silent-misparse failure
        # this module promises to fail loud on
        if tag == b"I":
            (relid,) = struct.unpack_from(">I", payload, 1)
            if payload[5:6] != b"N":
                raise ValueError(
                    f"Insert must carry a new tuple, got {payload[5:6]!r}")
            vals, _ = _tuple_data(payload, 6)
            rel = self._rel(relid)
            return self._record("I", rel, new=vals, old=None)
        if tag == b"U":
            (relid,) = struct.unpack_from(">I", payload, 1)
            rel = self._rel(relid)
            i = 5
            old = None
            mark = payload[i:i + 1]
            if mark in (b"K", b"O"):
                old, i = _tuple_data(payload, i + 1)
                mark = payload[i:i + 1]
            if mark != b"N":
                raise ValueError(
                    f"Update must carry a new tuple, got {mark!r}")
            vals, _ = _tuple_data(payload, i + 1)
            return self._record("U", rel, new=vals, old=old)
        if tag == b"D":
            (relid,) = struct.unpack_from(">I", payload, 1)
            rel = self._rel(relid)
            mark = payload[5:6]
            if mark not in (b"K", b"O"):
                raise ValueError(
                    f"Delete must carry a key/old tuple, got {mark!r}")
            old, _ = _tuple_data(payload, 6)
            return self._record("D", rel, new=None, old=old)
        raise ValueError(f"unknown pgoutput message {tag!r}")

    def decode_json(self, payload: bytes, lsn: str = "0/0") -> bytes | None:
        """decode() serialized to one JSON line (the spool file format)."""
        rec = self.decode(payload, lsn)
        if rec is None:
            return None
        rec["lsn"] = lsn
        return json.dumps(rec, separators=(",", ":")).encode()

    # -- internals -----------------------------------------------------------

    def _relation(self, payload: bytes) -> None:
        (relid,) = struct.unpack_from(">I", payload, 1)
        i = 5
        namespace, i = _cstr(payload, i)
        relname, i = _cstr(payload, i)
        i += 1  # replica identity setting
        (ncols,) = struct.unpack_from(">H", payload, i)
        i += 2
        cols: list[tuple[str, int]] = []
        flags: list[int] = []
        for _ in range(ncols):
            flag = payload[i]
            i += 1
            name, i = _cstr(payload, i)
            (oid, _typmod) = struct.unpack_from(">Ii", payload, i)
            i += 8
            cols.append((name, oid))
            flags.append(flag)
        self.relations[relid] = Relation(relid, namespace, relname, cols, flags)

    def _rel(self, relid: int) -> Relation:
        rel = self.relations.get(relid)
        if rel is None:
            raise ValueError(
                f"change for unknown relation {relid} — the Relation "
                "message precedes changes on every connection; a spool "
                "resumed mid-transaction must re-enter via START_REPLICATION "
                "(the server re-sends Relation) rather than splice raw bytes"
            )
        return rel

    def _record(self, action: str, rel: Relation,
                new: list[str | None] | None,
                old: list[str | None] | None) -> dict:
        rec: dict = {
            "action": action,
            "schema": rel.namespace,
            "table": rel.name,
            "xid": self.xid,
        }
        if new is not None:
            rec["columns"] = [
                {"name": n, "type": _TYPE_NAMES.get(oid, f"oid:{oid}"), "value": v}
                for (n, oid), v in zip(rel.columns, new)
            ]
        if old is not None:
            rec["identity"] = [
                {"name": n, "value": v}
                for (n, _oid), v in zip(rel.columns, old)
                # a 'K' tuple nulls non-key columns; keep only real values
                # so downstream coalesce(identity, columns) works for them
                if v is not None
            ]
        elif action == "U":
            # old key omitted on the wire = key unchanged; synthesize the
            # identity from the new image's key columns so downstream
            # PK-change detection sees a complete record
            rec["identity"] = [
                {"name": n, "value": v}
                for (n, _oid), v, flag in zip(rel.columns, new, rel.key_flags)
                if flag & 1
            ]
        return rec


def tail_pgoutput_to_spool(url: str, slot: str, publication: str,
                           spool_dir: str, max_changes: int | None = None,
                           idle_timeout: float = 3.0,
                           flush_every: int = 50_000) -> int:
    """Tail a pgoutput slot into wal2json-shaped spool files — the
    stock-PostgreSQL twin of pg_replication.tail_to_spool (same chunked
    durable LSN/rename/ack contract, same downstream consumers).
    Returns the number of row changes written."""
    from dozer_spark.sources.pg_replication import (
        PGReplicationClient, parse_pg_url,
    )
    from dozer_spark.sources.spool import SpoolWriter

    w = SpoolWriter(spool_dir, "wal", "_lsn", flush_every)
    start_lsn = w.read_cursor("0/0")

    dec = PgOutputDecoder()
    cli = PGReplicationClient(**parse_pg_url(url), replication=True).connect()
    w.on_flush = cli.confirm  # durable first, ack second (at-least-once)
    try:
        opts = {"proto_version": "1", "publication_names": publication}
        for lsn, payload in cli.stream(slot, start_lsn, options=opts,
                                       idle_timeout=idle_timeout):
            line = dec.decode_json(payload, lsn)
            if line is None:
                # still advance the cursor past control records, but only
                # for the NEXT flush — never ahead of durable data
                w.cursor = lsn
                continue
            w.add(line, lsn)
            if max_changes is not None and w.total >= max_changes:
                break
        w.flush()
        return w.total
    finally:
        cli.close()
