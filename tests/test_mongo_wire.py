"""Native MongoDB change-stream client: BSON codec unit tests, a fake
OP_MSG wire server e2e (open stream -> getMore -> spool -> changelog ->
snapshot), SCRAM-SHA-256 exchange against a server-side implementation,
resume-token durability, and a SPARK_GRAFT_MONGO_URL live gate."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import socket
import struct
import threading

import pytest

from dozer_spark.sources.bson_codec import (
    Binary, ObjectId, Timestamp, decode_doc, encode_doc, to_jsonable,
)
from dozer_spark.sources.mongo_wire import (
    MongoWireClient, parse_mongo_url, tail_mongo_to_spool,
)

# -- BSON codec --------------------------------------------------------------


def test_bson_roundtrip_scalars():
    doc = {"i32": 7, "i64": 1 << 40, "f": 1.5, "s": "héllo", "b": True,
           "n": None, "sub": {"x": 1}, "arr": [1, "two", None]}
    enc = encode_doc(doc)
    dec, end = decode_doc(enc)
    assert end == len(enc)
    assert dec == doc


def test_bson_special_types():
    raw = encode_doc({
        "oid": ObjectId(bytes(range(12))),
        "ts": Timestamp(1_700_000_000, 5),
        "bin": Binary(0, b"\x01\x02"),
    })
    dec, _ = decode_doc(raw)
    assert dec["oid"].hex == bytes(range(12)).hex()
    assert dec["ts"].seconds == 1_700_000_000 and dec["ts"].ordinal == 5
    j = to_jsonable(dec)
    assert j["ts"] == (1_700_000_000 << 32) | 5
    assert j["bin"] == "0102"


def test_bson_unknown_type_fails_loud():
    # regex element (0x0B) is deliberately unsupported
    bad = b"\x0bre\x00a\x00i\x00"
    raw = struct.pack("<i", len(bad) + 5) + bad + b"\x00"
    with pytest.raises(ValueError, match="unsupported BSON element"):
        decode_doc(raw)


def test_parse_mongo_url():
    cfg = parse_mongo_url("mongodb://u:p@h:27018/mydb")
    assert cfg == {"host": "h", "port": 27018, "user": "u", "password": "p",
                   "db": "mydb"}


# -- fake OP_MSG server ------------------------------------------------------


def _event(kind: str, key: int, doc: dict | None, tok: str, sec: int) -> dict:
    ev = {
        "_id": {"_data": tok},
        "operationType": kind,
        "clusterTime": Timestamp(sec, 1),
        "documentKey": {"_id": key},
        "ns": {"db": "db", "coll": "c"},
    }
    if doc is not None:
        ev["fullDocument"] = doc
    return ev


class FakeMongo(threading.Thread):
    """Speaks enough OP_MSG for the client: hello, aggregate
    ($changeStream), getMore. Batches are handed over per getMore call;
    records any resumeAfter it sees."""

    def __init__(self, batches):
        super().__init__(daemon=True)
        self.batches = list(batches)
        self.resume_after = None
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]

    def _reply(self, conn, req_id, doc):
        body = struct.pack("<I", 0) + b"\x00" + encode_doc(doc)
        conn.sendall(struct.pack("<iiii", 16 + len(body), 1, req_id, 2013) + body)

    def run(self):
        conn, _ = self.srv.accept()
        buf = b""
        try:
            while True:
                while len(buf) < 4:
                    c = conn.recv(65536)
                    if not c:
                        raise ConnectionError
                    buf += c
                (length,) = struct.unpack_from("<i", buf, 0)
                while len(buf) < length:
                    buf += conn.recv(65536)
                msg, buf = buf[:length], buf[length:]
                _l, rid, _rt, _op = struct.unpack_from("<iiii", msg, 0)
                cmd, _ = decode_doc(msg, 21)
                if "hello" in cmd:
                    self._reply(conn, rid, {"ok": 1.0, "maxWireVersion": 17})
                elif "aggregate" in cmd:
                    cs = cmd["pipeline"][0]["$changeStream"]
                    self.resume_after = cs.get("resumeAfter")
                    first = self.batches.pop(0) if self.batches else []
                    self._reply(conn, rid, {
                        "ok": 1.0,
                        "cursor": {"id": 77, "ns": "db.c", "firstBatch": first},
                    })
                elif "getMore" in cmd:
                    nxt = self.batches.pop(0) if self.batches else []
                    cid = 77 if self.batches else 0
                    self._reply(conn, rid, {
                        "ok": 1.0,
                        "cursor": {"id": cid, "ns": "db.c", "nextBatch": nxt},
                    })
                else:
                    self._reply(conn, rid, {"ok": 0.0, "errmsg": "unknown"})
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()
            self.srv.close()


def test_change_stream_e2e_spool_to_snapshot(spark, tmp_path):
    batches = [
        [_event("insert", 1, {"_id": 1, "v": "a"}, "82AA01", 100),
         _event("insert", 2, {"_id": 2, "v": "b"}, "82AA02", 100)],
        [_event("update", 1, {"_id": 1, "v": "a2"}, "82AA03", 101)],
        [_event("delete", 2, None, "82AA04", 102)],
    ]
    srv = FakeMongo(batches)
    srv.start()
    spool = str(tmp_path / "spool")
    n = tail_mongo_to_spool(f"mongodb://127.0.0.1:{srv.port}/db", "c", spool)
    assert n == 4
    # resume token persisted durably
    with open(os.path.join(spool, "_resume_token")) as f:
        assert f.read() == "82AA04"

    from pyspark.sql import types as T

    from dozer_spark.sources.mongo_wire import spool_change_stream_changelog
    from dozer_spark.streaming.changelog import apply_changelog

    doc_schema = T.StructType([
        T.StructField("_id", T.LongType()), T.StructField("v", T.StringType()),
    ])
    cl = spool_change_stream_changelog(spark, spool, doc_schema)
    snap = apply_changelog(cl, ["_id"])
    assert sorted((r._id, r.v) for r in snap.collect()) == [(1, "a2")]


def test_resume_token_sent_on_reopen(tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    with open(os.path.join(spool, "_resume_token"), "w") as f:
        f.write("82FF42")
    srv = FakeMongo([[]])
    srv.start()
    n = tail_mongo_to_spool(f"mongodb://127.0.0.1:{srv.port}/db", "c", spool,
                            idle_rounds=1)
    srv.join(5.0)
    assert n == 0
    assert srv.resume_after == {"_data": "82FF42"}


# -- SCRAM over OP_MSG -------------------------------------------------------


class FakeMongoScram(FakeMongo):
    """Adds a real server-side SCRAM-SHA-256 exchange (fixed salt/4096
    iterations) before serving the stream commands."""

    USER, PASS = "u", "secret"
    SALT, ITERS = b"0123456789abcdef", 4096

    def run(self):
        conn, _ = self.srv.accept()
        buf = b""
        salted = hashlib.pbkdf2_hmac("sha256", self.PASS.encode(),
                                     self.SALT, self.ITERS)

        def read_cmd():
            nonlocal buf
            while len(buf) < 4:
                buf2 = conn.recv(65536)
                if not buf2:
                    raise ConnectionError
                buf += buf2
            (length,) = struct.unpack_from("<i", buf, 0)
            while len(buf) < length:
                buf += conn.recv(65536)
            msg, buf = buf[:length], buf[length:]
            _l, rid, _rt, _op = struct.unpack_from("<iiii", msg, 0)
            return rid, decode_doc(msg, 21)[0]

        try:
            rid, cmd = read_cmd()
            assert "hello" in cmd
            self._reply(conn, rid, {"ok": 1.0})

            rid, cmd = read_cmd()
            assert cmd["mechanism"] == "SCRAM-SHA-256"
            cf = bytes(cmd["payload"].data).decode()
            bare = cf.split(",", 2)[2]
            cnonce = dict(p.split("=", 1) for p in bare.split(","))["r"]
            snonce = cnonce + "SRV"
            server_first = (f"r={snonce},s="
                            f"{base64.b64encode(self.SALT).decode()},"
                            f"i={self.ITERS}")
            self._reply(conn, rid, {
                "ok": 1.0, "conversationId": 1, "done": False,
                "payload": Binary(0, server_first.encode()),
            })

            rid, cmd = read_cmd()
            final = bytes(cmd["payload"].data).decode()
            # verify the client proof
            fp = dict(p.split("=", 1) for p in final.replace("c=biws,", "").split(","))
            auth_msg = ",".join([bare, server_first,
                                 f"c=biws,r={fp['r']}"]).encode()
            client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
            stored = hashlib.sha256(client_key).digest()
            sig = hmac.new(stored, auth_msg, hashlib.sha256).digest()
            expect = base64.b64encode(
                bytes(a ^ b for a, b in zip(client_key, sig))).decode()
            assert fp["p"] == expect, "client proof mismatch"
            server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()
            v = base64.b64encode(
                hmac.new(server_key, auth_msg, hashlib.sha256).digest()).decode()
            self._reply(conn, rid, {
                "ok": 1.0, "conversationId": 1, "done": True,
                "payload": Binary(0, f"v={v}".encode()),
            })

            rid, cmd = read_cmd()
            assert "aggregate" in cmd
            self._reply(conn, rid, {
                "ok": 1.0, "cursor": {"id": 0, "ns": "db.c", "firstBatch": []},
            })
        except (ConnectionError, AssertionError) as e:
            self.error = e
        finally:
            conn.close()
            self.srv.close()


def test_scram_auth_exchange():
    srv = FakeMongoScram([])
    srv.start()
    cli = MongoWireClient("127.0.0.1", srv.port, user="u", password="secret",
                          auth_db="admin").connect()
    cid, first = cli.open_change_stream("db", "c")
    assert cid == 0 and first == []
    cli.close()
    srv.join(5.0)
    assert not hasattr(srv, "error"), getattr(srv, "error", None)


# -- live gate ---------------------------------------------------------------


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_MONGO_URL"),
    reason="needs SPARK_GRAFT_MONGO_URL (live MongoDB replica set)",
)
def test_live_mongo_change_stream(spark, tmp_path):
    url = os.environ["SPARK_GRAFT_MONGO_URL"]
    # live DML via the same wire client (insert/update/delete commands)
    cfg = parse_mongo_url(url)
    db = cfg.pop("db")
    cli = MongoWireClient(**cfg).connect()
    coll = "dozer_spark_live"
    cli.command({"drop": coll, "$db": db})
    spool = str(tmp_path / "spool")
    t = threading.Thread(
        target=tail_mongo_to_spool,
        args=(url, coll, spool), kwargs={"max_events": 3, "idle_rounds": 20},
        daemon=True,
    )
    t.start()
    import time as _t
    _t.sleep(1.0)
    cli.command({"insert": coll, "documents": [{"_id": 1, "v": "a"}], "$db": db})
    cli.command({"update": coll, "updates": [
        {"q": {"_id": 1}, "u": {"$set": {"v": "a2"}}}], "$db": db})
    cli.command({"delete": coll, "deletes": [
        {"q": {"_id": 1}, "limit": 1}], "$db": db})
    t.join(30.0)
    from pyspark.sql import types as T

    from dozer_spark.sources.mongo_wire import spool_change_stream_changelog

    doc_schema = T.StructType([
        T.StructField("_id", T.LongType()), T.StructField("v", T.StringType()),
    ])
    cl = spool_change_stream_changelog(spark, spool, doc_schema)
    assert cl.count() >= 3
    cli.command({"drop": coll, "$db": db})
    cli.close()
