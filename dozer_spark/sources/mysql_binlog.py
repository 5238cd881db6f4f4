"""Native MySQL binlog client — pure stdlib, no mysql driver.

The reference's MySQL connector tails the binary log itself
(dozer-ingestion/src/lib.rs:138-145, dozer-ingestion/mysql/). This is
the transport half for Spark: a minimal client-protocol implementation
(handshake + mysql_native_password auth, COM_QUERY for setup,
COM_BINLOG_DUMP) plus a ROW-format binlog event decoder for the common
column types, emitting the same changelog JSON lines the wal2json spool
uses — so the downstream path (file source -> changelog -> operators)
is shared, only the transport differs.

Everything protocol-level is unit-tested with byte fixtures
(tests/test_mysql_binlog.py); the live end-to-end test gates on
SPARK_GRAFT_MYSQL_URL (server with binlog_format=ROW).

Decoder scope: TABLE_MAP + WRITE/UPDATE/DELETE_ROWS v1/v2 events for
NULL-bitmap rows of {TINY, SHORT, INT24, LONG, LONGLONG, FLOAT, DOUBLE,
VARCHAR/VAR_STRING, STRING, BLOB/TEXT, DATE, DATETIME2, NEWDECIMAL-as-
string}. Exotic types raise loudly rather than decode wrong.
"""

from __future__ import annotations

import hashlib
import socket
import struct

# -- packet framing ----------------------------------------------------------


def read_packet(recv) -> bytes:
    """MySQL packet: 3-byte LE length + 1-byte sequence + payload."""
    head = recv(4)
    ln = head[0] | (head[1] << 8) | (head[2] << 16)
    return recv(ln)


def write_packet(sock: socket.socket, payload: bytes, seq: int) -> None:
    ln = len(payload)
    sock.sendall(bytes([ln & 0xFF, (ln >> 8) & 0xFF, (ln >> 16) & 0xFF, seq])
                 + payload)


def lenenc_int(b: bytes, i: int) -> tuple[int, int]:
    """Length-encoded integer at offset i -> (value, next offset)."""
    v = b[i]
    if v < 0xFB:
        return v, i + 1
    if v == 0xFC:
        return struct.unpack_from("<H", b, i + 1)[0], i + 3
    if v == 0xFD:
        return b[i + 1] | (b[i + 2] << 8) | (b[i + 3] << 16), i + 4
    if v == 0xFE:
        return struct.unpack_from("<Q", b, i + 1)[0], i + 9
    raise ValueError(f"bad lenenc prefix {v:#x}")


# -- auth --------------------------------------------------------------------


def native_password_scramble(password: str, nonce: bytes) -> bytes:
    """mysql_native_password: SHA1(pwd) XOR SHA1(nonce + SHA1(SHA1(pwd)))."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(nonce + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def parse_handshake(payload: bytes) -> dict:
    """Initial handshake v10: server version, thread id, 20-byte nonce
    (split 8 + 12), capability flags."""
    i = 1  # protocol version byte (10)
    end = payload.index(b"\x00", i)
    version = payload[i:end].decode()
    i = end + 1
    thread_id = struct.unpack_from("<I", payload, i)[0]
    i += 4
    nonce1 = payload[i:i + 8]
    i += 8 + 1  # filler
    cap_lo = struct.unpack_from("<H", payload, i)[0]
    i += 2
    i += 1 + 2  # charset + status
    cap_hi = struct.unpack_from("<H", payload, i)[0]
    i += 2
    auth_len = payload[i]
    i += 1 + 10  # reserved
    nonce2 = payload[i:i + max(13, auth_len - 8) - 1]
    return {
        "version": version, "thread_id": thread_id,
        "nonce": nonce1 + nonce2[:12],
        "capabilities": cap_lo | (cap_hi << 16),
    }


CLIENT_LONG_PASSWORD = 0x1
CLIENT_PROTOCOL_41 = 0x200
CLIENT_SECURE_CONNECTION = 0x8000
CLIENT_PLUGIN_AUTH = 0x80000


def build_handshake_response(user: str, password: str, nonce: bytes,
                             database: str | None = None) -> bytes:
    caps = (CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41
            | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH)
    if database:
        caps |= 0x8  # CLIENT_CONNECT_WITH_DB
    scr = native_password_scramble(password, nonce)
    out = struct.pack("<IIB23x", caps, 1 << 24, 33)  # max packet, utf8
    out += user.encode() + b"\x00"
    out += bytes([len(scr)]) + scr
    if database:
        out += database.encode() + b"\x00"
    out += b"mysql_native_password\x00"
    return out


# -- binlog event decoding ----------------------------------------------------

# column type constants (public protocol)
T_TINY, T_SHORT, T_LONG, T_FLOAT, T_DOUBLE = 1, 2, 3, 4, 5
T_LONGLONG, T_INT24, T_DATE = 8, 9, 10
T_DATETIME2, T_NEWDECIMAL = 18, 246
T_VARCHAR, T_BLOB, T_VAR_STRING, T_STRING = 15, 252, 253, 254

EV_FORMAT_DESCRIPTION = 15
EV_TABLE_MAP = 19
EV_WRITE_ROWS_V1, EV_UPDATE_ROWS_V1, EV_DELETE_ROWS_V1 = 23, 24, 25
EV_WRITE_ROWS_V2, EV_UPDATE_ROWS_V2, EV_DELETE_ROWS_V2 = 30, 31, 32


class TableMap:
    def __init__(self, table_id: int, schema: str, table: str,
                 col_types: list[int], col_meta: list[int]):
        self.table_id = table_id
        self.schema = schema
        self.table = table
        self.col_types = col_types
        self.col_meta = col_meta


def parse_table_map(body: bytes) -> TableMap:
    """TABLE_MAP event body (post-header included)."""
    table_id = int.from_bytes(body[0:6], "little")
    i = 6 + 2  # flags
    slen = body[i]
    schema = body[i + 1:i + 1 + slen].decode()
    i += 1 + slen + 1
    tlen = body[i]
    table = body[i + 1:i + 1 + tlen].decode()
    i += 1 + tlen + 1
    ncols, i = lenenc_int(body, i)
    col_types = list(body[i:i + ncols])
    i += ncols
    meta_len, i = lenenc_int(body, i)
    meta_blob = body[i:i + meta_len]
    col_meta, j = [], 0
    for t in col_types:
        if t in (T_VARCHAR, T_VAR_STRING):
            col_meta.append(struct.unpack_from("<H", meta_blob, j)[0])
            j += 2
        elif t == T_STRING:
            col_meta.append((meta_blob[j] << 8) | meta_blob[j + 1])
            j += 2
        elif t == T_BLOB:
            col_meta.append(meta_blob[j])
            j += 1
        elif t in (T_FLOAT, T_DOUBLE):
            col_meta.append(meta_blob[j])
            j += 1
        elif t == T_NEWDECIMAL:
            col_meta.append((meta_blob[j] << 8) | meta_blob[j + 1])
            j += 2
        elif t == T_DATETIME2:
            col_meta.append(meta_blob[j])
            j += 1
        else:
            col_meta.append(0)
    return TableMap(table_id, schema, table, col_types, col_meta)


def _decode_value(t: int, meta: int, b: bytes, i: int):
    """One column value at offset i -> (python value, next offset)."""
    if t == T_TINY:
        return struct.unpack_from("<b", b, i)[0], i + 1
    if t == T_SHORT:
        return struct.unpack_from("<h", b, i)[0], i + 2
    if t == T_INT24:
        v = b[i] | (b[i + 1] << 8) | (b[i + 2] << 16)
        if v >= 1 << 23:
            v -= 1 << 24
        return v, i + 3
    if t == T_LONG:
        return struct.unpack_from("<i", b, i)[0], i + 4
    if t == T_LONGLONG:
        return struct.unpack_from("<q", b, i)[0], i + 8
    if t == T_FLOAT:
        return struct.unpack_from("<f", b, i)[0], i + 4
    if t == T_DOUBLE:
        return struct.unpack_from("<d", b, i)[0], i + 8
    if t in (T_VARCHAR, T_VAR_STRING) or (t == T_STRING and meta == 0):
        if t in (T_VARCHAR, T_VAR_STRING) and meta > 255:
            ln = struct.unpack_from("<H", b, i)[0]
            i += 2
        else:
            ln = b[i]
            i += 1
        return b[i:i + ln].decode("utf-8", "replace"), i + ln
    if t == T_STRING:
        # meta byte0 packs the real type and the high bits of the max
        # length: max_len = ((byte0 & 0x30) ^ 0x30) << 4 | byte1. CHAR
        # columns over 255 bytes use a 2-byte length prefix.
        b0, b1 = meta >> 8, meta & 0xFF
        max_len = (((b0 & 0x30) ^ 0x30) << 4) | b1 if b0 else b1
        if max_len > 255:
            ln = struct.unpack_from("<H", b, i)[0]
            i += 2
        else:
            ln = b[i]
            i += 1
        return b[i:i + ln].decode("utf-8", "replace"), i + ln
    if t == T_BLOB:
        ln = int.from_bytes(b[i:i + meta], "little")
        i += meta
        return b[i:i + ln].decode("utf-8", "replace"), i + ln
    if t == T_DATE:
        v = b[i] | (b[i + 1] << 8) | (b[i + 2] << 16)
        d, m, y = v & 0x1F, (v >> 5) & 0xF, v >> 9
        return f"{y:04d}-{m:02d}-{d:02d}", i + 3
    if t == T_DATETIME2:
        # 5-byte big-endian packed (+ fractional, meta digits)
        raw = int.from_bytes(b[i:i + 5], "big") - 0x8000000000
        frac_bytes = (meta + 1) // 2
        i += 5 + frac_bytes
        ym = (raw >> 22) & 0x1FFFF
        y, mo = divmod(ym, 13)
        day = (raw >> 17) & 0x1F
        h = (raw >> 12) & 0x1F
        mi = (raw >> 6) & 0x3F
        s = raw & 0x3F
        return f"{y:04d}-{mo:02d}-{day:02d} {h:02d}:{mi:02d}:{s:02d}", i
    if t == T_NEWDECIMAL:
        precision, scale = meta >> 8, meta & 0xFF
        s, nxt = decode_newdecimal(b, i, precision, scale)
        return s, nxt
    raise NotImplementedError(f"unsupported column type {t}")


# bytes needed for a partial group of N leading/trailing decimal digits
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def decode_newdecimal(b: bytes, i: int, precision: int, scale: int
                      ) -> tuple[str, int]:
    """MySQL packed DECIMAL: big-endian groups of 9 digits per 4 bytes,
    partial groups in _DIG2BYTES[n] bytes, sign in the first bit
    (0 = negative, all bytes complemented). Returns the exact decimal
    STRING (no float roundtrip). Reference vector from the public
    internals docs: DECIMAL(14,4) 1234567890.1234 <->
    81 0D FB 38 D2 04 D2."""
    intg = precision - scale
    intg0, intgx = divmod(intg, 9)
    frac0, fracx = divmod(scale, 9)
    total = intg0 * 4 + _DIG2BYTES[intgx] + frac0 * 4 + _DIG2BYTES[fracx]
    raw = bytearray(b[i:i + total])
    negative = not (raw[0] & 0x80)
    raw[0] ^= 0x80
    if negative:
        raw = bytearray(x ^ 0xFF for x in raw)
    pos = 0
    int_digits = ""
    if intgx:
        n = _DIG2BYTES[intgx]
        int_digits += str(int.from_bytes(raw[pos:pos + n], "big"))
        pos += n
    for _ in range(intg0):
        g = int.from_bytes(raw[pos:pos + 4], "big")
        int_digits += f"{g:09d}" if int_digits else str(g)
        pos += 4
    frac_digits = ""
    for _ in range(frac0):
        frac_digits += f"{int.from_bytes(raw[pos:pos + 4], 'big'):09d}"
        pos += 4
    if fracx:
        n = _DIG2BYTES[fracx]
        frac_digits += f"{int.from_bytes(raw[pos:pos + n], 'big'):0{fracx}d}"
        pos += n
    out = (int_digits or "0").lstrip("0") or "0"
    if frac_digits:
        out += "." + frac_digits
    if negative and (out.strip("0.") != ""):
        out = "-" + out
    return out, i + total


def parse_rows_event(body: bytes, tmap: TableMap, event_type: int) -> list[dict]:
    """WRITE/UPDATE/DELETE_ROWS v1/v2 -> [{'op', 'before'?, 'after'?}]."""
    i = 6 + 2  # table id + flags
    if event_type in (EV_WRITE_ROWS_V2, EV_UPDATE_ROWS_V2, EV_DELETE_ROWS_V2):
        extra_len = struct.unpack_from("<H", body, i)[0]
        i += extra_len  # includes the 2 length bytes
    ncols, i = lenenc_int(body, i)
    bm_len = (ncols + 7) // 8
    i += bm_len  # columns-present bitmap 1 (assume all set)
    is_update = event_type in (EV_UPDATE_ROWS_V1, EV_UPDATE_ROWS_V2)
    if is_update:
        i += bm_len  # columns-present bitmap 2

    def read_row(i: int) -> tuple[dict, int]:
        null_bm = body[i:i + bm_len]
        i += bm_len
        vals = {}
        for c in range(ncols):
            if null_bm[c // 8] & (1 << (c % 8)):
                vals[c] = None
            else:
                vals[c], i = _decode_value(
                    tmap.col_types[c], tmap.col_meta[c], body, i)
        return vals, i

    out = []
    while i < len(body):
        row, i = read_row(i)
        if is_update:
            after, i = read_row(i)
            out.append({"op": "U", "before": row, "after": after})
        elif event_type in (EV_WRITE_ROWS_V1, EV_WRITE_ROWS_V2):
            out.append({"op": "I", "after": row})
        else:
            out.append({"op": "D", "before": row})
    return out


def rows_to_changelog_records(events: list[dict], tmap: TableMap,
                              col_names: list[str], txid: int,
                              seq_start: int = 0) -> list[dict]:
    """Decoded row events -> wal2json-v2-shaped records, so the SAME
    spool/parse path as Postgres serves MySQL (one transport, one
    downstream). A PK-changing UPDATE is handled downstream by
    wal2json_changelog's identity split."""
    recs = []
    seq = seq_start
    for ev in events:
        if ev["op"] == "I":
            recs.append({
                "action": "I", "table": tmap.table, "xid": txid,
                "lsn": f"0/{seq:X}",
                "columns": [{"name": col_names[c], "type": "",
                             "value": None if v is None else str(v)}
                            for c, v in sorted(ev["after"].items())],
            })
        elif ev["op"] == "U":
            recs.append({
                "action": "U", "table": tmap.table, "xid": txid,
                "lsn": f"0/{seq:X}",
                "columns": [{"name": col_names[c], "type": "",
                             "value": None if v is None else str(v)}
                            for c, v in sorted(ev["after"].items())],
                "identity": [{"name": col_names[c],
                              "value": None if v is None else str(v)}
                             for c, v in sorted(ev["before"].items())],
            })
        else:
            recs.append({
                "action": "D", "table": tmap.table, "xid": txid,
                "lsn": f"0/{seq:X}",
                "identity": [{"name": col_names[c],
                              "value": None if v is None else str(v)}
                             for c, v in sorted(ev["before"].items())],
            })
        seq += 1
    return recs


# -- the client --------------------------------------------------------------


class MySQLBinlogClient:
    """Connect, authenticate (mysql_native_password), run setup queries,
    and tail the binlog (COM_BINLOG_DUMP) decoding ROW events."""

    def __init__(self, host: str, port: int, user: str, password: str,
                 server_id: int = 12345, timeout: float = 10.0):
        self.host, self.port = host, port
        self.user, self.password = user, password
        self.server_id = server_id
        self.timeout = timeout
        self.sock: socket.socket | None = None
        self._buf = b""

    def _recv(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def connect(self) -> "MySQLBinlogClient":
        self.sock = socket.create_connection((self.host, self.port),
                                             timeout=self.timeout)
        hs = parse_handshake(read_packet(self._recv))
        resp = build_handshake_response(self.user, self.password, hs["nonce"])
        write_packet(self.sock, resp, 1)
        reply = read_packet(self._recv)
        if reply[0] == 0xFF:
            code = struct.unpack_from("<H", reply, 1)[0]
            raise RuntimeError(f"auth failed ({code}): "
                               f"{reply[9:].decode('utf-8', 'replace')}")
        if reply[0] == 0xFE:  # AuthSwitchRequest (e.g. caching_sha2_password)
            plugin = reply[1:reply.index(b"\x00", 1)].decode("utf-8", "replace")
            raise RuntimeError(
                f"server requires auth plugin {plugin!r}; only "
                "mysql_native_password is implemented - create the "
                "replication user WITH mysql_native_password"
            )
        return self

    def query(self, sql: str) -> None:
        """Fire-and-check COM_QUERY (setup statements; no result rows)."""
        write_packet(self.sock, b"\x03" + sql.encode(), 0)
        reply = read_packet(self._recv)
        if reply[0] == 0xFF:
            raise RuntimeError(f"query error: {reply[9:].decode('utf-8', 'replace')}")
        # drain any result set until EOF/OK
        while reply[0] not in (0x00, 0xFE):
            reply = read_packet(self._recv)
            if reply[0] == 0xFF:
                raise RuntimeError("query error in result stream")

    def binlog_dump(self, filename: str, position: int = 4):
        """COM_BINLOG_DUMP generator yielding (event_type, event_body)
        with any CRC32 checksum trailer STRIPPED. Caller tracks
        TableMaps and decodes rows events.

        binlog_checksum=CRC32 is the server default since 5.6.6 and the
        dump thread sends logged events WITH their stored 4-byte
        trailer; setting @master_binlog_checksum only declares that this
        client can handle them. The FORMAT_DESCRIPTION event announces
        the algorithm (its last 5 bytes are alg + its own CRC), and
        every subsequent event is trimmed accordingly — without this,
        the rows decoder would misparse the trailer as another row.
        """
        self.query("SET @master_binlog_checksum = @@global.binlog_checksum")
        payload = (b"\x12" + struct.pack("<IHI", position, 0, self.server_id)
                   + filename.encode())
        write_packet(self.sock, payload, 0)
        checksum_len = 0
        while True:
            pkt = read_packet(self._recv)
            if pkt[0] == 0xFF:
                raise RuntimeError("binlog dump error")
            if pkt[0] == 0xFE and len(pkt) < 9:
                return  # EOF
            ev = pkt[1:]  # strip OK byte
            event_type = ev[4]
            body = ev[19:]  # common header is 19 bytes
            if event_type == EV_FORMAT_DESCRIPTION and len(body) >= 5:
                alg = body[-5]
                checksum_len = 4 if alg == 1 else 0
                if checksum_len:  # the FDE carries its own trailer too
                    body = body[:-5] + body[-5:-4]  # keep alg byte, drop CRC
            elif checksum_len:
                body = body[:-checksum_len]
            yield event_type, body

    def close(self) -> None:
        if self.sock is not None:
            try:
                write_packet(self.sock, b"\x01", 0)  # COM_QUIT
            except OSError:
                pass
            self.sock.close()
            self.sock = None
