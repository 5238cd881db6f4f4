"""Push-ingest endpoint: Arrow IPC over TCP -> parquet spool -> Spark.

The reference exposes a gRPC ingest service with default and Arrow
adapters (dozer-ingestion/src/lib.rs:77-97): external producers PUSH
rows into the pipeline. The Spark-native equivalent of that contract:

- `ArrowIngestServer` accepts TCP connections; each connection carries
  one Arrow IPC stream (the same wire format the reference's Arrow
  adapter uses). Record batches are landed as parquet files in a spool
  directory via write-then-atomic-rename, so a file is visible only
  complete.
- Consumers read the spool with Spark's file source — batch
  (`spark.read.parquet`) or incremental (`spark.readStream.parquet`,
  exactly-once via checkpointLocation). File-arrival IS the
  notification; no custom receiver needed, and the spool is durable
  (a crashed consumer replays it).
- `send_arrow` is the client half (producer SDK): any Arrow-capable
  client in any language can push with stock libraries — same claim the
  reference's Arrow adapter makes.

pyarrow-only (no grpc dependency in the container); swapping the socket
for a grpc stream changes transport, not the landing contract.
"""

from __future__ import annotations

import os
import socket
import threading
import uuid


class ArrowIngestServer:
    """Accepts Arrow IPC streams over TCP and spools them as parquet."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(16)
        self.host, self.port = self._sock.getsockname()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.batches_landed = 0

    # -- lifecycle -----------------------------------------------------------

    def start(self) -> "ArrowIngestServer":
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        try:  # unblock accept()
            socket.create_connection((self.host, self.port), timeout=1).close()
        except OSError:
            pass
        if self._thread is not None:
            self._thread.join(timeout=5)
        self._sock.close()

    # -- server --------------------------------------------------------------

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            if self._stop.is_set():
                conn.close()
                return
            # one thread per producer connection (the reference runs its
            # ingest service on a shared async runtime; the work here is
            # IO-bound landing, threads are fine)
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    def _handle(self, conn: socket.socket) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            with conn, pa.ipc.open_stream(conn.makefile("rb")) as reader:
                for batch in reader:
                    table = pa.Table.from_batches([batch])
                    name = f"batch-{uuid.uuid4().hex}.parquet"
                    tmp = os.path.join(self.spool_dir, f".{name}.tmp")
                    pq.write_table(table, tmp)
                    # atomic: the file source never sees partial files
                    os.replace(tmp, os.path.join(self.spool_dir, name))
                    self.batches_landed += 1
        except Exception:  # noqa: BLE001 — a dead producer must not kill the server
            return


def send_arrow(host: str, port: int, table) -> None:
    """Client half: push a pyarrow Table as one Arrow IPC stream."""
    import pyarrow as pa

    with socket.create_connection((host, port)) as s:
        sink = s.makefile("wb")
        with pa.ipc.new_stream(sink, table.schema) as writer:
            for batch in table.to_batches():
                writer.write_batch(batch)
        sink.flush()
