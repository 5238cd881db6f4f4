"""Shared durable spool writer for the native CDC tailers.

All four tails (Postgres wal2json/pgoutput, MongoDB change streams,
Kafka) follow the same contract: records land as JSON lines in files
published by ATOMIC RENAME, and the cursor file (LSN / resume token /
offset) advances only AFTER the spool file is durable — a crash replays
from the last durable cursor (at-least-once) instead of losing the
acked-but-unspooled tail.

This helper adds the missing piece for large backlogs: CHUNKED flushing.
A tailer draining a corpus-sized backlog must not buffer it in memory —
every `flush_every` records the buffer is published and the cursor
advances, so tailer memory is O(chunk) and progress is durable
incrementally (an interrupted backfill resumes from the last chunk, not
from zero).
"""

from __future__ import annotations

import os
import time


class SpoolWriter:
    def __init__(self, spool_dir: str, prefix: str, cursor_file: str,
                 flush_every: int = 50_000):
        os.makedirs(spool_dir, exist_ok=True)
        self.spool_dir = spool_dir
        self.prefix = prefix
        self.cursor_path = os.path.join(spool_dir, cursor_file)
        self.flush_every = flush_every
        self.buf: list[bytes] = []
        self.cursor: str | None = None
        self.total = 0
        self._seq = 0
        # flush hook: called with the flushed cursor AFTER it is durable
        # (the PG tails ack the server here)
        self.on_flush = None

    def read_cursor(self, default: str = "") -> str:
        if os.path.exists(self.cursor_path):
            with open(self.cursor_path) as f:
                return f.read().strip() or default
        return default

    def add(self, line: bytes, cursor: str | None = None) -> None:
        self.buf.append(line)
        if cursor is not None:
            self.cursor = cursor
        self.total += 1
        if len(self.buf) >= self.flush_every:
            self.flush()

    def flush(self) -> str | None:
        """Publish the buffer as one atomic file, advance the cursor
        durably, fire on_flush. Returns the flushed cursor (or None if
        the buffer was empty)."""
        if not self.buf:
            return None
        self._seq += 1
        stamp = f"{int(time.time() * 1000)}-{self._seq:04d}"
        tmp = os.path.join(self.spool_dir, f".tmp-{stamp}")
        with open(tmp, "wb") as f:
            f.write(b"\n".join(self.buf) + b"\n")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(self.spool_dir,
                                    f"{self.prefix}-{stamp}.jsonl"))
        self.buf = []
        if self.cursor is not None:
            # atomic cursor replace: an in-place write torn by a crash
            # would leave a truncated LSN/offset that BRICKS resume
            # (malformed START_REPLICATION position) instead of replaying
            ctmp = self.cursor_path + ".tmp"
            with open(ctmp, "w") as f:
                f.write(self.cursor)
                f.flush()
                os.fsync(f.fileno())
            os.replace(ctmp, self.cursor_path)
        if self.on_flush is not None and self.cursor is not None:
            self.on_flush(self.cursor)
        return self.cursor
