"""JavaScript UDFs — the reference's Deno-runtime UDF surface
re-expressed (dozer-deno/src/lib.rs, dozer-sql/expression/src/
javascript/udf.rs: a JS function receiving a JSON argument, returning
a JSON value).

Execution model: an Arrow-batched pandas_udf marshals each batch to
JSON and streams it through ONE long-lived Node.js worker process per
Python executor worker (line-delimited JSON framing: one request line
per Arrow batch, one response line back). The worker is spawned
lazily on the first batch and reused for every subsequent batch of
every task in that executor process, so the ~50ms Node startup is
paid once per executor, not once per batch — the same resident-
runtime design as the reference, which keeps one Deno isolate alive
per UDF (dozer-deno/src/runtime.rs). Worker death (crash, OOM, a
thrown JS error) fails the batch loudly with the worker's exit code
and stderr; it is never silently restarted mid-stream.

SECURITY CONTRACT — read before registering untrusted code:
Node's permission model (`--permission` / `--experimental-permission`)
hardens FILESYSTEM, child-process and worker-thread access, but it
does NOT restrict NETWORK egress — Node has no `--allow-net`-style
deny (unlike the reference's embedded Deno, which denies net by
default, dozer-deno/). A JS function running under this flag can
still open sockets and exfiltrate every batch it sees. Therefore ALL
JS UDF registration requires an explicit `trusted_source=True`
opt-in: you are asserting the function source is code you trust with
the data it will process and with outbound network access. The
permission flag is still applied when the local Node supports it
(defense-in-depth for fs), but it is hardening, not a sandbox.

Marshalling contract (JSON both ways):
- scalar columns -> JS number/string/boolean/null
- struct columns -> JS object; array columns -> JS array
- the JS function's return values must round-trip as the declared
  Spark return type (numbers are IEEE doubles in JS — declare
  "double" unless values are exact small integers)
- timestamps/binary are NOT supported (no faithful JSON image);
  convert to ISO strings / base64 in SQL first.
"""

from __future__ import annotations

import functools
import json
import os
import select
import shutil
import subprocess
import tempfile
import threading
import time

import pandas as pd  # module-global: pandas_udf resolves the string
                     # annotations below against this module's globals

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_UNTRUSTED_MSG = (
    "JS UDFs require trusted_source=True. Node's permission model "
    "hardens filesystem/child-process access but does NOT restrict "
    "network egress (there is no --allow-net deny in Node, unlike the "
    "reference's embedded Deno which denies net by default), so an "
    "untrusted function could exfiltrate batch data over a socket even "
    "'sandboxed'. Register only function sources you trust with the "
    "data AND with outbound network access, and assert that with "
    "trusted_source=True."
)

# long-lived worker loop: one JSON-array request per stdin line, one
# JSON-array response per stdout line. A non-function source or a
# thrown user error writes stderr and exits nonzero — the Python side
# surfaces both loudly (exit 3 = not a function, 4 = user fn threw).
_HARNESS = """
'use strict';
const fn = (%s);
if (typeof fn !== 'function') {
  process.stderr.write('js_udf source must evaluate to a function');
  process.exit(3);
}
const rl = require('node:readline').createInterface({ input: process.stdin });
rl.on('line', (line) => {
  let out;
  try {
    const vals = JSON.parse(line);
    out = JSON.stringify(vals.map((v) => {
      const r = fn(v);
      return r === undefined ? null : r;
    }));
  } catch (e) {
    process.stderr.write(String((e && e.stack) || e));
    process.exit(4);
  }
  process.stdout.write(out + '\\n');
});
"""


def _node_binary() -> str:
    node = shutil.which("node")
    if node is None:
        raise RuntimeError(
            "js_udf requires a Node.js runtime on PATH (the reference "
            "embeds Deno; this port shells out to node). Install node, "
            "or express the function as a Python UDF "
            "(functions/udf.register_python_udf) instead."
        )
    return node


@functools.lru_cache(maxsize=1)
def _sandbox_args() -> tuple[str, ...]:
    """Fs/child-process hardening flag for this Node: `--permission`
    (>= 22) or `--experimental-permission` (20/21); empty when
    unsupported. NOT a network sandbox — see the module docstring."""
    node = _node_binary()
    for flag in ("--permission", "--experimental-permission"):
        probe = subprocess.run(
            [node, flag, "-e", "0"],
            capture_output=True, text=True, timeout=60,
        )
        if probe.returncode == 0:
            return (flag,)
    return ()


class _NodeWorker:
    """One resident Node process evaluating a single JS function over
    line-framed JSON batches. stderr goes to a temp file (an unbounded
    pipe could deadlock a chatty function against the 64K pipe buffer);
    it is read back only on death, for the error message."""

    def __init__(self, js_fn_source: str):
        node = _node_binary()
        self._stderr = tempfile.TemporaryFile()
        self.proc = subprocess.Popen(
            [node, *_sandbox_args(), "-e", _HARNESS % js_fn_source],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=self._stderr,
        )
        self._buf = bytearray()
        # serializes the write/select/read framing: run_js_batch is a
        # public primitive, and two threads sharing one worker would
        # otherwise interleave request/response lines and swap results
        self._lock = threading.Lock()

    def _death_error(self) -> RuntimeError:
        self.proc.wait(timeout=10)
        self._stderr.seek(0)
        err = self._stderr.read().decode("utf-8", "replace").strip()
        return RuntimeError(
            f"js_udf worker died (exit {self.proc.returncode}): "
            f"{err[:2000]}"
        )

    def _read_line(self, deadline: float, n_values: int) -> bytes:
        """Read one full response line under the deadline. select() only
        bounds time-to-FIRST-byte, so a worker that writes a partial
        line then hangs (or streams a huge response slowly) must still
        hit the budget: loop select against the remaining deadline,
        draining chunks fd-level until a newline arrives."""
        fd = self.proc.stdout.fileno()
        while True:
            nl = self._buf.find(b"\n")
            if nl >= 0:
                line = bytes(self._buf[:nl])
                del self._buf[: nl + 1]
                return line
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                self.proc.kill()
                raise RuntimeError(
                    f"js_udf worker timed out on a {n_values}-value "
                    f"batch (deadline reached mid-response: "
                    f"{len(self._buf)} bytes buffered, no newline)"
                )
            ready, _, _ = select.select([self.proc.stdout], [], [],
                                        remaining)
            if not ready:
                continue  # re-check the deadline
            chunk = os.read(fd, 1 << 16)
            if not chunk:  # EOF: the worker exited instead of answering
                raise self._death_error()
            self._buf += chunk

    def run(self, values: list, timeout: int) -> list:
        # json.dumps escapes embedded newlines, so one request is
        # always exactly one line
        with self._lock:
            deadline = time.monotonic() + timeout
            try:
                self.proc.stdin.write(
                    (json.dumps(values) + "\n").encode("utf-8"))
                self.proc.stdin.flush()
            except (BrokenPipeError, OSError):
                raise self._death_error() from None
            line = self._read_line(deadline, len(values))
        out = json.loads(line)
        if len(out) != len(values):
            raise RuntimeError(
                f"js_udf returned {len(out)} values for "
                f"{len(values)} inputs"
            )
        return out

    def close(self) -> None:
        try:
            self.proc.kill()
        except OSError:
            pass
        self._stderr.close()


# per-Python-process worker pool (on Spark this is per executor
# python worker — exactly the reuse scope we want). A dead worker is
# evicted so a retried task respawns cleanly.
_WORKERS: dict[str, _NodeWorker] = {}
_WORKERS_LOCK = threading.Lock()


def _worker(js_fn_source: str) -> _NodeWorker:
    with _WORKERS_LOCK:
        w = _WORKERS.get(js_fn_source)
        if w is not None and w.proc.poll() is None:
            return w
        if w is not None:
            w.close()
        w = _NodeWorker(js_fn_source)
        _WORKERS[js_fn_source] = w
        return w


def run_js_batch(js_fn_source: str, values: list, *,
                 timeout: int = 300) -> list:
    """Run the JS function over one JSON batch through the resident
    worker. Low-level primitive: the trust gate lives at registration
    (register_js_udf) — a direct caller owns the trust decision."""
    w = _worker(js_fn_source)
    try:
        return w.run(values, timeout)
    except Exception:
        with _WORKERS_LOCK:
            if _WORKERS.get(js_fn_source) is w:
                del _WORKERS[js_fn_source]
        w.close()
        raise


def _json_safe(v):
    """pandas/arrow scalar -> JSON-serializable (numpy ints/floats keep
    hasattr(.item); NaN -> None)."""
    import numpy as np

    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN
        return None
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return [_json_safe(x) for x in v.tolist()]
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    return v


def register_js_udf(
    spark: SparkSession,
    name: str,
    js_fn_source: str,
    return_type,
    *,
    trusted_source: bool = False,
):
    """Register `name` as a SQL/DataFrame UDF backed by a JS function.

    js_fn_source: a JS function EXPRESSION — e.g. "(v) => v * 2 + 1"
    or "function (row) { return row.a + row.b; }". It receives one
    JSON-decoded argument per row (pass a struct() for multi-arg) and
    its return value becomes the column value.

    trusted_source: REQUIRED opt-in — see the module docstring; Node
    cannot deny network egress, so the function sees the data and the
    network. Registration without it raises.

    Returns the registered UDF (usable directly on Columns too).
    """
    if not trusted_source:
        raise RuntimeError(_UNTRUSTED_MSG)
    # fail at registration, not first batch, when node is missing or
    # the source doesn't evaluate to a function
    run_js_batch(js_fn_source, [])

    @pandas_udf(return_type)
    def runner(col: pd.Series) -> pd.Series:
        # a struct() argument arrives as a pd.DataFrame (one column per
        # field) — marshal it as one JS object per row
        if isinstance(col, pd.DataFrame):
            vals = [_json_safe(r) for r in col.to_dict("records")]
        else:
            vals = [_json_safe(v) for v in col]
        return pd.Series(run_js_batch(js_fn_source, vals), dtype=object)

    spark.udf.register(name, runner)
    return runner
