"""JavaScript UDFs — the reference's Deno-runtime UDF surface
re-expressed (dozer-deno/src/lib.rs, dozer-sql/expression/src/
javascript/udf.rs: a JS function receiving a JSON argument, returning
a JSON value).

Execution model: an Arrow-batched pandas_udf marshals each batch to
JSON and runs it through ONE Node.js subprocess invocation (`node -e`
with a fixed harness that maps the user function over the batch
array). The subprocess spawn (~50ms) is amortized over the whole
Arrow batch (spark.sql.execution.arrow.maxRecordsPerBatch values per
roundtrip), so per-row overhead is microseconds — the same
batch-boundary design as the reference, which also crosses the
engine/JS boundary per value batch via serde_json.

Sandboxing: the reference embeds Deno, which denies fs/net by
default. Node does NOT — `node --permission` (no fs/net grants) is
applied when the local Node supports it (>= 20); on older runtimes
the UDF runs unsandboxed and registration requires
allow_unsandboxed=True so untrusted-code deployments fail loudly
instead of silently escalating.

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
import shutil
import subprocess

import pandas as pd  # module-global: pandas_udf resolves the string
                     # annotations below against this module's globals

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

# maps the user function over one JSON batch from stdin to stdout;
# errors propagate as a nonzero exit + stderr message
_HARNESS = """
'use strict';
const chunks = [];
process.stdin.on('data', (d) => chunks.push(d));
process.stdin.on('end', () => {
  const vals = JSON.parse(Buffer.concat(chunks).toString('utf8'));
  const fn = (%s);
  if (typeof fn !== 'function') {
    process.stderr.write('js_udf source must evaluate to a function');
    process.exit(3);
  }
  const out = vals.map((v) => {
    const r = fn(v);
    return r === undefined ? null : r;
  });
  process.stdout.write(JSON.stringify(out));
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
    """Deny-all permission flag for this Node: `--permission` (>= 22)
    or `--experimental-permission` (20/21); empty when unsupported."""
    node = _node_binary()
    for flag in ("--permission", "--experimental-permission"):
        probe = subprocess.run(
            [node, flag, "-e", "0"],
            capture_output=True, text=True, timeout=60,
        )
        if probe.returncode == 0:
            return (flag,)
    return ()


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


def run_js_batch(js_fn_source: str, values: list, *,
                 allow_unsandboxed: bool = False,
                 timeout: int = 300) -> list:
    """Run the JS function over one JSON batch in a node subprocess."""
    node = _node_binary()
    sandbox = _sandbox_args()
    if not sandbox and not allow_unsandboxed:
        raise RuntimeError(
            "this Node runtime lacks --permission sandboxing; pass "
            "allow_unsandboxed=True to run JS UDFs anyway (only with "
            "trusted function sources)"
        )
    proc = subprocess.run(
        [node, *sandbox, "-e", _HARNESS % js_fn_source],
        input=json.dumps(values), capture_output=True, text=True,
        timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"js_udf failed (exit {proc.returncode}): "
            f"{proc.stderr.strip()[:2000]}"
        )
    out = json.loads(proc.stdout)
    if len(out) != len(values):
        raise RuntimeError(
            f"js_udf returned {len(out)} values for {len(values)} inputs"
        )
    return out


def register_js_udf(
    spark: SparkSession,
    name: str,
    js_fn_source: str,
    return_type,
    allow_unsandboxed: bool = False,
):
    """Register `name` as a SQL/DataFrame UDF backed by a JS function.

    js_fn_source: a JS function EXPRESSION — e.g. "(v) => v * 2 + 1"
    or "function (row) { return row.a + row.b; }". It receives one
    JSON-decoded argument per row (pass a struct() for multi-arg) and
    its return value becomes the column value.

    Returns the registered UDF (usable directly on Columns too).
    """
    # fail at registration, not first batch, when node is missing or
    # the sandbox contract can't be met
    run_js_batch(js_fn_source, [], allow_unsandboxed=allow_unsandboxed)

    @pandas_udf(return_type)
    def runner(col: pd.Series) -> pd.Series:
        # a struct() argument arrives as a pd.DataFrame (one column per
        # field) — marshal it as one JS object per row
        if isinstance(col, pd.DataFrame):
            vals = [_json_safe(r) for r in col.to_dict("records")]
        else:
            vals = [_json_safe(v) for v in col]
        return pd.Series(
            run_js_batch(js_fn_source, vals,
                         allow_unsandboxed=allow_unsandboxed),
            dtype=object,
        )

    spark.udf.register(name, runner)
    return runner
