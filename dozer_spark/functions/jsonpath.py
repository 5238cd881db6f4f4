"""JSONPath engine parity for JSON_VALUE / JSON_QUERY.

The reference bundles a jsonpath engine (dozer-sql/jsonpath/, ~1.5k LoC)
and wires it through json_functions.rs:13-118 with these semantics:

- evaluate path -> list of matches (finder.find());
  0 matches -> JSON null; exactly 1 -> that value; n -> array of matches
  (json_functions.rs:96-118 unwraps the single-element find array).
- JSON_VALUE keeps only SCALAR results (string/number/bool); an object/
  array result becomes JSON null (:48-66). A path parse error -> SQL NULL.
- JSON_QUERY keeps only OBJECT/ARRAY results; scalars become JSON null
  (:68-93). One-arg JSON_QUERY(j) == JSON_QUERY(j, '$').

Path subset implemented (the features the reference's test corpus uses —
dozer-sql/src/expression/tests/json_functions.rs): root `$`, dot and
bracket field access, array indexes, wildcard `[*]`/`.*`, recursive
descent `..field` and `..*`. Filters/slices/unions raise -> SQL NULL,
mirroring InvalidJsonPath.

Execution: a vectorized pandas UDF (Arrow batches). The dialect keeps
`get_json_object` (JVM, codegen) for simple scalar paths where the two
agree, and routes wildcard/descent paths plus all JSON_QUERY calls here.
"""

from __future__ import annotations

import json
import re

_TOKEN = re.compile(
    r"""
      \.\.\*                    # ..*
    | \.\.([A-Za-z_][A-Za-z0-9_]*)   # ..field
    | \.\*                      # .*
    | \.([A-Za-z_][A-Za-z0-9_]*)     # .field
    | \[\s*\*\s*\]              # [*]
    | \[\s*(-?\d+)\s*\]         # [idx]
    | \[\s*'([^']*)'\s*\]       # ['field']
    | \[\s*"([^"]*)"\s*\]       # ["field"]
    """,
    re.VERBOSE,
)


def parse_path(path: str) -> list[tuple]:
    path = path.strip()
    if not path.startswith("$"):
        raise ValueError(f"jsonpath must start with $: {path!r}")
    i = 1
    segs: list[tuple] = []
    while i < len(path):
        m = _TOKEN.match(path, i)
        if not m:
            raise ValueError(f"unsupported jsonpath at offset {i}: {path!r}")
        if m.group(0) == "..*":
            segs.append(("descent_wild",))
        elif m.group(1):
            segs.append(("descent_field", m.group(1)))
        elif m.group(0) == ".*" or m.group(0).replace(" ", "") == "[*]":
            segs.append(("wild",))
        elif m.group(2):
            segs.append(("field", m.group(2)))
        elif m.group(3) is not None:
            segs.append(("index", int(m.group(3))))
        elif m.group(4) is not None:
            segs.append(("field", m.group(4)))
        elif m.group(5) is not None:
            segs.append(("field", m.group(5)))
        else:  # pragma: no cover
            raise ValueError(f"unsupported jsonpath token {m.group(0)!r}")
        i = m.end()
    return segs


def _descendants(node):
    """Strict descendants in preorder (the `..*` expansion order the
    reference produces: container elements before their own children)."""
    out = []
    if isinstance(node, dict):
        children = list(node.values())
    elif isinstance(node, list):
        children = node
    else:
        return out
    for c in children:
        out.append(c)
        out.extend(_descendants(c))
    return out


def find(doc, segs: list[tuple]) -> list:
    nodes = [doc]
    for seg in segs:
        nxt = []
        kind = seg[0]
        for n in nodes:
            if kind == "field":
                if isinstance(n, dict) and seg[1] in n:
                    nxt.append(n[seg[1]])
            elif kind == "index":
                if isinstance(n, list) and -len(n) <= seg[1] < len(n):
                    nxt.append(n[seg[1]])
            elif kind == "wild":
                if isinstance(n, dict):
                    nxt.extend(n.values())
                elif isinstance(n, list):
                    nxt.extend(n)
            elif kind == "descent_field":
                for d in [n, *_descendants(n)]:
                    if isinstance(d, dict) and seg[1] in d:
                        nxt.append(d[seg[1]])
            elif kind == "descent_wild":
                nxt.extend(_descendants(n))
        nodes = nxt
    return nodes


def _evaluate(json_text: str | None, path: str):
    """(ok, value): ok=False -> SQL NULL (parse/decode error); value is
    the unwrapped find result, or None for JSON null (no matches)."""
    if json_text is None:
        return True, None
    try:
        segs = parse_path(path)
        doc = json.loads(json_text)
    except ValueError:
        return False, None
    matches = find(doc, segs)
    if not matches:
        return True, None
    if len(matches) == 1:
        return True, matches[0]
    return True, matches


def json_value_str(json_text: str | None, path: str) -> str | None:
    """JSON_VALUE as a string column: scalars rendered like
    get_json_object (strings unquoted, numbers/bools as JSON); non-scalar
    or no match -> NULL (the Json-null/SQL-null distinction collapses in
    a string column, documented)."""
    ok, v = _evaluate(json_text, path)
    if not ok or v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, (bool, int, float)):
        return json.dumps(v)
    return None  # object/array -> JSON null


def json_query_str(json_text: str | None, path: str = "$") -> str | None:
    """JSON_QUERY as a string column: compact-JSON objects/arrays;
    scalar results or no match -> NULL."""
    ok, v = _evaluate(json_text, path)
    if not ok or v is None:
        return None
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    return None


def ensure_json_udfs(spark) -> None:
    """Register json_value_full / json_query_full for SQL use. Plain
    Python UDFs are fine here: the engine routes only wildcard/descent
    paths through them; hot simple paths stay on get_json_object (JVM).

    Registration is UNCONDITIONAL: spark.udf.register is idempotent, and
    memoizing by id(spark) was unsound — a garbage-collected session's id
    can be reused by a new SparkSession, silently skipping registration
    there and failing analysis of json_*_full calls."""
    from pyspark.sql import types as T

    spark.udf.register("json_value_full", json_value_str, T.StringType())
    spark.udf.register("json_query_full", json_query_str, T.StringType())
