"""dozer SQL dialect rewrites.

What needs translating (everything else is valid Spark SQL already —
NVL/DECODE/COALESCE/NULLIF/CHR/SUBSTR/REPLACE/TRIM/LIKE/EXTRACT/CAST/CASE
are native Spark SQL functions):

- `INTO name` at top level (dozer-sql/src/builder/mod.rs:336-358): names
  the output table; split off and returned to the caller.
- Table operators in FROM (builder/table_operator.rs:94-177):
  TUMBLE(src, ts, 'iv'), HOP(src, ts, 'hop', 'iv'), TTL(src, ts, 'iv'),
  arbitrarily nested. Rewritten to pre-built temp views by pipeline.py.
- UCASE(x) -> upper(x) (scalar/string.rs:25-40).
- MIN_VALUE(m, r) -> min_by(r, m), MAX_VALUE -> max_by
  (execution.rs:1047-1139 — note the argument swap).
- TO_CHAR(ts, 'strftime') -> date_format(ts, 'java pattern')
  (scalar/string.rs:244-331).
- JSON_VALUE/JSON_QUERY(j, 'path') -> get_json_object(j, '$normalized')
  (json_functions.rs:13-118).

Parsing approach: a balanced-paren function-call scanner (the dialect
surface is small enough that a full SQL grammar is not warranted; the
scanner respects string literals and nesting).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from dozer_spark.functions.scalar import strftime_to_java

_INTO_RE = re.compile(r"\bINTO\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$", re.IGNORECASE)


def split_into(sql: str) -> tuple[str, str | None]:
    """Strip a trailing `INTO name`; return (sql_without_into, name|None)."""
    m = _INTO_RE.search(sql)
    if not m:
        return sql, None
    return sql[: m.start()].rstrip(), m.group(1)


@dataclass
class FuncCall:
    name: str
    args: list[str]
    start: int  # offset of name start in the source
    end: int  # offset just past the closing paren


def _scan_call(sql: str, at: int) -> FuncCall | None:
    """Parse a function call starting at `at` (name position). Returns the
    call with raw-arg strings split at top-level commas."""
    m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", sql[at:])
    if not m:
        return None
    name = m.group(0)
    i = at + len(name)
    while i < len(sql) and sql[i].isspace():
        i += 1
    if i >= len(sql) or sql[i] != "(":
        return None
    depth = 0
    args: list[str] = []
    buf: list[str] = []
    in_str: str | None = None
    j = i
    while j < len(sql):
        ch = sql[j]
        if in_str:
            buf.append(ch)
            if ch == in_str:
                in_str = None
            j += 1
            continue
        if ch in ("'", '"'):
            in_str = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            if depth > 1:
                buf.append(ch)
        elif ch == ")":
            depth -= 1
            if depth == 0:
                arg = "".join(buf).strip()
                if arg:
                    args.append(arg)
                return FuncCall(name, args, at, j + 1)
            buf.append(ch)
        elif ch == "," and depth == 1:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        j += 1
    raise ValueError(f"unbalanced parens in SQL near offset {at}: {sql[at:at+60]!r}")


def find_calls(sql: str, names: set[str]) -> list[FuncCall]:
    """All top-level-visible calls to `names` (case-insensitive), left to
    right, skipping string literals."""
    out = []
    i = 0
    upper = sql.upper()
    unames = {n.upper() for n in names}
    while i < len(sql):
        ch = sql[i]
        if ch in ("'", '"'):
            q = ch
            i += 1
            while i < len(sql) and sql[i] != q:
                i += 1
            i += 1
            continue
        if ch.isalpha() or ch == "_":
            m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", sql[i:])
            word = m.group(0)
            if word.upper() in unames:
                call = _scan_call(sql, i)
                if call is not None:
                    out.append(call)
                    i = call.end
                    continue
            i += len(word)
            continue
        i += 1
    return out


def _strip_quotes(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ("'", '"'):
        return s[1:-1]
    return s


def rewrite_functions(sql: str) -> str:
    """Apply scalar-function spelling rewrites (repeatedly, innermost-out)."""
    changed = True
    while changed:
        changed = False
        calls = find_calls(sql, {"UCASE", "MIN_VALUE", "MAX_VALUE", "TO_CHAR",
                                 "JSON_VALUE", "JSON_QUERY",
                                 "MIN_APPEND_ONLY", "MAX_APPEND_ONLY"})
        for call in reversed(calls):  # right-to-left keeps earlier offsets valid
            name = call.name.upper()
            if name == "UCASE" and len(call.args) == 1:
                repl = f"upper({call.args[0]})"
            elif name in ("MIN_APPEND_ONLY", "MAX_APPEND_ONLY") and len(call.args) == 1:
                # append-only aggregators are a state-size optimization in
                # the reference (aggregation/{min,max}_append_only.rs);
                # batch results are identical to MIN/MAX
                repl = f"{name[:3].lower()}({call.args[0]})"
            elif name in ("MIN_VALUE", "MAX_VALUE") and len(call.args) == 2:
                fn = "min_by" if name == "MIN_VALUE" else "max_by"
                # dozer: MIN_VALUE(measure, returned); spark: min_by(returned, measure)
                repl = f"{fn}({call.args[1]}, {call.args[0]})"
            elif name == "TO_CHAR" and len(call.args) == 2:
                fmt = strftime_to_java(_strip_quotes(call.args[1]))
                repl = f"date_format({call.args[0]}, '{fmt}')"
            elif name in ("JSON_VALUE", "JSON_QUERY") and len(call.args) in (1, 2):
                path = _strip_quotes(call.args[1]) if len(call.args) == 2 else "$"
                if not path.startswith("$"):
                    path = "$." + path
                complex_path = "*" in path or ".." in path
                if name == "JSON_QUERY":
                    # JSON_QUERY semantics (object/array only, scalar ->
                    # NULL, single-match unwrap: json_functions.rs:68-93)
                    # need the full engine (functions/jsonpath.py)
                    repl = f"json_query_full({call.args[0]}, '{path}')"
                elif complex_path:
                    repl = f"json_value_full({call.args[0]}, '{path}')"
                else:
                    # simple scalar path: get_json_object matches the
                    # reference's JSON_VALUE and stays JVM-side
                    repl = f"get_json_object({call.args[0]}, '{path}')"
            else:
                continue
            sql = sql[: call.start] + repl + sql[call.end :]
            changed = True
    return sql


TABLE_OPERATORS = {"TUMBLE", "HOP", "TTL"}


@dataclass
class TableOp:
    """A (possibly nested) FROM-clause table operator chain, innermost
    source first: e.g. TTL(TUMBLE(events, ts, '5 MINUTES'), ts, '1 MINUTE')
    -> source='events', ops=[('tumble', ts, '5 MINUTES'), ('ttl', ...)]."""

    source: str
    ops: list[tuple]  # ('tumble', ts, iv) | ('hop', ts, hop, iv) | ('ttl', ts, iv)
    start: int
    end: int


def parse_table_op(sql: str, call: FuncCall) -> TableOp:
    name = call.name.upper()
    if name == "TUMBLE":
        src_arg, ts, iv = call.args
        op = ("tumble", ts.strip(), _strip_quotes(iv))
    elif name == "HOP":
        src_arg, ts, hop_iv, iv = call.args
        op = ("hop", ts.strip(), _strip_quotes(hop_iv), _strip_quotes(iv))
    elif name == "TTL":
        src_arg, ts, iv = call.args
        op = ("ttl", ts.strip(), _strip_quotes(iv))
    else:
        raise ValueError(f"not a table operator: {call.name}")
    inner = find_calls(src_arg, TABLE_OPERATORS)
    if inner and inner[0].start == 0 and inner[0].end == len(src_arg.strip()):
        nested = parse_table_op(src_arg, inner[0])
        return TableOp(nested.source, nested.ops + [op], call.start, call.end)
    return TableOp(src_arg.strip(), [op], call.start, call.end)


def find_table_ops(sql: str) -> list[TableOp]:
    """Outermost table-operator chains in the statement."""
    return [parse_table_op(sql, c) for c in find_calls(sql, TABLE_OPERATORS)]


_ALL_ANY = re.compile(r"(>=|<=|<>|!=|=|>|<)\s*\b(ALL|ANY|SOME)\b\s*\(", re.IGNORECASE)

# quantified-comparison rewrite table: (op, kind) -> aggregate, or the
# IN-form when the op collapses to membership
_ALL_ANY_AGG = {
    (">", "ALL"): "MAX", (">=", "ALL"): "MAX",
    ("<", "ALL"): "MIN", ("<=", "ALL"): "MIN",
    (">", "ANY"): "MIN", (">=", "ANY"): "MIN",
    ("<", "ANY"): "MAX", ("<=", "ANY"): "MAX",
}


def rewrite_all_any(sql: str) -> str:
    """Quantified comparisons `x <op> ALL/ANY (subquery)` -> scalar
    aggregate or IN form (Spark SQL has no quantified comparison syntax):

      x > ALL (q)  -> x > (SELECT MAX(__v) FROM (q) AS __q(__v))
      x > ANY (q)  -> x > (SELECT MIN(__v) FROM (q) AS __q(__v))
      x = ANY (q)  -> x IN (q);   x <> ALL (q) -> x NOT IN (q)

    SOME is a synonym of ANY. Beyond-reference surface (the reference's
    expression builder accepts neither, SURVEY §2.4). Divergence from the
    SQL standard, documented: with an EMPTY subquery the standard says
    `ALL` is TRUE, this rewrite yields NULL (MAX of empty) — acceptable
    in WHERE (both filter the row out... the standard would keep it);
    same caveat for NULLs in the subquery column.
    """
    while True:
        m = _ALL_ANY.search(sql)
        if m is None:
            return sql
        op, kind = m.group(1), m.group(2).upper()
        if kind == "SOME":
            kind = "ANY"
        # balanced-paren scan for the subquery
        i = m.end()  # just past '('
        depth = 1
        while i < len(sql) and depth:
            if sql[i] == "'":
                i += 1
                while i < len(sql) and sql[i] != "'":
                    i += 1
            elif sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        subq = sql[m.end(): i - 1]
        if (op, kind) in _ALL_ANY_AGG:
            agg = _ALL_ANY_AGG[(op, kind)]
            repl = f"{op} (SELECT {agg}(__v) FROM ({subq}) AS __allany(__v))"
        elif op == "=" and kind == "ANY":
            repl = f"IN ({subq})"
        elif op in ("<>", "!=") and kind == "ALL":
            repl = f"NOT IN ({subq})"
        else:
            raise ValueError(
                f"unsupported quantified comparison {op} {kind} (supported: "
                f"ordering ops with ALL/ANY, = ANY, <> ALL)"
            )
        sql = sql[: m.start()] + repl + sql[i:]


_PY_UDF_GENERIC = re.compile(r"\b(py_[A-Za-z0-9_]*)\s*<\s*\w+\s*>\s*\(")


def rewrite_py_udf_generics(sql: str) -> str:
    """dozer python-UDF call syntax `py_fn<float>(args)` declares the
    return type inline (dozer-sql/expression/src/python_udf.rs; see
    dozer-tests py_udf.test). Spark UDFs carry their return type at
    registration, so the generic tag is dropped — the function must be
    registered (spark.udf.register) under the same py_ name."""
    return _PY_UDF_GENERIC.sub(r"\1(", sql)


def rewrite_statement(sql: str) -> tuple[str, str | None, list[TableOp]]:
    """Full dialect rewrite. Returns (spark_sql, into_name, table_ops);
    table_ops still need materialization (pipeline.py) — their spans in
    spark_sql are replaced with placeholder view names __top_{i}__."""
    sql, into = split_into(sql)
    sql = rewrite_py_udf_generics(sql)
    sql = rewrite_all_any(sql)
    ops = find_table_ops(sql)
    for i, op in enumerate(reversed(ops)):
        idx = len(ops) - 1 - i
        sql = sql[: op.start] + f"__top_{idx}__" + sql[op.end :]
    sql = rewrite_functions(sql)
    return sql, into, ops
