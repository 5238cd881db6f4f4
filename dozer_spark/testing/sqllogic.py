"""sqllogictest harness — the Spark port of the reference's backbone test
asset (dozer-tests/src/sql_tests/logic_test.rs:69-109 + full/*.test).

Reference mechanics: CREATE/INSERT/UPDATE/DELETE statements run against a
source SQLite DB; the resulting CHANGELOG of dozer Operations is replayed
through a real pipeline built from each `query`, and the sink output is
compared against the expected rows (helper/pipeline.rs:292-424). The
`--complete` mode regenerates expected outputs from SQLite
(logic_test.rs:137-146, validator.rs — SQLite is the oracle).

This port keeps all three layers, DuckDB standing in for SQLite:

1. statements execute in DuckDB; each statement's effect is converted to
   changelog ops (I/U/D with old images) by PK-diffing the table before/
   after — exactly what the reference's SqlMapper.get_change_log derives;
2. every `query` runs through OUR engine (statement_to_dataframe on the
   materialized snapshots) and must match DuckDB running the same query
   on the same state (validator mode);
3. queries matching the incremental shapes additionally replay the
   accumulated changelog in multiple batches through the RETRACTING
   operators (RetractingAggregation / changelog_filter) and the final
   state must match too — this is the leg that exercises the
   INSERT/UPDATE/DELETE retraction sequences the corpus encodes.

Rows are rendered with the reference validator's formatting (NULL ->
"NULL", integral floats without the decimal point, rusqlite-style
shortest float repr) and compared as sorted multisets (`control sortmode
rowsort`; nosort queries have no ORDER BY, so order is engine-defined and
rowsort is the portable comparison).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENGINE_NAME = "dozer_spark"

# -- file parsing -------------------------------------------------------------


@dataclass
class Record:
    kind: str  # "statement" | "query"
    sql: str
    lineno: int
    types: str = ""
    sortmode: str = "rowsort"
    expected: list[str] = field(default_factory=list)
    skipped: bool = False  # onlyif/skipif directive excluded this engine


def parse_slt_file(path: str) -> list[Record]:
    with open(path) as f:
        lines = f.read().splitlines()
    records: list[Record] = []
    default_sort = "rowsort"
    i = 0
    pending_skip = False
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line.startswith("control sortmode"):
            default_sort = line.split()[-1]
            i += 1
            continue
        if line.startswith("hash-threshold"):
            i += 1
            continue
        if line.startswith("onlyif"):
            # `onlyif X` runs the next record only on engine X
            pending_skip = line.split()[-1] != ENGINE_NAME
            i += 1
            continue
        if line.startswith("skipif"):
            pending_skip = line.split()[-1] == ENGINE_NAME
            i += 1
            continue
        if line.startswith("statement"):
            start = i + 1
            j = start
            sql_lines = []
            while j < len(lines) and lines[j].strip() != "":
                sql_lines.append(lines[j])
                j += 1
            records.append(
                Record("statement", "\n".join(sql_lines).strip(), start + 1,
                       skipped=pending_skip)
            )
            pending_skip = False
            i = j
            continue
        if line.startswith("query"):
            parts = line.split()
            types = parts[1] if len(parts) > 1 else ""
            sortmode = parts[2] if len(parts) > 2 else default_sort
            j = i + 1
            sql_lines = []
            while j < len(lines) and lines[j].strip() != "----":
                sql_lines.append(lines[j])
                j += 1
            sql = "\n".join(sql_lines).strip()
            j += 1  # past ----
            expected = []
            while j < len(lines) and lines[j].strip() != "":
                if not lines[j].strip().startswith("#"):
                    expected.append(lines[j].rstrip())
                j += 1
            records.append(
                Record("query", sql, i + 1, types=types, sortmode=sortmode,
                       expected=expected, skipped=pending_skip)
            )
            pending_skip = False
            i = j
            continue
        raise ValueError(f"{path}:{i + 1}: unrecognized line {line!r}")
    return records


# -- value rendering (validator.rs formatting) --------------------------------


def render_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def render_rows(rows) -> list[str]:
    return sorted(" ".join(render_value(v) for v in row) for row in rows)


# -- statement → changelog ops ------------------------------------------------

_CREATE_RE = re.compile(r"CREATE\s+TABLE\s+([A-Za-z_][A-Za-z0-9_]*)", re.IGNORECASE)
_WRITE_RE = re.compile(
    r"(?:INSERT\s+INTO|UPDATE|DELETE\s+FROM)\s+([A-Za-z_][A-Za-z0-9_]*)", re.IGNORECASE
)

# PKs for the corpus tables (the reference declares them in its schema
# map; the .test files rely on NOT NULL id columns). Tables absent here
# get a synthetic append-only row id.
KNOWN_PKS = {
    "actor": ["actor_id"],
    "film": ["film_id"],
    "film_actor": ["actor_id", "film_id"],
    "users": ["id"],
    "accounts": ["account_id"],
    "transactions": ["transaction_id"],
}

_SYNTH_PK = "__rid"


class SqlLogicRunner:
    """Executes one parsed .test file against DuckDB + the Spark engine."""

    def __init__(self, spark: SparkSession):
        import duckdb

        self.spark = spark
        self.duck = duckdb.connect()
        self.tables: dict[str, list[str]] = {}  # table -> pk cols
        self.ops: dict[str, list[tuple]] = {}  # table -> [(op, txid, seq, *row)]
        self.cols: dict[str, list[str]] = {}
        self.txid = 0
        self._rid = 0

    # -- statements ----------------------------------------------------------

    def _snapshot(self, table: str):
        return self.duck.execute(f'SELECT * FROM "{table}"').fetchall()

    def execute_statement(self, sql: str) -> None:
        m = _CREATE_RE.match(sql.strip())
        if m:
            table = m.group(1).lower()
            self.duck.execute(sql)
            cols = [
                r[1] for r in self.duck.execute(f"PRAGMA table_info('{table}')").fetchall()
            ]
            pk = KNOWN_PKS.get(table)
            if pk is None:
                if "id" in [c.lower() for c in cols]:
                    pk = ["id"]
                else:
                    pk = [_SYNTH_PK]  # append-only synthetic key
            self.tables[table] = pk
            self.cols[table] = cols
            self.ops[table] = []
            return
        m = _WRITE_RE.match(sql.strip())
        if not m:
            self.duck.execute(sql)
            return
        table = m.group(1).lower()
        pk = self.tables[table]
        before = self._snapshot(table)
        self.duck.execute(sql)
        after = self._snapshot(table)
        self.txid += 1
        self._append_ops(table, pk, before, after)

    def _append_ops(self, table, pk, before, after) -> None:
        cols = self.cols[table]
        if pk == [_SYNTH_PK]:
            # append-only: new rows = multiset tail (no UPDATE/DELETE runs
            # against synthetic-PK tables in the corpus; assert that)
            if len(after) < len(before):
                raise ValueError(f"DELETE on table {table} without a PK")
            from collections import Counter

            delta = Counter(after) - Counter(before)
            seq = 0
            for row, n in delta.items():
                for _ in range(n):
                    self._rid += 1
                    seq += 1
                    self.ops[table].append(("I", self.txid, seq, self._rid, *row))
            return
        pk_idx = [cols.index(c) for c in pk] if pk[0] in cols else [
            [c.lower() for c in cols].index(c.lower()) for c in pk
        ]
        b = {tuple(r[i] for i in pk_idx): r for r in before}
        a = {tuple(r[i] for i in pk_idx): r for r in after}
        seq = 0
        for k, row in a.items():
            if k not in b:
                seq += 1
                self.ops[table].append(("I", self.txid, seq, *row))
            elif b[k] != row:
                seq += 1
                self.ops[table].append(("U", self.txid, seq, *row))
        for k, row in b.items():
            if k not in a:
                seq += 1
                self.ops[table].append(("D", self.txid, seq, *row))

    # -- snapshots into Spark ------------------------------------------------

    def _spark_schema(self, table: str):
        from pyspark.sql import types as T

        dmap = {
            "INTEGER": T.LongType(), "BIGINT": T.LongType(),
            "VARCHAR": T.StringType(), "DOUBLE": T.DoubleType(),
            "FLOAT": T.DoubleType(), "DECIMAL": T.DoubleType(),
            "TIMESTAMP": T.TimestampNTZType(), "DATE": T.DateType(),
            "BOOLEAN": T.BooleanType(),
        }
        fields = []
        info = self.duck.execute(f"PRAGMA table_info('{table}')").fetchall()
        for r in info:
            name, dtype = r[1], r[2].upper()
            base = dtype.split("(")[0]
            fields.append(T.StructField(name, dmap.get(base, T.StringType()), True))
        return T.StructType(fields)

    def _to_spark(self, table: str, rows) -> DataFrame:
        schema = self._spark_schema(table)

        def conv(v, f):
            if v is None:
                return None
            if isinstance(v, Decimal):
                return float(v)
            return v

        data = [tuple(conv(v, f) for v, f in zip(r, schema.fields)) for r in rows]
        return self.spark.createDataFrame(data, schema)

    def register_views(self) -> None:
        for table in self.tables:
            self._to_spark(table, self._snapshot(table)).createOrReplaceTempView(table)

    # -- query legs ----------------------------------------------------------

    def run_query_spark(self, sql: str) -> list[str]:
        from dozer_spark.plans.pipeline import statement_to_dataframe

        self.register_views()
        df, _ = statement_to_dataframe(self.spark, sql)
        return render_rows([tuple(r) for r in df.collect()])

    @staticmethod
    def oracle_sql(sql: str) -> str:
        """Dozer-dialect spellings DuckDB lacks, normalized for the oracle
        (the Spark leg exercises the real dialect rewriter instead)."""
        from dozer_spark.plans.dialect import rewrite_py_udf_generics

        sql = re.sub(r"(?i)\bMIN_APPEND_ONLY\s*\(", "MIN(", sql)
        sql = re.sub(r"(?i)\bMAX_APPEND_ONLY\s*\(", "MAX(", sql)
        return rewrite_py_udf_generics(sql)

    def run_query_duck(self, sql: str) -> list[str]:
        return render_rows(self.duck.execute(self.oracle_sql(sql)).fetchall())

    # retraction leg: single-table aggregation -------------------------------

    _AGG_SHAPE = re.compile(
        r"^\s*SELECT\s+(?P<items>.*?)\s+FROM\s+(?P<table>[A-Za-z_][A-Za-z0-9_]*)\s*"
        r"(?:\s+WHERE\s+(?P<where>.*?))?"
        r"(?:\s+GROUP\s+BY\s+(?P<group>.*?))?"
        r"(?:\s+HAVING\s+(?P<having>.*?))?\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _AGG_FNS = re.compile(r"\b(SUM|COUNT|AVG|MIN|MAX)\s*\(", re.IGNORECASE)

    def match_agg_shape(self, sql: str):
        """Parse `SELECT items FROM t [WHERE] [GROUP BY] [HAVING]` (single
        table, no join/subquery). Returns None if the query doesn't fit."""
        if re.search(r"\bJOIN\b|\bUNION\b|\bWITH\b|\(\s*SELECT|\bDISTINCT\b",
                     sql, re.IGNORECASE):
            return None
        m = self._AGG_SHAPE.match(sql)
        if not m:
            return None
        d = m.groupdict()
        if d["table"].lower() not in self.tables:
            return None
        if not self._AGG_FNS.search(d["items"]):
            return None
        return d

    @staticmethod
    def _split_items(items: str) -> list[str]:
        out, depth, cur = [], 0, []
        for ch in items:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur).strip())
        return out

    def _changelog_df(self, table: str) -> DataFrame | None:
        ops = self.ops[table]
        if not ops:
            return None
        from pyspark.sql import types as T

        pk = self.tables[table]
        base = self._spark_schema(table)
        fields = [
            T.StructField("__op", T.StringType()),
            T.StructField("__txid", T.LongType()),
            T.StructField("__seq", T.LongType()),
        ]
        if pk == [_SYNTH_PK]:
            fields.append(T.StructField(_SYNTH_PK, T.LongType()))
        fields.extend(base.fields)
        data = [
            tuple(float(v) if isinstance(v, Decimal) else v for v in op)
            for op in ops
        ]
        return self.spark.createDataFrame(data, T.StructType(fields))

    def run_query_retracting_agg(self, sql: str, n_batches: int = 3) -> list[str] | None:
        """Replay the table's changelog in batches through
        RetractingAggregation (+ changelog_filter for WHERE); None when
        the query doesn't match the incremental shape."""
        d = self.match_agg_shape(sql)
        if d is None:
            return None
        from dozer_spark.streaming import RetractingAggregation, changelog_filter
        from dozer_spark.streaming.changelog import apply_changelog

        table = d["table"].lower()
        pk = self.tables[table]
        cl = self._changelog_df(table)
        if cl is None:
            return None

        group_cols = (
            [g.strip() for g in self._split_items(d["group"])] if d["group"] else []
        )
        if not all(re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", g) for g in group_cols):
            return None  # GROUP BY expressions: batch leg only
        items = self._split_items(d["items"])
        sel_exprs: list[tuple[str, str]] = []  # (alias, kind)
        aggs = []
        for n, item in enumerate(items):
            alias = f"c{n}"
            im = re.match(r"(?is)^(.*?)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$", item)
            expr = im.group(1) if im else item
            if self._AGG_FNS.search(expr):
                aggs.append(F.expr(expr).alias(alias))
                sel_exprs.append((alias, "agg"))
            else:
                sel_exprs.append((expr.strip(), "group"))

        having = None
        if d["having"]:
            htext = d["having"]
            # replace each aggregate call with an alias; add hidden aggs
            calls = []
            depth = 0
            i = 0
            while i < len(htext):
                m = self._AGG_FNS.search(htext, i)
                if not m:
                    break
                j = m.end()
                depth = 1
                while j < len(htext) and depth:
                    if htext[j] == "(":
                        depth += 1
                    elif htext[j] == ")":
                        depth -= 1
                    j += 1
                calls.append(htext[m.start():j])
                i = j
            for k, call in enumerate(dict.fromkeys(calls)):
                alias = f"__h{k}"
                aggs.append(F.expr(call).alias(alias))
                htext = htext.replace(call, alias)
            having = F.expr(htext)

        ragg = RetractingAggregation(
            self.spark, pk=pk, group_by=group_cols, aggs=aggs, having=having
        )

        # split ops into txid-contiguous batches
        txids = sorted({r["__txid"] for r in cl.select("__txid").distinct().collect()})
        per = max(1, (len(txids) + n_batches - 1) // n_batches)
        chunks = [txids[i:i + per] for i in range(0, len(txids), per)]
        prior = None
        seen = None
        for chunk in chunks:
            batch = cl.filter(F.col("__txid").isin([int(t) for t in chunk]))
            if d["where"]:
                batch = changelog_filter(batch, pk, F.expr(d["where"]), prior=prior)
            ragg.process_batch(batch)
            raw = cl.filter(F.col("__txid").isin([int(t) for t in chunk]))
            seen = raw if seen is None else seen.unionByName(raw)
            prior = apply_changelog(seen, pk)
        state = ragg.current()
        out = state.select(
            *[
                F.col(e).alias(f"c{i}") if kind == "agg" else F.expr(e).alias(f"c{i}")
                for i, (e, kind) in enumerate(sel_exprs)
            ]
        )
        return render_rows([tuple(r) for r in out.collect()])

    # retraction leg: two-table equi-join -------------------------------------

    _JOIN_SHAPE = re.compile(
        r"^\s*SELECT\s+(?P<items>.*?)\s+FROM\s+"
        r"(?P<t1>[A-Za-z_][A-Za-z0-9_]*)(?:\s+(?:AS\s+)?(?P<a1>[A-Za-z_][A-Za-z0-9_]*))?\s+"
        r"(?:(?P<how>INNER|LEFT|RIGHT)\s+)?(?:OUTER\s+)?JOIN\s+"
        r"(?P<t2>[A-Za-z_][A-Za-z0-9_]*)(?:\s+(?:AS\s+)?(?P<a2>[A-Za-z_][A-Za-z0-9_]*))?\s+"
        r"ON\s+(?P<q1>[A-Za-z_][A-Za-z0-9_]*)\.(?P<c1>[A-Za-z_][A-Za-z0-9_]*)\s*=\s*"
        r"(?P<q2>[A-Za-z_][A-Za-z0-9_]*)\.(?P<c2>[A-Za-z_][A-Za-z0-9_]*)\s*"
        r"(?:WHERE\s+(?P<where>.*?))?"
        r"(?:\s+GROUP\s+BY\s+(?P<group>.*?))?"
        r"(?:\s+HAVING\s+(?P<having>.*?))?\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )

    def _qualify(self, text: str, t1: str, a1: str, t2: str, a2: str) -> str:
        """Rewrite alias/table-qualified and bare column refs to the
        prefixed (l_/r_) names of the join-leg changelogs."""
        cols1 = {c.lower() for c in self.cols[t1]}
        cols2 = {c.lower() for c in self.cols[t2]}

        def repl_qualified(m):
            q, c = m.group(1).lower(), m.group(2)
            if q in (a1.lower(), t1.lower()):
                return f"l_{c}"
            if q in (a2.lower(), t2.lower()):
                return f"r_{c}"
            return m.group(0)

        text = re.sub(r"\b([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)",
                      repl_qualified, text)

        def repl_bare(m):
            w = m.group(0)
            if w.startswith(("l_", "r_")):
                return w
            lw = w.lower()
            if lw in cols1:
                return f"l_{w}"
            if lw in cols2:
                return f"r_{w}"
            return w

        return re.sub(r"\b[A-Za-z_][A-Za-z0-9_]*\b(?!\s*\()", repl_bare, text)

    def _parse_join(self, sql: str):
        """Common parse/validation for the join legs. Returns the match
        dict extended with resolved names, or None."""
        if re.search(r"\bUNION\b|\bWITH\b|\(\s*SELECT|\bDISTINCT\b",
                     sql, re.IGNORECASE):
            return None
        if len(re.findall(r"\bJOIN\b", sql, re.IGNORECASE)) != 1:
            return None
        m = self._JOIN_SHAPE.match(sql)
        if not m:
            return None
        d = m.groupdict()
        t1, t2 = d["t1"].lower(), d["t2"].lower()
        if t1 == t2 or t1 not in self.tables or t2 not in self.tables:
            return None  # self-join: output column prefixes would collide
        d["t1"], d["t2"] = t1, t2
        d["a1"] = d["a1"] or d["t1"]
        d["a2"] = d["a2"] or d["t2"]
        d["how"] = (d["how"] or "inner").lower()

        def side_col(q, c):
            if q.lower() in (d["a1"].lower(), t1.lower()):
                return ("l", f"l_{c}")
            if q.lower() in (d["a2"].lower(), t2.lower()):
                return ("r", f"r_{c}")
            return (None, None)

        s1, n1 = side_col(d["q1"], d["c1"])
        s2, n2 = side_col(d["q2"], d["c2"])
        if s1 is None or s2 is None or s1 == s2:
            return None
        d["on"] = [(n1, n2)] if s1 == "l" else [(n2, n1)]
        return d

    def _prefixed_cl(self, table: str, prefix: str):
        cl = self._changelog_df(table)
        if cl is None:
            return None, None
        # keep the synthetic __rid PK (append-only tables) as data
        data = [c for c in cl.columns if c not in ("__op", "__txid", "__seq")]
        out = cl.select(
            "__op", "__txid", "__seq",
            *[F.col(c).alias(f"{prefix}_{c}") for c in data],
        )
        pk = [f"{prefix}_{c}" for c in self.tables[table]]
        return out, pk

    def _replay_join(self, d, n_batches: int):
        """Feed both tables' changelogs through RetractingJoin in
        synchronized batches; yields (join, per-batch output changelog)."""
        from dozer_spark.streaming.join import RetractingJoin

        lcl, lpk = self._prefixed_cl(d["t1"], "l")
        rcl, rpk = self._prefixed_cl(d["t2"], "r")
        if lcl is None or rcl is None:
            return None, None, None

        j = RetractingJoin(self.spark, left_pk=lpk, right_pk=rpk, on=d["on"],
                           how=d["how"])

        def chunks(cl):
            txids = sorted({r["__txid"] for r in cl.select("__txid").distinct().collect()})
            per = max(1, (len(txids) + n_batches - 1) // n_batches)
            return [cl.filter(F.col("__txid").isin([int(t) for t in txids[i:i + per]]))
                    for i in range(0, len(txids), per)]

        lc, rc = chunks(lcl), chunks(rcl)
        outs = []
        for i in range(max(len(lc), len(rc))):
            lb = lc[i] if i < len(lc) else (lcl.limit(0) if i == 0 else None)
            rb = rc[i] if i < len(rc) else (rcl.limit(0) if i == 0 else None)
            outs.append(j.process_batch(lb, rb))
        return j, outs, lpk + rpk

    def run_query_retracting_join(self, sql: str, n_batches: int = 2) -> list[str] | None:
        """Replay a two-table equi-join through RetractingJoin; the
        join's materialized output (projected, filtered) must match the
        oracle. None when the query doesn't fit."""
        if re.search(r"\bGROUP\s+BY\b", sql, re.IGNORECASE) or self._AGG_FNS.search(sql):
            return None
        d = self._parse_join(sql)
        if d is None:
            return None
        t1, a1, t2, a2 = d["t1"], d["a1"], d["t2"], d["a2"]
        j, _, _ = self._replay_join(d, n_batches)
        if j is None:
            return None

        cur = j.current()
        if d["where"]:
            cur = cur.filter(F.expr(self._qualify(d["where"], t1, a1, t2, a2)))
        items = self._split_items(d["items"])
        if any(it.strip() == "*" for it in items):
            # SQL star order: left table's columns then right's
            items = [f"l_{c}" for c in self.cols[t1]] + [f"r_{c}" for c in self.cols[t2]]
        exprs = []
        for n, item in enumerate(items):
            im = re.match(r"(?is)^(.*?)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$", item)
            expr = im.group(1) if im else item
            exprs.append(
                F.expr(self._qualify(expr, t1, a1, t2, a2)).alias(f"c{n}")
            )
        return render_rows([tuple(r) for r in cur.select(*exprs).collect()])

    # retraction leg: join -> aggregation DAG ---------------------------------

    def run_query_retracting_join_agg(self, sql: str,
                                      n_batches: int = 2) -> list[str] | None:
        """Two-operator changelog DAG: RetractingJoin's per-batch OUTPUT
        changelog feeds RetractingAggregation — the reference's
        processor-chain architecture (every operator consumes and emits a
        changelog). Matches `SELECT aggs FROM a JOIN b ON .. [WHERE]
        GROUP BY .. [HAVING ..]`; the final aggregate state must equal
        the oracle."""
        if not re.search(r"\bGROUP\s+BY\b", sql, re.IGNORECASE):
            return None
        if not self._AGG_FNS.search(sql):
            return None
        d = self._parse_join(sql)
        if d is None or not d["group"]:
            return None
        t1, a1, t2, a2 = d["t1"], d["a1"], d["t2"], d["a2"]
        if d["where"]:
            return None  # WHERE between join and agg: not wired yet

        group_cols = [
            self._qualify(g.strip(), t1, a1, t2, a2)
            for g in self._split_items(d["group"])
        ]
        if not all(re.fullmatch(r"[lr]_[A-Za-z0-9_]+", g) for g in group_cols):
            return None

        from dozer_spark.streaming import RetractingAggregation

        items = self._split_items(d["items"])
        sel: list[tuple[str, str]] = []
        aggs = []
        for n, item in enumerate(items):
            im = re.match(r"(?is)^(.*?)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$", item)
            expr = self._qualify((im.group(1) if im else item), t1, a1, t2, a2)
            if self._AGG_FNS.search(expr):
                aggs.append(F.expr(expr).alias(f"c{n}"))
                sel.append((f"c{n}", "agg"))
            else:
                if expr not in group_cols:
                    return None
                sel.append((expr, "group"))

        having = None
        if d["having"]:
            htext = self._qualify(d["having"], t1, a1, t2, a2)
            calls, i = [], 0
            while True:
                m2 = self._AGG_FNS.search(htext, i)
                if not m2:
                    break
                jx, depth = m2.end(), 1
                while jx < len(htext) and depth:
                    if htext[jx] == "(":
                        depth += 1
                    elif htext[jx] == ")":
                        depth -= 1
                    jx += 1
                calls.append(htext[m2.start():jx])
                i = jx
            for k, call in enumerate(dict.fromkeys(calls)):
                alias = f"__h{k}"
                aggs.append(F.expr(call).alias(alias))
                htext = htext.replace(call, alias)
            having = F.expr(htext)

        j, outs, join_pk = self._replay_join(d, n_batches)
        if j is None:
            return None
        ragg = RetractingAggregation(
            self.spark, pk=join_pk, group_by=group_cols, aggs=aggs, having=having
        )
        for i, out_cl in enumerate(outs):
            # the join emits (__op, data...); re-stamp ordering metadata
            # for the downstream operator (forwarder role)
            stamped = out_cl.select(
                "__op",
                F.lit(i + 1).cast("long").alias("__txid"),
                F.monotonically_increasing_id().alias("__seq"),
                *[c for c in out_cl.columns if c != "__op"],
            )
            ragg.process_batch(stamped)
        state = ragg.current()
        final = state.select(
            *[
                F.col(e).alias(f"c{i}") if kind == "agg" else F.expr(e).alias(f"c{i}")
                for i, (e, kind) in enumerate(sel)
            ]
        )
        return render_rows([tuple(r) for r in final.collect()])

    # retraction leg: single-table filter/projection -------------------------

    def run_query_retracting_filter(self, sql: str, n_batches: int = 3) -> list[str] | None:
        """Replay through changelog_filter (WHERE flip semantics) batch by
        batch with a prior snapshot, materialize, project, render."""
        if re.search(r"\bJOIN\b|\bUNION\b|\bWITH\b|\(\s*SELECT|\bDISTINCT\b|"
                     r"\bGROUP\s+BY\b|\bHAVING\b", sql, re.IGNORECASE):
            return None
        if self._AGG_FNS.search(sql):
            return None
        m = re.match(
            r"^\s*SELECT\s+(?P<items>.*?)\s+FROM\s+(?P<table>[A-Za-z_][A-Za-z0-9_]*)"
            r"(?:\s+WHERE\s+(?P<where>.*?))?\s*;?\s*$",
            sql, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            return None
        d = m.groupdict()
        table = d["table"].lower()
        if table not in self.tables:
            return None
        # qualified names (t.col) in a single-table query: strip the prefix
        items = [re.sub(rf"(?i)\b{table}\.", "", it) for it in
                 self._split_items(d["items"])]
        if any(it.strip() == "*" for it in items):
            items = self.cols[table]
        from dozer_spark.streaming import changelog_filter
        from dozer_spark.streaming.changelog import apply_changelog

        pk = self.tables[table]
        cl = self._changelog_df(table)
        if cl is None:
            return None
        txids = sorted({r["__txid"] for r in cl.select("__txid").distinct().collect()})
        per = max(1, (len(txids) + n_batches - 1) // n_batches)
        chunks = [txids[i:i + per] for i in range(0, len(txids), per)]
        filtered = None
        seen = None
        prior = None
        for chunk in chunks:
            batch = cl.filter(F.col("__txid").isin([int(t) for t in chunk]))
            fb = (
                changelog_filter(batch, pk, F.expr(d["where"]), prior=prior)
                if d["where"]
                else batch
            )
            filtered = fb if filtered is None else filtered.unionByName(fb)
            seen = batch if seen is None else seen.unionByName(batch)
            prior = apply_changelog(seen, pk)
        snap = apply_changelog(filtered, pk)
        exprs = []
        for n, item in enumerate(items):
            im = re.match(r"(?is)^(.*?)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)$", item)
            expr = im.group(1) if im else item
            exprs.append(F.expr(expr).alias(f"c{n}"))
        out = snap.select(*exprs)
        return render_rows([tuple(r) for r in out.collect()])
