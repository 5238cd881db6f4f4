"""String / math / conditional scalar functions of the dozer dialect.

Reference inventory: dozer-sql/expression/src/scalar/common.rs:20-32 with
implementations in scalar/string.rs:25-531 (UCASE, CONCAT, LENGTH, TO_CHAR,
CHR, SUBSTR, REPLACE, TRIM, LIKE), scalar/number.rs (ABS, ROUND),
conditional.rs + case.rs (COALESCE, NULLIF, CASE), scalar/field.rs
(NVL, DECODE).

All of these are thin wrappers over native pyspark.sql.functions — they
compile into Catalyst expressions and run inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def ucase(c) -> Column:
    """UCASE(s) — scalar/string.rs:25-40."""
    return F.upper(_col(c))


# chrono strftime (used by dozer's TO_CHAR, scalar/string.rs:244-331)
# -> java SimpleDateFormat-ish pattern used by Spark's date_format.
_STRFTIME_TO_JAVA = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%j": "DDD",
    "%e": "d",
    "%A": "EEEE",
    "%a": "EEE",
    "%B": "MMMM",
    "%b": "MMM",
    "%%": "%",
}


def strftime_to_java(fmt: str) -> str:
    """Translate a chrono/strftime format string to a Spark datetime pattern."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok in _STRFTIME_TO_JAVA:
                out.append(_STRFTIME_TO_JAVA[tok])
                i += 2
                continue
            raise ValueError(f"unsupported strftime token {tok!r} in TO_CHAR format")
        # literal text must be single-quoted for Spark if alphabetic
        if ch.isalpha():
            out.append(f"'{ch}'")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def to_char(c, fmt: str) -> Column:
    """TO_CHAR(ts, strftime_fmt) — scalar/string.rs:244-331.

    dozer formats with chrono strftime; we translate the pattern once at
    plan time and use native date_format (JVM-side).
    """
    return F.date_format(_col(c), strftime_to_java(fmt))


def chr_sql(c) -> Column:
    """CHR(n) — scalar/string.rs (ascii code point -> string)."""
    return F.char(_col(c))


def substr(c, pos, length=None) -> Column:
    """SUBSTR(s, pos[, len]) — 1-based, scalar/string.rs."""
    col = _col(c)
    pos = pos if isinstance(pos, Column) else F.lit(pos)
    if length is None:
        length = F.lit(2147483647)
    elif not isinstance(length, Column):
        length = F.lit(length)
    return F.substring(col, pos, length)


def trim_sql(c, what: str | None = None, where: str = "BOTH") -> Column:
    """TRIM([LEADING|TRAILING|BOTH] [what] FROM s) — scalar/string.rs:151-216."""
    col = _col(c)
    where = where.upper()
    if what is None:
        return {"BOTH": F.trim, "LEADING": F.ltrim, "TRAILING": F.rtrim}[where](col)
    lit = F.lit(what)
    if where == "BOTH":
        return F.btrim(col, lit)
    if where == "LEADING":
        return F.ltrim(col, lit)
    return F.rtrim(col, lit)


def like(c, pattern: str, escape: str | None = None) -> Column:
    """LIKE with optional ESCAPE — scalar/string.rs:218-242."""
    col = _col(c)
    if escape:
        return F.like(col, F.lit(pattern), F.lit(escape))
    return col.like(pattern)


def round_sql(c, scale: int = 0) -> Column:
    """ROUND(x[, n]) — scalar/number.rs; HALF_UP like the reference."""
    return F.round(_col(c), scale)


def nvl(c, default) -> Column:
    """NVL(x, default) — scalar/field.rs."""
    return F.coalesce(_col(c), default if isinstance(default, Column) else F.lit(default))


def decode(c, *pairs_and_default) -> Column:
    """DECODE(expr, search1, result1[, search2, result2, ...][, default])
    — scalar/field.rs. Oracle-style equality decode, NULL-safe on search.
    """
    col = _col(c)
    args = list(pairs_and_default)
    default = args.pop() if len(args) % 2 == 1 else None
    expr: Column | None = None
    for i in range(0, len(args), 2):
        search, result = args[i], args[i + 1]
        search = search if isinstance(search, Column) else F.lit(search)
        result = result if isinstance(result, Column) else F.lit(result)
        cond = col.eqNullSafe(search)
        expr = F.when(cond, result) if expr is None else expr.when(cond, result)
    if expr is None:
        return default if isinstance(default, Column) else F.lit(default)
    if default is not None:
        default = default if isinstance(default, Column) else F.lit(default)
        expr = expr.otherwise(default)
    return expr
