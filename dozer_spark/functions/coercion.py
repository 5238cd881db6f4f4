"""Type-coercion parity with the reference's expression engine.

The reference types binary arithmetic with explicit matrices
(dozer-sql/expression/src/execution.rs:587-742) and aggregate returns
with per-function validators (:764-1045). Where Spark's own coercion
agrees (most cells), these helpers emit the plain operator; where it
diverges, they insert the parity cast:

| cell | reference | Spark default | parity action |
|---|---|---|---|
| int / int (any widths) | Float (f64) | double | none — `/` already floats |
| int  +-*% int | Int | long | none |
| float op int | Float | double | none |
| Decimal op int | Decimal | decimal | none |
| Decimal op Float | **Decimal** | double | cast the float side to DECIMAL |
| Decimal / any | Decimal | decimal (but double for /float) | same cast |
| AVG(int family) | **Decimal** (validate_avg :764-807) | double | avg over DECIMAL(38,10) cast |
| AVG(float) | Float | double | none |
| COUNT | Int, not-null (:809-816) | long | none |
| SUM(int) | Int | long | none |

The float->Decimal promotion uses DECIMAL(38,18) — rust_decimal carries a
96-bit mantissa (~28 significant digits, scale<=28); 38,18 holds every
f64 the reference itself can convert losslessly enough for its tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType)

# float operand promoted into decimal arithmetic (execution.rs Decimal rows)
FLOAT_AS_DECIMAL = T.DecimalType(38, 18)
# AVG-over-int intermediate (validate_avg: int family -> Decimal)
AVG_DECIMAL = T.DecimalType(38, 10)


def is_int_type(dt: T.DataType) -> bool:
    return isinstance(dt, _INT_TYPES)


def is_float_type(dt: T.DataType) -> bool:
    return isinstance(dt, _FLOAT_TYPES)


def is_decimal_type(dt: T.DataType) -> bool:
    return isinstance(dt, T.DecimalType)


def _numeric(dt: T.DataType) -> bool:
    return is_int_type(dt) or is_float_type(dt) or is_decimal_type(dt)


def arith(left: Column, lt: T.DataType, op: str, right: Column, rt: T.DataType) -> Column:
    """Binary arithmetic with the reference's result-type matrix.

    op in {+, -, *, %, /}. Raises on non-numeric operands the matrix
    rejects (CannotApplyBinaryOperator)."""
    if not (_numeric(lt) and _numeric(rt)):
        raise TypeError(f"cannot apply {op} to {lt} and {rt} (execution.rs:587-742)")

    dec_mixed_float = (is_decimal_type(lt) and is_float_type(rt)) or (
        is_float_type(lt) and is_decimal_type(rt)
    )
    if dec_mixed_float:
        # reference: Decimal op Float -> Decimal; Spark would widen to double
        if is_float_type(lt):
            left = left.cast(FLOAT_AS_DECIMAL)
        else:
            right = right.cast(FLOAT_AS_DECIMAL)

    if op == "/":
        if not (is_decimal_type(lt) or is_decimal_type(rt)):
            # Div matrix: every int/float combination -> Float. Spark's `/`
            # on integers already returns double; the cast documents it.
            left, right = left.cast("double"), right.cast("double")
        return left / right
    if op == "+":
        return left + right
    if op == "-":
        return left - right
    if op == "*":
        return left * right
    if op == "%":
        return left % right
    raise ValueError(f"unknown operator {op!r}")


def arith_cols(df: DataFrame, lname: str, op: str, rname: str) -> Column:
    """arith() with operand types resolved from df's schema."""
    return arith(
        F.col(lname), df.schema[lname].dataType, op, F.col(rname),
        df.schema[rname].dataType,
    )


def avg_agg(c: Column, dt: T.DataType) -> Column:
    """AVG with the reference's return rule: int family -> Decimal
    (validate_avg, execution.rs:764-807); Float stays Float; Decimal
    stays Decimal."""
    if is_int_type(dt):
        return F.avg(c.cast(AVG_DECIMAL))
    if not _numeric(dt):
        raise TypeError(f"AVG over {dt} rejected (execution.rs:764-807)")
    return F.avg(c)


def count_agg(c: Column | None = None) -> Column:
    """COUNT returns Int (i64) and is not-null (execution.rs:809-816) —
    Spark's count already is; spelled out for parity documentation."""
    return (F.count(c) if c is not None else F.count(F.lit(1))).cast("long")


def sum_agg(c: Column, dt: T.DataType) -> Column:
    """SUM keeps the input family (validate_sum :1017-1045): int -> Int,
    float -> Float, Decimal -> Decimal. Spark matches for int (sum(long)
    -> long) and float; Spark widens Decimal(p,s) -> Decimal(p+10,s),
    which only gains precision."""
    if not _numeric(dt):
        raise TypeError(f"SUM over {dt} rejected (execution.rs:1017-1045)")
    return F.sum(c)
