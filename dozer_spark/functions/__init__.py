"""Scalar function library — dozer dialect shims on top of pyspark.sql.functions.

Everything here stays JVM-side (native Column expressions) except the
geodesic/vincenty distance algorithms, which are Arrow-batched pandas UDFs
(the slow path, used only when explicitly requested; HAVERSINE is native).
"""

from dozer_spark.functions.scalar import (
    ucase,
    to_char,
    decode,
    nvl,
    substr,
    like,
    trim_sql,
    round_sql,
    chr_sql,
)
from dozer_spark.functions.geo import point, distance
from dozer_spark.functions.json_fns import json_value, json_query

__all__ = [
    "ucase",
    "to_char",
    "decode",
    "nvl",
    "substr",
    "like",
    "trim_sql",
    "round_sql",
    "chr_sql",
    "point",
    "distance",
    "json_value",
    "json_query",
]
