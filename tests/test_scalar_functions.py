"""Scalar-function unit tests — shapes from the reference's expression
test files (dozer-sql/expression/src/*/tests, dozer-sql/src/expression/
tests: case, cast, comparison, datetime, string, number, in_list...)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dozer_spark.functions.scalar import (
    strftime_to_java,
    to_char,
    decode,
    nvl,
    trim_sql,
    substr,
    chr_sql,
    like,
    ucase,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_strftime_token_translation():
    assert strftime_to_java("%Y-%m-%d") == "yyyy-MM-dd"
    assert strftime_to_java("%H:%M:%S") == "HH:mm:ss"
    assert strftime_to_java("%d/%b/%Y") == "dd/MMM/yyyy"
    assert strftime_to_java("%A") == "EEEE"
    assert strftime_to_java("100%%") == "100%"
    with pytest.raises(ValueError, match="unsupported strftime token"):
        strftime_to_java("%Q")


def test_to_char_formats(spark):
    ts = F.lit("2023-07-04 09:05:03").cast("timestamp")
    assert one(spark, to_char(ts, "%Y-%m-%d")) == "2023-07-04"
    assert one(spark, to_char(ts, "%H:%M:%S")) == "09:05:03"
    assert one(spark, to_char(ts, "%a %d %B")) == "Tue 04 July"


def test_decode_null_safe_and_default(spark):
    # Oracle DECODE matches NULL to NULL (unlike CASE =)
    assert one(spark, decode(F.lit(None).cast("string"), None, "was_null", "other")) == "was_null"
    assert one(spark, decode(F.lit("b"), "a", "1", "b", "2", "dflt")) == "2"
    assert one(spark, decode(F.lit("z"), "a", "1", "dflt")) == "dflt"
    assert one(spark, decode(F.lit("z"), "a", "1")) is None  # no default


def test_nvl_trim_substr_chr_ucase_like(spark):
    assert one(spark, nvl(F.lit(None).cast("string"), "x")) == "x"
    assert one(spark, nvl(F.lit("y"), "x")) == "y"
    assert one(spark, trim_sql(F.lit("xxhixx"), "x", "BOTH")) == "hi"
    assert one(spark, trim_sql(F.lit("xxhixx"), "x", "LEADING")) == "hixx"
    assert one(spark, trim_sql(F.lit("xxhixx"), "x", "TRAILING")) == "xxhi"
    assert one(spark, trim_sql(F.lit("  hi  "))) == "hi"
    assert one(spark, substr(F.lit("hello"), 2, 3)) == "ell"
    assert one(spark, substr(F.lit("hello"), 3)) == "llo"
    assert one(spark, chr_sql(F.lit(65))) == "A"
    assert one(spark, ucase(F.lit("abc"))) == "ABC"
    assert one(spark, like(F.lit("50%off"), r"50!%%", escape="!")) is True
    assert one(spark, like(F.lit("hello"), "he%")) is True


def test_json_path_normalization(spark):
    from dozer_spark.functions.json_fns import json_value, json_query

    j = F.lit('{"a": {"b": [1, 2]}, "s": "x"}')
    assert one(spark, json_value(j, "a.b[0]")) == "1"
    assert one(spark, json_value(j, "$.s")) == "x"
    assert one(spark, json_query(j, "a")) == '{"b":[1,2]}'


def test_haversine_known_distance(spark):
    from dozer_spark.functions.geo import haversine_m

    # equator quarter-circumference ~ 10,007.5 km
    d = one(spark, haversine_m(F.lit(0.0), F.lit(0.0), F.lit(90.0), F.lit(0.0)))
    assert abs(d - 10_007_543) < 20_000
