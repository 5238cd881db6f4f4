"""JSONPath engine vectors ported from the reference
(dozer-sql/src/expression/tests/json_functions.rs) + dialect routing."""

from __future__ import annotations

import json

import pytest

from dozer_spark.functions.jsonpath import (
    find,
    json_query_str,
    json_value_str,
    parse_path,
)

DOC = json.dumps(
    {
        "info": {
            "type": 1,
            "address": {"town": "Bristol", "county": "Avon", "country": "England"},
            "tags": ["Sport", "Water polo"],
        },
        "type": "Basic",
    }
)


class TestReferenceVectors:
    def test_json_value_scalar(self):
        # json_functions.rs test_json_value
        assert json_value_str(DOC, "$.info.address.town") == "Bristol"

    def test_json_value_array_is_null(self):
        # test_json_value_null: array result -> JSON null
        assert json_value_str(DOC, "$.info.tags") is None

    def test_json_query_object(self):
        # test_json_query
        assert json_query_str(DOC, "$.info.address") == json.dumps(
            {"town": "Bristol", "county": "Avon", "country": "England"},
            separators=(",", ":"),
        )

    def test_json_query_scalar_is_null(self):
        # test_json_query_null: scalar result -> JSON null
        assert json_query_str(DOC, "$.info.type") is None

    def test_json_query_len_one_array(self):
        # test_json_query_len_one_array: the single match IS the array
        one = json.dumps({"info": {"tags": ["Sport"]}})
        assert json_query_str(one, "$.info.tags") == '["Sport"]'

    def test_json_query_array(self):
        assert json_query_str(DOC, "$.info.tags") == '["Sport","Water polo"]'

    def test_json_query_default_path(self):
        # test_json_query_default_path: one-arg == '$'
        assert json_query_str(DOC) == json.dumps(
            json.loads(DOC), separators=(",", ":")
        )
        # JSON_VALUE('$') on an object -> JSON null (test_json_value_diff_1)
        assert json_value_str(DOC, "$") is None

    def test_json_query_all_descent_wild(self):
        # test_json_query_all: $..* = strict descendants, preorder
        doc = json.dumps([{"digit": 30, "letter": "A"}, {"digit": 31, "letter": "B"}])
        got = json_query_str(doc, "$..*")
        assert got == json.dumps(
            [{"digit": 30, "letter": "A"}, 30, "A",
             {"digit": 31, "letter": "B"}, 31, "B"],
            separators=(",", ":"),
        )

    def test_json_query_iter_wildcard(self):
        # test_json_query_iter: $[*].digit -> [30, 31]
        doc = json.dumps([{"digit": 30, "letter": "A"}, {"digit": 31, "letter": "B"}])
        assert json_query_str(doc, "$[*].digit") == "[30,31]"

    def test_missing_path_is_null(self):
        # test_json_value_diff_2: missing key -> JSON null (not SQL error)
        doc = json.dumps({"x": [0, 1]})
        assert json_query_str(doc, "$.x") == "[0,1]"
        assert json_value_str(doc, "$.y") is None

    def test_invalid_path_is_sql_null(self):
        assert json_value_str(DOC, "not-a-path") is None
        assert json_query_str(DOC, "$[?(@.a > 1)]") is None  # filters: unsupported

    def test_null_input(self):
        assert json_value_str(None, "$.a") is None


class TestPathParser:
    def test_segments(self):
        assert parse_path("$.a.b[0][*]..c..*") == [
            ("field", "a"), ("field", "b"), ("index", 0), ("wild",),
            ("descent_field", "c"), ("descent_wild",),
        ]
        assert parse_path("$['x y'][\"z\"]") == [("field", "x y"), ("field", "z")]

    def test_negative_index(self):
        assert find([10, 20, 30], parse_path("$[-1]")) == [30]

    def test_rejects_unsupported(self):
        for bad in ("$[1:3]", "$.a[?(@.b)]", "a.b"):
            with pytest.raises(ValueError):
                parse_path(bad)


def test_dialect_routes_json_functions(spark):
    from dozer_spark.plans.pipeline import statement_to_dataframe

    spark.createDataFrame([(DOC,)], ["j"]).createOrReplaceTempView("jt")
    df, _ = statement_to_dataframe(
        spark,
        "SELECT JSON_VALUE(j, '$.info.address.town') AS town, "
        "JSON_QUERY(j, '$.info.tags') AS tags, "
        "JSON_VALUE(j, '$..county') AS county FROM jt",
    )
    row = df.collect()[0]
    assert row.town == "Bristol"
    assert row.tags == '["Sport","Water polo"]'
    assert row.county == "Avon"
