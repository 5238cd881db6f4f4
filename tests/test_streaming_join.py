"""Incremental join + union retraction tests — semantics ported from the
reference's join state tests (product/join/operator/table.rs:194-227) and
outer-join retraction logic (operator/mod.rs:75-135), set-op counting map
(product/set/record_map/mod.rs:111-158)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dozer_spark.streaming.join import RetractingJoin
from dozer_spark.streaming.setops import RetractingUnion


def _users(spark, rows):
    return spark.createDataFrame(rows, ["__op", "__txid", "__seq", "uid", "name", "country_id"])


def _countries(spark, rows):
    return spark.createDataFrame(rows, ["__op", "__txid", "__seq", "cid", "cname"])


def _empty_countries(spark):
    return _countries(spark, []).filter(F.lit(False)) if False else _countries(
        spark, [("I", 0, 0, -1, "x")]
    ).limit(0)


class TestRetractingJoinInner:
    def test_match_appears_and_disappears(self, spark):
        j = RetractingJoin(spark, ["uid"], ["cid"], [("country_id", "cid")], "inner")
        out1 = j.process_batch(
            _users(spark, [("I", 1, 1, 1, "ann", 10)]), _empty_countries(spark)
        )
        assert out1.count() == 0  # no match yet -> inner emits nothing
        out2 = j.process_batch(None, _countries(spark, [("I", 2, 1, 10, "NL")]))
        assert [(r["__op"], r.name, r.cname) for r in out2.collect()] == [("I", "ann", "NL")]
        # delete the right row -> joined row retracts
        out3 = j.process_batch(None, _countries(spark, [("D", 3, 1, 10, "NL")]))
        assert [(r["__op"], r.name) for r in out3.collect()] == [("D", "ann")]

    def test_update_non_key_col_emits_update(self, spark):
        j = RetractingJoin(spark, ["uid"], ["cid"], [("country_id", "cid")], "inner")
        j.process_batch(
            _users(spark, [("I", 1, 1, 1, "ann", 10)]),
            _countries(spark, [("I", 1, 1, 10, "NL")]),
        )
        out = j.process_batch(None, _countries(spark, [("U", 2, 1, 10, "Netherlands")]))
        assert [(r["__op"], r.cname) for r in out.collect()] == [("U", "Netherlands")]

    def test_key_change_moves_match(self, spark):
        j = RetractingJoin(spark, ["uid"], ["cid"], [("country_id", "cid")], "inner")
        j.process_batch(
            _users(spark, [("I", 1, 1, 1, "ann", 10)]),
            _countries(spark, [("I", 1, 1, 10, "NL"), ("I", 1, 2, 20, "DE")]),
        )
        out = j.process_batch(_users(spark, [("U", 2, 1, 1, "ann", 20)]), None)
        got = sorted((r["__op"], r.cname) for r in out.collect())
        assert got == [("D", "NL"), ("I", "DE")]


class TestRetractingJoinOuter:
    """operator/mod.rs:75-135: NULL-padded default rows appear/retract."""

    def test_left_padded_then_match(self, spark):
        j = RetractingJoin(spark, ["uid"], ["cid"], [("country_id", "cid")], "left")
        out1 = j.process_batch(
            _users(spark, [("I", 1, 1, 1, "ann", 10)]), _empty_countries(spark)
        )
        assert [(r["__op"], r.name, r.cname) for r in out1.collect()] == [("I", "ann", None)]
        # first match arrives: padded row retracts, joined row inserts
        out2 = j.process_batch(None, _countries(spark, [("I", 2, 1, 10, "NL")]))
        got = sorted((r["__op"], r.cname if r.cname else "-") for r in out2.collect())
        assert got == [("D", "-"), ("I", "NL")]
        # match disappears: joined row retracts, padded row returns
        out3 = j.process_batch(None, _countries(spark, [("D", 3, 1, 10, "NL")]))
        got3 = sorted((r["__op"], r.cname if r.cname else "-") for r in out3.collect())
        assert got3 == [("D", "NL"), ("I", "-")]

    def test_right_outer(self, spark):
        j = RetractingJoin(spark, ["uid"], ["cid"], [("country_id", "cid")], "right")
        out1 = j.process_batch(
            _users(spark, [("I", 0, 0, -1, "x", -1)]).limit(0),
            _countries(spark, [("I", 1, 1, 10, "NL")]),
        )
        assert [(r["__op"], r.name, r.cname) for r in out1.collect()] == [("I", None, "NL")]
        out2 = j.process_batch(_users(spark, [("I", 2, 1, 1, "ann", 10)]), None)
        got = sorted((r["__op"], r.name if r.name else "-") for r in out2.collect())
        assert got == [("D", "-"), ("I", "ann")]

    def test_multiple_matches_padded_only_when_empty(self, spark):
        """Right PK distinct from the join key: two offices share a
        country code; deleting one retracts only its joined row."""

        def offices(rows):
            return spark.createDataFrame(
                rows, ["__op", "__txid", "__seq", "office_id", "code", "oname"]
            )

        j = RetractingJoin(spark, ["uid"], ["office_id"], [("country_id", "code")], "left")
        j.process_batch(
            _users(spark, [("I", 1, 1, 1, "ann", 10)]),
            offices([("I", 1, 1, 100, 10, "HQ")]),
        )
        # second office with the same country code -> extra joined row only
        out = j.process_batch(None, offices([("I", 2, 1, 101, 10, "Branch")]))
        assert [(r["__op"], r.oname) for r in out.collect()] == [("I", "Branch")]
        # deleting one of two matches retracts only that joined row (no padding)
        out2 = j.process_batch(None, offices([("D", 3, 1, 100, 10, "HQ")]))
        assert [(r["__op"], r.oname) for r in out2.collect()] == [("D", "HQ")]
        # deleting the last match retracts it AND re-emits the padded row
        out3 = j.process_batch(None, offices([("D", 4, 1, 101, 10, "Branch")]))
        got = sorted((r["__op"], r.oname if r.oname else "-") for r in out3.collect())
        assert got == [("D", "Branch"), ("I", "-")]

    def test_unsupported_type_rejected(self, spark):
        with pytest.raises(ValueError, match="unsupported join type"):
            RetractingJoin(spark, ["a"], ["b"], [("a", "b")], "full")


class TestRetractingUnion:
    def _cl(self, spark, rows):
        return spark.createDataFrame(rows, ["__op", "__txid", "__seq", "id", "val"])

    def test_zero_to_one_and_back(self, spark):
        u = RetractingUnion(spark, pks=[["id"], ["id"]], value_cols=["val"])
        # val 'x' appears on input 0 -> Insert
        out1 = u.process_batch([self._cl(spark, [("I", 1, 1, 1, "x")]), None])
        assert [(r["__op"], r.val) for r in out1.collect()] == [("I", "x")]
        # same value appears on input 1 -> count 1->2, nothing emitted
        out2 = u.process_batch([None, self._cl(spark, [("I", 2, 1, 7, "x")])])
        assert out2.count() == 0
        # remove from input 0 -> 2->1, nothing
        out3 = u.process_batch([self._cl(spark, [("D", 3, 1, 1, "x")]), None])
        assert out3.count() == 0
        # remove from input 1 -> 1->0 -> Delete
        out4 = u.process_batch([None, self._cl(spark, [("D", 4, 1, 7, "x")])])
        assert [(r["__op"], r.val) for r in out4.collect()] == [("D", "x")]

    def test_update_moves_value(self, spark):
        u = RetractingUnion(spark, pks=[["id"]], value_cols=["val"])
        u.process_batch([self._cl(spark, [("I", 1, 1, 1, "x")])])
        out = u.process_batch([self._cl(spark, [("U", 2, 1, 1, "y")])])
        got = sorted((r["__op"], r.val) for r in out.collect())
        assert got == [("D", "x"), ("I", "y")]
        assert sorted(r.val for r in u.current().collect()) == ["y"]


def test_join_ttl_state_eviction(spark):
    """TTL eviction of join state (join/operator/table.rs:117-136):
    old right-side rows are forgotten; new left rows no longer match them."""
    import pyspark.sql.functions as F

    def ev(rows):
        return (
            spark.createDataFrame(rows, ["__op", "__txid", "__seq", "eid", "key", "ts_s"])
            .withColumn("ts", F.col("ts_s").cast("timestamp"))
            .drop("ts_s")
        )

    j = RetractingJoin(
        spark, ["uid"], ["eid"], [("country_id", "key")], "inner",
        ttl="1 HOUR", right_ts="ts",
    )
    users = lambda rows: spark.createDataFrame(
        rows, ["__op", "__txid", "__seq", "uid", "name", "country_id"]
    )
    # right row at 10:00
    out1 = j.process_batch(
        users([("I", 1, 1, 1, "ann", 7)]),
        ev([("I", 1, 1, 100, 7, "2024-01-01 10:00:00")]),
    )
    assert out1.count() == 1  # ann matches the 10:00 event
    # a new right row at 12:30 advances max ts; the 10:00 row exceeds the
    # 1h TTL and is evicted from state
    j.process_batch(None, ev([("I", 2, 1, 101, 99, "2024-01-01 12:30:00")]))
    # new left row with key 7: its would-be match was evicted, so bob gets
    # nothing AND ann's stale joined row is retracted (divergence from the
    # reference's silent forget — our materialization stays consistent)
    out3 = j.process_batch(users([("I", 3, 1, 2, "bob", 7)]), None)
    assert [(r["__op"], r.name) for r in out3.collect()] == [("D", "ann")]
    # but a left row keyed to the fresh right row still joins
    out4 = j.process_batch(users([("I", 4, 1, 3, "cat", 99)]), None)
    assert [(r["__op"], r.name) for r in out4.collect()] == [("I", "cat")]
