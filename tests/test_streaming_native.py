"""Native streaming operators: watermark stream-stream join (append-only
fast path) and the transformWithStateInPandas custom stateful wrapper."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T


def _file_stream(spark, tmp_path, name, df):
    d = str(tmp_path / name)
    df.write.mode("overwrite").parquet(d)
    return spark.readStream.schema(df.schema).parquet(d)


class TestStreamStreamJoin:
    def _sides(self, spark, tmp_path):
        orders = spark.createDataFrame(
            [(1, 100, "2024-01-01 10:00:00"), (2, 200, "2024-01-01 10:05:00"),
             (3, 100, "2024-01-01 12:00:00")],
            "order_id long, uid long, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        clicks = spark.createDataFrame(
            [(10, 100, "2024-01-01 10:02:00"), (11, 300, "2024-01-01 10:03:00")],
            "click_id long, uid2 long, cts string",
        ).withColumn("cts", F.col("cts").cast("timestamp"))
        return (
            _file_stream(spark, tmp_path, "orders", orders),
            _file_stream(spark, tmp_path, "clicks", clicks),
        )

    def test_inner_within_range(self, spark, tmp_path):
        from dozer_spark.streaming.native_join import stream_stream_join

        lo, rc = self._sides(spark, tmp_path)
        j = stream_stream_join(
            lo, rc, on=[("uid", "uid2")], left_ts="ts", right_ts="cts",
            within="10 MINUTES", how="inner",
        )
        assert j.isStreaming
        q = (
            j.writeStream.format("memory").queryName("ssj_inner")
            .outputMode("append").start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT order_id, click_id FROM ssj_inner").collect()
        finally:
            q.stop()
        # order 1 (uid 100, 10:00) matches click 10 (10:02) within 10min;
        # order 3 (12:00) is out of range; uid 300 click has no order
        assert sorted((r.order_id, r.click_id) for r in rows) == [(1, 10)]

    def test_rejects_bad_how(self, spark, tmp_path):
        from dozer_spark.streaming.native_join import stream_stream_join

        lo, rc = self._sides(spark, tmp_path)
        with pytest.raises(ValueError, match="unsupported join type"):
            stream_stream_join(lo, rc, [("uid", "uid2")], "ts", "cts",
                               "1 MINUTE", how="cross")


class TestKeyedAccumulator:
    def test_batch_running_sum_count(self, spark):
        from dozer_spark.streaming.custom_state import KeyedAccumulator, tws_available

        if not tws_available():
            pytest.skip("protobuf absent: transformWithStateInPandas gated")

        df = spark.createDataFrame(
            [("a", 10.0), ("a", 5.0), ("b", 7.0)], "grp string, x double"
        )
        acc = KeyedAccumulator(
            keys=["grp"],
            state_schema=T.StructType(
                [T.StructField("s", T.DoubleType()), T.StructField("n", T.LongType())]
            ),
            init=(0.0, 0),
            update=lambda st, pdf: (st[0] + float(pdf["x"].sum()),
                                    st[1] + int(len(pdf))),
        )
        out = acc.apply(df)
        got = sorted((r.grp, r.s, r.n) for r in out.collect())
        assert got == [("a", 15.0, 2), ("b", 7.0, 1)]

    def test_streaming_state_accumulates_across_batches(self, spark, tmp_path):
        from dozer_spark.streaming.custom_state import KeyedAccumulator

        d = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        spark.createDataFrame([("a", 1.0)], "grp string, x double").write.mode(
            "overwrite").parquet(d)
        stream = spark.readStream.schema("grp string, x double").parquet(d)
        acc = KeyedAccumulator(
            keys=["grp"],
            state_schema=T.StructType(
                [T.StructField("s", T.DoubleType()), T.StructField("n", T.LongType())]
            ),
            init=(0.0, 0),
            update=lambda st, pdf: (st[0] + float(pdf["x"].sum()),
                                    st[1] + int(len(pdf))),
        )
        out = acc.apply_with_state(stream)
        q = (
            out.writeStream.format("memory").queryName("ka_stream")
            .outputMode("update").option("checkpointLocation", ckpt).start()
        )
        try:
            q.processAllAvailable()
            # second file = second micro-batch; state must carry over
            spark.createDataFrame([("a", 2.0)], "grp string, x double").write.mode(
                "append").parquet(d)
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT grp, s, n FROM ka_stream ORDER BY n DESC LIMIT 1"
            ).collect()
        finally:
            q.stop()
        assert [(r.grp, r.s, r.n) for r in rows] == [("a", 3.0, 2)]
