"""End-to-end CDC pipeline: streaming changelog source -> durable
retracting aggregation -> transactional MERGE sink, across a restart.

This is the reference's whole architecture in one test
(source -> incremental operator -> epoch-committed sink,
dozer-core/src/executor + node.rs): changelog files arrive in a spool,
each micro-batch advances the aggregation's DURABLE state (StateStore
epochs) and MERGEs the aggregation's output changelog into a
TransactionalTable; the stream is killed and restarted with fresh
operator/sink instances; the final materialized table must equal the
from-scratch SQL over the surviving rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import types as T

from dozer_spark.storage import TransactionalTable
from dozer_spark.streaming import RetractingAggregation

CL_SCHEMA = T.StructType(
    [
        T.StructField("__op", T.StringType()),
        T.StructField("__txid", T.LongType()),
        T.StructField("__seq", T.LongType()),
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def _write_batch(spark, spool, rows):
    spark.createDataFrame(rows, CL_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(spool)


def _make_pipeline(spark, spool, ckpt, state_dir, table_path):
    """source -> RetractingAggregation(durable) -> TransactionalTable."""
    ragg = RetractingAggregation(
        spark,
        pk=["id"],
        group_by=["grp"],
        aggs=[F.sum("amount").alias("total"),
              F.count(F.lit(1)).cast("long").alias("n")],
        state_dir=state_dir,
    )

    def on_batch(batch, batch_id):
        if batch.isEmpty():
            return
        out_cl = ragg.process_batch(batch)  # I/U/D over aggregate rows
        sink_batch = out_cl.withColumn("__del", F.col("__op") == "D").drop("__op")
        TransactionalTable(batch.sparkSession, table_path, pk=["grp"]).merge(
            sink_batch, delete_col="__del"
        )

    stream = spark.readStream.schema(CL_SCHEMA).parquet(spool)
    return (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
    )


def test_cdc_pipeline_survives_restart(spark, tmp_path):
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    state_dir = str(tmp_path / "agg_state")
    table_path = str(tmp_path / "agg_table")

    # epoch 1: inserts
    _write_batch(spark, spool, [
        ("I", 1, 1, 1, "a", 10.0), ("I", 1, 2, 2, "a", 5.0),
        ("I", 1, 3, 3, "b", 7.0),
    ])
    q = _make_pipeline(spark, spool, ckpt, state_dir, table_path).start()
    q.awaitTermination(120)

    t = TransactionalTable(spark, table_path, pk=["grp"])
    got = sorted((r.grp, r.total, r.n) for r in t.read().collect())
    assert got == [("a", 15.0, 2), ("b", 7.0, 1)]

    # "crash": the query is gone; new batches land while it's down
    _write_batch(spark, spool, [
        ("U", 2, 1, 1, "a", 20.0),           # a: 10 -> 20
        ("D", 2, 2, 3, "b", 7.0),            # b: deleted away entirely
        ("I", 2, 3, 4, "c", 1.0),
    ])

    # restart: NEW operator instance + NEW query over the same
    # checkpoint/state/table — exactly-once resume
    q2 = _make_pipeline(spark, spool, ckpt, state_dir, table_path).start()
    q2.awaitTermination(120)

    t2 = TransactionalTable(spark, table_path, pk=["grp"])
    got2 = sorted((r.grp, r.total, r.n) for r in t2.read().collect())
    assert got2 == [("a", 25.0, 2), ("c", 1.0, 1)]

    # the sink's change feed replays to the same final table
    from dozer_spark.streaming.changelog import apply_changelog

    replayed = apply_changelog(t2.changes_as_changelog(1), ["grp"])
    assert sorted((r.grp, r.total, r.n) for r in replayed.collect()) == got2


def test_webhook_to_streaming_to_transactional_table(spark, tmp_path):
    """Round-3 composition: webhook HTTP ingest -> ndjson spool ->
    Structured Streaming -> retracting aggregation -> TransactionalTable
    MERGE with idempotent batch ids; final table equals the from-scratch
    aggregate over the posted changelog."""
    import json
    import urllib.request

    from dozer_spark.sources.webhook import WebhookServer

    spool = str(tmp_path / "hook")
    srv = WebhookServer(spool).start()
    try:
        def post(payload):
            req = urllib.request.Request(
                f"http://{srv.host}:{srv.port}/changelog",
                data=json.dumps(payload).encode(),
            )
            urllib.request.urlopen(req).read()

        post([{"op": "I", "txid": 1, "data": {"id": 1, "grp": "a", "amount": 5.0}},
              {"op": "I", "txid": 1, "data": {"id": 2, "grp": "b", "amount": 7.0}}])
        post([{"op": "U", "txid": 2, "data": {"id": 1, "grp": "a", "amount": 9.0}},
              {"op": "I", "txid": 2, "data": {"id": 3, "grp": "a", "amount": 1.0}}])
        post([{"op": "D", "txid": 3, "data": {"id": 2, "grp": "b"}}])
    finally:
        srv.stop()

    env = ("op string, txid long, _landed_seq long, "
           "data struct<id: bigint, grp: string, amount: double>")
    table_path = str(tmp_path / "table")
    ragg = RetractingAggregation(
        spark, pk=["id"], group_by=["grp"],
        aggs=[F.sum("amount").alias("total"),
              F.count(F.lit(1)).cast("long").alias("n")],
    )

    def on_batch(batch, batch_id):
        if batch.isEmpty():
            return
        cl = batch.filter(F.col("op").isin("I", "U", "D")).select(
            F.col("op").alias("__op"),
            F.coalesce("txid", F.lit(0)).alias("__txid"),
            F.col("_landed_seq").alias("__seq"),
            F.col("data.*"),
        )
        out_cl = ragg.process_batch(cl)
        sink = out_cl.withColumn("__del", F.col("__op") == "D").drop("__op")
        TransactionalTable(batch.sparkSession, table_path, pk=["grp"]).merge(
            sink, delete_col="__del", batch_id=batch_id
        )

    q = (
        spark.readStream.schema(env).json(spool + "/changelog-*.jsonl")
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    t = TransactionalTable(spark, table_path, pk=["grp"])
    got = sorted((r.grp, r.total, r.n) for r in t.read().collect())
    # final state: a = {id1: 9.0, id3: 1.0} -> (10.0, 2); b deleted
    assert got == [("a", 10.0, 2)]
