"""Scale-safety regression tests (round-1 verdict items 1-2):

- The doc-side tables in minhash/ngram verification must be broadcast
  only under a size estimate; past the gate the plan must carry NO
  broadcast hint (AQE then decides from runtime sizes) and still produce
  identical results.
- Batch TTL must be lazy: building the plan runs no Spark job.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from dozer_spark.operators.hints import estimated_plan_bytes, maybe_broadcast
from dozer_spark.operators.ttl import ttl
from dozer_spark.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from dozer_spark.registry import Catalog

SF = "/root/testdata/sf0.001"


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _docs(spark):
    return Catalog.from_testdata(spark, SF).df("documents")


def test_estimate_is_real_for_scans(spark):
    d = _docs(spark)
    est = estimated_plan_bytes(d)
    assert est is not None and 0 < est < (1 << 30)


def test_maybe_broadcast_gates_on_size(spark):
    d = _docs(spark)
    hinted = _optimized(maybe_broadcast(d).join(d.select("doc_id"), "doc_id"))
    assert "strategy=broadcast" in hinted
    unhinted = _optimized(maybe_broadcast(d, 0).join(d.select("doc_id"), "doc_id"))
    assert "strategy=broadcast" not in unhinted
    # a 1-byte gate must also refuse the hint (estimate exceeds it)
    tiny_gate = _optimized(maybe_broadcast(d, 1).join(d.select("doc_id"), "doc_id"))
    assert "strategy=broadcast" not in tiny_gate


def test_minhash_large_corpus_plan_unhinted_same_result(spark):
    d = _docs(spark)
    small = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.9)
    big = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.9, broadcast_gate_bytes=0)
    assert "strategy=broadcast" in _optimized(small)  # sf0.001 clears the gate
    assert "strategy=broadcast" not in _optimized(big)  # large-corpus plan: no pin
    s = sorted((r.id_a, r.id_b, r.jaccard) for r in small.collect())
    b = sorted((r.id_a, r.id_b, r.jaccard) for r in big.collect())
    assert s == b and len(s) > 0


def test_minhash_hot_band_fragment_split_same_result(spark):
    """Forcing the skew path (tiny hot_band_cap splits every sizeable
    band bucket into fragment cells) must yield exactly the plain plan's
    pairs — the triangle decomposition covers each unordered pair once."""
    d = _docs(spark)
    plain = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.9)
    split = minhash_lsh_pairs(d, "text", "doc_id", threshold=0.9, hot_band_cap=5)
    p = sorted((r.id_a, r.id_b, r.jaccard) for r in plain.collect())
    s = sorted((r.id_a, r.id_b, r.jaccard) for r in split.collect())
    assert p == s and len(p) > 0


def test_ngram_large_corpus_plan_unhinted_same_result(spark):
    d = _docs(spark)
    small = ngram_jaccard_pairs(d, "text", "doc_id", "lang", threshold=0.35)
    big = ngram_jaccard_pairs(
        d, "text", "doc_id", "lang", threshold=0.35, broadcast_gate_bytes=0
    )
    assert "strategy=broadcast" not in _optimized(big)
    s = sorted((r.id_a, r.id_b, r.jaccard) for r in small.collect())
    b = sorted((r.id_a, r.id_b, r.jaccard) for r in big.collect())
    assert s == b and len(s) > 0


def test_streaming_snapshot_merge_broadcast_is_gated(spark, monkeypatch):
    """The batch-touched-keys anti-join in the streaming operators must not
    PIN a broadcast when the batch fails the size gate (first batch of a
    backfill / snapshot replay is corpus-sized). Past the gate the merge
    plan carries no broadcast hint; results are unchanged."""
    from dozer_spark.operators import hints
    from dozer_spark.streaming.stateful import RetractingAggregation

    def run(gate_bytes):
        ragg = RetractingAggregation(
            spark, pk=["id"], group_by=["grp"],
            aggs=[F.sum("amount").alias("s")],
        )
        plans = {}
        orig = ragg._ckpt

        def capture(name, df):
            plans[name] = _optimized(df)
            return orig(name, df)

        ragg._ckpt = capture
        cl = lambda rows: spark.createDataFrame(
            rows, "__op string, __txid long, __seq long, id long, grp string, amount double"
        )
        ragg.process_batch(cl([("I", 1, 1, 1, "a", 5.0), ("I", 1, 2, 2, "b", 7.0)]))
        monkeypatch.setattr(hints, "BROADCAST_GATE_BYTES", gate_bytes)
        out = ragg.process_batch(
            cl([("U", 2, 1, 1, "a", 9.0), ("I", 2, 2, 3, "a", 1.0)])
        )
        rows = sorted((r["__op"], r["grp"], r["s"]) for r in out.collect())
        return plans["snapshot"], rows

    plan_small, rows_small = run(256 << 20)  # small batch clears the gate
    assert "strategy=broadcast" in plan_small
    plan_big, rows_big = run(1)  # "corpus-sized" batch: estimate exceeds gate
    assert "strategy=broadcast" not in plan_big
    assert rows_small == rows_big and len(rows_small) > 0


def test_batch_ttl_is_lazy_and_correct(spark):
    ev = Catalog.from_testdata(spark, SF).df("events")
    sc = spark.sparkContext
    group = "ttl-lazy-check"
    sc.setJobGroup(group, "building a TTL plan must run no job")
    try:
        out = ttl(ev, "ts", "7 DAYS")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert sc.statusTracker().getJobIdsForGroup(group) == []

    # same rows as the eager reference computation
    ref_ts = ev.agg(F.max("ts")).collect()[0][0]
    eager = ttl(ev, "ts", "7 DAYS", reference_ts=ref_ts)
    assert out.count() == eager.count()
    assert out.count() > 0


def test_batch_ttl_all_null_ts_keeps_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, ts timestamp"
    )
    assert ttl(df, "ts", "1 HOUR").count() == 2
