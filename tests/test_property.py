"""Property-based tests (hypothesis) — the analogue of the reference's
arbitrary-derive fuzzing (dozer-types/src/types/field.rs:29,37 enables
fuzzing Field/Record; SURVEY.md section 5.4).

Invariants checked against a pure-Python model:
- apply_changelog == dict-replay of the op sequence
- RetractingAggregation's state == groupBy of the final snapshot, for any
  op sequence (the reference's per-aggregator retraction tests generalize
  to: incremental state must equal a from-scratch recompute).

Spark round-trips are slow, so examples are few but each is a full random
op sequence.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dozer_spark.streaming import apply_changelog, RetractingAggregation

# an op sequence over a small keyspace so updates/deletes actually hit
KEYS = list(range(1, 6))
GRPS = ["a", "b", "c"]


@st.composite
def op_sequences(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    ops = []
    live: set[int] = set()
    for i in range(n):
        k = draw(st.sampled_from(KEYS))
        grp = draw(st.sampled_from(GRPS))
        amt = float(draw(st.integers(min_value=-50, max_value=100)))
        if k in live:
            kind = draw(st.sampled_from(["U", "D", "U"]))
            if kind == "D":
                live.discard(k)
        else:
            kind = "I"
            live.add(k)
        ops.append((kind, 1 + i // 5, i % 5, k, grp, amt))
    return ops


def _model_replay(ops):
    """Pure-python reference model: PK dict replay."""
    state: dict[int, tuple[str, float]] = {}
    for kind, _tx, _seq, k, grp, amt in ops:
        if kind == "D":
            state.pop(k, None)
        else:
            state[k] = (grp, amt)
    return state


def _df(spark, ops):
    return spark.createDataFrame(ops, ["__op", "__txid", "__seq", "id", "grp", "amount"])


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=op_sequences())
def test_apply_changelog_matches_model(spark, ops):
    got = {
        r.id: (r.grp, r.amount)
        for r in apply_changelog(_df(spark, ops), ["id"]).collect()
    }
    assert got == _model_replay(ops)


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=op_sequences(), n_batches=st.integers(min_value=1, max_value=3))
def test_retracting_agg_equals_full_recompute(spark, ops, n_batches):
    """After replaying any op sequence in any batching, incremental state
    must equal a from-scratch groupBy of the final snapshot."""
    ragg = RetractingAggregation(
        spark,
        pk=["id"],
        group_by=["grp"],
        aggs=[
            F.sum("amount").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("amount").alias("mn"),
            F.max("amount").alias("mx"),
        ],
    )
    # split ops into n_batches contiguous chunks (txid order preserved)
    size = max(1, len(ops) // n_batches)
    chunks = [ops[i : i + size] for i in range(0, len(ops), size)]
    for chunk in chunks:
        ragg.process_batch(_df(spark, chunk))

    model = _model_replay(ops)
    expected: dict[str, tuple[float, int, float, float]] = {}
    for grp in GRPS:
        vals = [amt for (g, amt) in model.values() if g == grp]
        if vals:
            expected[grp] = (sum(vals), len(vals), min(vals), max(vals))
    got = {r.grp: (r.s, r.n, r.mn, r.mx) for r in ragg.current().collect()}
    assert got == expected
