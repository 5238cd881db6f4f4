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

import pytest
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


@st.composite
def two_sided_ops(draw):
    """Random I/U/D sequences for both join sides over small keyspaces."""
    n = draw(st.integers(min_value=2, max_value=14))
    left_live: set[int] = set()
    right_live: set[int] = set()
    batches = []
    batch: tuple[list, list] = ([], [])
    for i in range(n):
        side = draw(st.integers(min_value=0, max_value=1))
        if side == 0:
            k = draw(st.sampled_from([1, 2, 3]))
            jk = draw(st.sampled_from([10, 20, 30]))
            if k in left_live:
                kind = draw(st.sampled_from(["U", "D"]))
                if kind == "D":
                    left_live.discard(k)
            else:
                kind = "I"
                left_live.add(k)
            batch[0].append((kind, 1 + i, 0, k, f"u{k}", jk))
        else:
            k = draw(st.sampled_from([100, 101, 102]))
            jk = draw(st.sampled_from([10, 20, 30]))
            if k in right_live:
                kind = draw(st.sampled_from(["U", "D"]))
                if kind == "D":
                    right_live.discard(k)
            else:
                kind = "I"
                right_live.add(k)
            batch[1].append((kind, 1 + i, 0, k, jk, f"r{k}"))
        if draw(st.booleans()):
            batches.append(batch)
            batch = ([], [])
    batches.append(batch)
    return batches


def _replay_side(all_batches, idx):
    state = {}
    for b in all_batches:
        for kind, _tx, _seq, k, *rest in b[idx]:
            if kind == "D":
                state.pop(k, None)
            else:
                state[k] = rest
    return state


@settings(max_examples=3, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=two_sided_ops())
@pytest.mark.slow
def test_retracting_join_equals_snapshot_join(spark, batches):
    """After any batching of any op sequences, the incremental join's
    materialized output must equal the plain join of the final snapshots."""
    from dozer_spark.streaming.join import RetractingJoin

    j = RetractingJoin(spark, ["uid"], ["rid"], [("jk", "rjk")], "left")
    lcols = ["__op", "__txid", "__seq", "uid", "name", "jk"]
    rcols = ["__op", "__txid", "__seq", "rid", "rjk", "rname"]
    empty_l = spark.createDataFrame([("I", 0, 0, -1, "x", -1)], lcols).limit(0)
    empty_r = spark.createDataFrame([("I", 0, 0, -1, -1, "x")], rcols).limit(0)
    for bl, br in batches:
        ldf = spark.createDataFrame(bl, lcols) if bl else empty_l
        rdf = spark.createDataFrame(br, rcols) if br else empty_r
        j.process_batch(ldf, rdf)

    lstate = _replay_side(batches, 0)
    rstate = _replay_side(batches, 1)
    expected = set()
    for uid, (name, jk) in lstate.items():
        matches = [(rid, rname) for rid, (rjk, rname) in rstate.items() if rjk == jk]
        if matches:
            for rid, rname in matches:
                expected.add((uid, name, jk, rid, jk, rname))
        else:
            expected.add((uid, name, jk, None, None, None))
    got = {
        (r.uid, r.name, r.jk, r.rid, r.rjk, r.rname) for r in j.current().collect()
    }
    assert got == expected


# -- TransactionalTable model check ------------------------------------------

merge_batches = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),          # key
            st.integers(min_value=0, max_value=99),          # value
            st.booleans(),                                   # delete?
        ),
        min_size=1, max_size=6,
    ),
    min_size=1, max_size=4,
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=merge_batches)
@pytest.mark.slow
def test_txtable_merge_matches_dict_model(spark, tmp_path_factory, batches):
    """Random merge sequences vs a plain dict model: the snapshot after
    every merge and the full CDF replay must both match last-op-wins
    semantics (delete applies only when the key is not re-upserted in
    the same batch — merge() contract)."""
    import shutil
    import tempfile

    from dozer_spark.storage import TransactionalTable
    from dozer_spark.streaming.changelog import apply_changelog

    path = tempfile.mkdtemp(prefix="txprop_")
    try:
        t = TransactionalTable(spark, path, pk=["id"], n_buckets=4)
        model: dict[int, int] = {}
        for batch in batches:
            rows = [(k, v, d) for (k, v, d) in batch]
            upserts = {k: v for (k, v, d) in rows if not d}
            deletes = {k for (k, v, d) in rows if d}
            t.merge(
                spark.createDataFrame(rows, "id long, v long, is_del boolean"),
                delete_col="is_del",
            )
            for k in deletes - set(upserts):
                model.pop(k, None)
            for k, v in upserts.items():
                model[k] = v
            got = {r.id: r.v for r in t.read().collect()}
            # any_value picks an arbitrary duplicate winner; compare keys
            # exactly and values only for keys with a unique upsert
            assert set(got) == set(model)
            uniq = {k for k in upserts
                    if sum(1 for (k2, _, d) in rows if k2 == k and not d) == 1}
            for k in uniq:
                assert got[k] == upserts[k]
        replayed = {r.id: r.v for r in
                    apply_changelog(t.changes_as_changelog(1), ["id"]).collect()}
        assert set(replayed) == set(model)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ops=op_sequences(),
    n_batches=st.integers(min_value=2, max_value=3),
    crashes=st.lists(st.booleans(), min_size=3, max_size=3),
    compact_every=st.integers(min_value=1, max_value=3),
)
@pytest.mark.slow
def test_durable_agg_crash_replay_property(spark, ops, n_batches, crashes,
                                           compact_every):
    """Fuzz the durable delta-log core: any op sequence, any batching,
    a crash injected before any subset of epoch commits (merges done,
    manifest not), any compaction cadence. Invariants:
    - resumed state always equals the from-scratch recompute;
    - a consumer applying every emitted changelog row in order (with
      at-least-once duplicates from replays) converges to the same
      aggregates."""
    import shutil
    import tempfile

    sd = tempfile.mkdtemp()

    def make():
        r = RetractingAggregation(
            spark, pk=["id"], group_by=["grp"],
            aggs=[F.sum("amount").alias("s"),
                  F.count(F.lit(1)).cast("long").alias("n")],
            state_dir=sd,
        )
        r._aggtx.compact_every = compact_every
        return r

    def boom():
        raise RuntimeError("injected crash before manifest commit")

    try:
        ragg = make()
        emitted = []
        size = max(1, len(ops) // n_batches)
        chunks = [ops[i:i + size] for i in range(0, len(ops), size)]
        for i, chunk in enumerate(chunks):
            df = _df(spark, chunk)
            if crashes[i % len(crashes)]:
                ragg._store.commit = boom
                try:
                    ragg.process_batch(df)
                except RuntimeError:
                    pass
                ragg = make()  # resume from the committed epoch
            out = ragg.process_batch(df)
            emitted.extend(out.collect())

        model = _model_replay(ops)
        expected: dict[str, tuple[float, int]] = {}
        for grp in GRPS:
            vals = [amt for (g, amt) in model.values() if g == grp]
            if vals:
                expected[grp] = (sum(vals), len(vals))

        got = {r.grp: (r.s, r.n) for r in ragg.current().collect()}
        assert got == expected

        # resumed-from-disk instance sees the same state
        got2 = {r.grp: (r.s, r.n) for r in make()._state.collect()}
        assert got2 == expected

        # consumer replay of the emitted changelog (idempotent keyed apply)
        view: dict[str, tuple[float, int]] = {}
        for r in emitted:
            if r["__op"] == "D":
                view.pop(r.grp, None)
            else:
                view[r.grp] = (r.s, r.n)
        assert view == expected
    finally:
        shutil.rmtree(sd, ignore_errors=True)
