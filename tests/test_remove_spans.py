"""Duplicated-span excision (`remove_duplicated_spans`): planted-case
exactness — keeper survives, later occurrences are cut, overlapping
windows merge into one span, short docs pass through.

The fixed-window form of suffix-array substring dedup (Lee et al.
2021); reference parity: dozer has no substring-level operator — this
belongs to the training-data layer the build adds on top (SURVEY §2
extension). The corpus-level exact oracle is `dedup_remove_spans` in
queries_wave8.py (replayed in DuckDB by the driver)."""

from __future__ import annotations

from dozer_spark.ops.text import remove_duplicated_spans

W = 20


def _doc(*words):
    return " ".join(words)


def _tok(i, salt=""):
    return f"w{salt}{i}"


def _span(n, salt):
    return [_tok(i, salt) for i in range(n)]


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = remove_duplicated_spans(df, "text", "doc_id", window=W)
    return {r["doc_id"]: r for r in out.collect()}


def test_cross_doc_span_removed_from_later_doc_only(spark):
    shared = _span(25, "s")  # 25-token shared region > window
    a_only = _span(10, "a")
    b_only = _span(10, "b")
    rows = [
        (1, _doc(*(a_only + shared))),
        (2, _doc(*(shared + b_only))),
    ]
    got = _run(spark, rows)
    # doc 1 is the global keeper for every shared window: untouched
    assert got[1]["n_removed"] == 0
    assert got[1]["clean_text"] == rows[0][1]
    # doc 2 loses the whole shared region (overlapping windows merge):
    # windows at pos 1..6 cover tokens 1..25
    assert got[2]["n_removed"] == 25
    assert got[2]["clean_text"] == _doc(*b_only)


def test_within_doc_repeat_keeps_first_occurrence(spark):
    span = _span(W, "r")
    mid = _span(5, "m")
    rows = [(7, _doc(*(span + mid + span)))]
    got = _run(spark, rows)
    # second occurrence (tokens 26..45) excised; first kept
    assert got[7]["n_tokens"] == 45
    assert got[7]["n_removed"] == W
    assert got[7]["clean_text"] == _doc(*(span + mid))


def test_short_docs_pass_through(spark):
    rows = [(1, _doc(*_span(W - 1, "x"))), (2, _doc(*_span(W - 1, "x")))]
    got = _run(spark, rows)
    for i in (1, 2):
        assert got[i]["n_removed"] == 0
        assert got[i]["clean_text"] == rows[i - 1][1]


def test_keeper_is_global_min_doc_then_pos(spark):
    span = _span(W, "k")
    pre = _span(3, "p")
    rows = [
        (5, _doc(*(pre + span))),   # span at pos 4
        (3, _doc(*(span))),         # span at pos 1, smaller doc_id -> keeper
    ]
    got = _run(spark, rows)
    assert got[3]["n_removed"] == 0
    assert got[5]["n_removed"] == W
    assert got[5]["clean_text"] == _doc(*pre)


def test_triple_copy_removes_all_but_first(spark):
    span = _span(30, "t")
    rows = [
        (1, _doc(*span)),
        (2, _doc(*span)),
        (3, _doc(*span)),
    ]
    got = _run(spark, rows)
    assert got[1]["n_removed"] == 0
    assert got[2]["n_removed"] == 30 and got[2]["clean_text"] == ""
    assert got[3]["n_removed"] == 30 and got[3]["clean_text"] == ""
