"""JavaScript source connector: the reference's `json_records` single-
Json-column contract (dozer-ingestion/javascript) over the resident
Node runtime — ingest() message validation, op mapping, snapshot
marker, spool append, failure propagation."""

from __future__ import annotations

import shutil

import pytest

node_missing = shutil.which("node") is None
pytestmark = pytest.mark.skipif(node_missing, reason="node not installed")

SCRIPT = r"""
(async () => {
  const snapshot_msg = { typ: "SnapshottingDone", old_val: null, new_val: null };
  await ingest(snapshot_msg);
  for (let i = 0; i < 3; i++) {
    await ingest({ typ: "Insert", old_val: null,
                   new_val: { k: i, tag: "row" + i } });
  }
  await ingest({ typ: "Update", old_val: { k: 1, tag: "row1" },
                 new_val: { k: 1, tag: "row1-v2" } });
  await ingest({ typ: "Delete", old_val: { k: 0, tag: "row0" },
                 new_val: null });
  console.log("user noise on stdout must not corrupt the feed");
})();
"""


def _write(tmp_path, name, src):
    p = tmp_path / name
    p.write_text(src)
    return str(p)


def test_ingest_ops_and_snapshot_marker(spark, tmp_path):
    from dozer_spark.sources.javascript import (
        js_changelog,
        js_records,
        run_js_source,
        snapshot_done,
    )

    spool = str(tmp_path / "jsspool")
    n = run_js_source(_write(tmp_path, "s.js", SCRIPT), spool)
    assert n == 5 and snapshot_done(spool)

    cl = js_changelog(spark, spool).orderBy("__seq").collect()
    assert [r["__op"] for r in cl] == ["I", "I", "I", "U", "D"]
    # Delete carries the old value; Update carries the new image
    import json

    assert json.loads(cl[3]["value"]) == {"k": 1, "tag": "row1-v2"}
    assert json.loads(cl[4]["value"]) == {"k": 0, "tag": "row0"}

    # json_records: one Json column, the CURRENT rows after applying
    # every op — k0 was deleted and k1's pre-update image replaced
    recs = sorted(json.loads(r["value"])["tag"]
                  for r in js_records(spark, spool).collect())
    assert recs == ["row1-v2", "row2"]


def test_second_run_appends(spark, tmp_path):
    from dozer_spark.sources.javascript import js_changelog, run_js_source

    spool = str(tmp_path / "jsspool2")
    one = _write(
        tmp_path, "one.js",
        'ingest({typ: "Insert", new_val: {k: 99}});')
    assert run_js_source(one, spool) == 1
    assert run_js_source(one, spool) == 1
    cl = js_changelog(spark, spool).collect()
    assert len(cl) == 2
    # each bootstrap run is its own transaction (ADVICE r11): __txid is
    # the spool run index, so (__txid, __seq) never collides across runs
    keys = sorted((r["__txid"], r["__seq"]) for r in cl)
    assert keys == [(0, 0), (1, 0)]


def test_script_error_propagates(tmp_path):
    from dozer_spark.sources.javascript import run_js_source

    bad = _write(tmp_path, "bad.js", "throw new Error('boom');")
    with pytest.raises(RuntimeError, match="boom"):
        run_js_source(bad, str(tmp_path / "sp"))


def test_invalid_message_rejected(tmp_path):
    from dozer_spark.sources.javascript import run_js_source

    bad = _write(tmp_path, "badmsg.js",
                 'ingest({typ: "Insert", new_val: null});')
    with pytest.raises(RuntimeError, match="Insert requires new_val"):
        run_js_source(bad, str(tmp_path / "sp2"))
    bad2 = _write(tmp_path, "badtyp.js", 'ingest({typ: "Upsert"});')
    with pytest.raises(RuntimeError, match="typ must be one of"):
        run_js_source(bad2, str(tmp_path / "sp3"))
