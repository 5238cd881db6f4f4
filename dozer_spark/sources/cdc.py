"""CDC changelog replay — the test-harness source.

The reference's sqllogictest harness replays SQLite's change log as
Operations through the pipeline (dozer-tests/src/sql_tests/
logic_test.rs:81-94, helper/pipeline.rs:383-396). This module is the same
idea for our engine: take a changelog DataFrame (__op/__txid/__seq + row
image) and hand it to a changelog-aware operator batch by batch, in
transaction order — which is exactly how a Kafka/Debezium feed would
arrive in micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def changelog_batches(changelog: DataFrame, batch_by: str = "__txid") -> Iterator[DataFrame]:
    """Split a changelog into ordered micro-batches by transaction id.

    Driver-side loop over DISTINCT txids — intended for tests and bounded
    replays (the unbounded path is a real stream + foreachBatch; Spark
    delivers the batching there)."""
    ids = [r[0] for r in changelog.select(batch_by).distinct().orderBy(batch_by).collect()]
    for i in ids:
        yield changelog.filter(F.col(batch_by) == i)


def replay_changelog(changelog: DataFrame, operator, batch_by: str = "__txid") -> list[DataFrame]:
    """Feed a changelog through a stateful operator (e.g.
    RetractingAggregation.process_batch) one transaction at a time;
    returns the per-batch output changelogs."""
    outs = []
    for batch in changelog_batches(changelog, batch_by):
        outs.append(operator.process_batch(batch))
    return outs
