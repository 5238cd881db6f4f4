"""foreachBatch MERGE/upsert sinks.

The reference's sinks commit per epoch (Sink trait,
dozer-core/src/node.rs:111-147); our equivalent is Structured Streaming's
micro-batch + foreachBatch(batch_id) with checkpointLocation for resume.

Delta Lake is not available in this container, so MERGE is implemented
parquet-native: read current -> anti-join on PK -> union -> atomic swap.
On a real deployment this function body is one `MERGE INTO` against
Delta/Iceberg; the call sites would not change.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dozer_spark.operators.hints import cache_materialized, maybe_broadcast


def upsert_parquet(spark: SparkSession, batch: DataFrame, path: str, pk: list[str],
                   delete_col: str | None = None) -> None:
    """MERGE `batch` into the parquet table at `path` keyed on pk.

    If delete_col names a boolean column, rows with it true are deleted
    from the target instead of upserted (changelog 'D' handling).
    """
    # materialized cache: the batch feeds the key anti-join AND the final
    # union; caching avoids the double scan and lets the broadcast gate
    # see its REAL size (first batch of a backfill can be corpus-sized)
    batch = src = cache_materialized(batch)
    deletes = None
    if delete_col is not None:
        deletes = batch.filter(F.col(delete_col)).select(*pk)
        batch = batch.filter(~F.col(delete_col)).drop(delete_col)
    batch = batch.dropDuplicates(pk)  # last-writer-wins within a batch upstream

    if os.path.exists(path):
        current = spark.read.parquet(path)
        keys = batch.select(*pk)
        if deletes is not None:
            keys = keys.unionByName(deletes)
        kept = current.join(maybe_broadcast(keys), on=pk, how="left_anti")
        merged = kept.unionByName(batch)
    else:
        merged = batch

    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    src.unpersist()


def foreach_batch_upsert(path: str, pk: list[str], delete_col: str | None = None):
    """Factory for writeStream.foreachBatch: upserts each micro-batch by PK.

    Usage:
        stream.writeStream.foreachBatch(foreach_batch_upsert(out, ["id"]))
              .option("checkpointLocation", ckpt).start()
    """

    def fn(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert_parquet(batch.sparkSession, batch, path, pk, delete_col)

    return fn
