"""Transactional parquet table: atomic MERGE by PK + change data feed.

The reference materializes operator output via sinks that commit per
epoch (dozer-core/src/node.rs:111-147). The Spark-native ideal is Delta
Lake's MERGE INTO + Change Data Feed; this container has no delta-spark,
so this module implements the same CONTRACT parquet-native — and fixes
the two round-1 criticisms of upsert_parquet (full rewrite, non-atomic
swap):

- **Bucketed data layout**: rows live under `buckets/<version>/b=<k>/`
  partition dirs keyed by a PK hash bucket. A MERGE rewrites ONLY the
  buckets containing touched keys; untouched buckets are carried forward
  by reference in the manifest (no data copy). Work per merge is
  O(batch + rows-sharing-touched-buckets), not O(table).
- **Atomic commits**: a version's bucket map is published by a single
  `os.replace` of MANIFEST.json (same epoch contract as
  streaming/state.py). Readers resolve the manifest once; a crash
  mid-merge leaves the previous version intact.
- **Change data feed**: each merge also writes the change rows
  (insert / update_preimage / update_postimage / delete, Delta CDF's
  schema) under `changes/v<version>/`; `read_changes(since)` is the
  Delta `readChangeFeed` equivalent and feeds the changelog operators.

On a cluster, `path` lives on the shared filesystem; swap the manifest
for a Delta/Iceberg transaction log and the call sites don't change
(sinks_delta.py does exactly that when delta-spark is installed).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST = "MANIFEST.json"
CHANGE_TYPES = ("insert", "update_preimage", "update_postimage", "delete")


class ConcurrentWriteError(RuntimeError):
    """Another writer committed since this instance loaded the manifest.

    The table is single-writer by design (same assumption as the
    reference's pipeline state); this guard turns a lost-update race
    into a loud failure. For true multi-writer semantics use the Delta
    path (sources/delta.py) whose transaction log does real CAS."""


class TransactionalTable:
    def __init__(self, spark: SparkSession, path: str, pk: list[str],
                 n_buckets: int = 16):
        self.spark = spark
        self.path = path
        self.pk = pk
        os.makedirs(path, exist_ok=True)
        m = self._read_manifest()
        if m is not None:
            if m["pk"] != pk:
                raise ValueError(f"existing table has pk {m['pk']}, got {pk}")
            self.n_buckets = m["n_buckets"]
            self.version = m["version"]
            self._buckets: dict[str, str] = dict(m["buckets"])  # bucket -> rel dir
            self._schema_json = m["schema"]
        else:
            self.n_buckets = n_buckets
            self.version = 0
            self._buckets = {}
            self._schema_json = None

    # -- manifest ------------------------------------------------------------

    def _read_manifest(self) -> dict | None:
        try:
            with open(os.path.join(self.path, MANIFEST)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _commit(self) -> None:
        on_disk = self._read_manifest()
        if on_disk is not None and on_disk["version"] != self.version - 1:
            raise ConcurrentWriteError(
                f"manifest is at v{on_disk['version']}, expected "
                f"v{self.version - 1}: another writer committed"
            )
        m = {
            "version": self.version,
            "pk": self.pk,
            "n_buckets": self.n_buckets,
            "buckets": self._buckets,
            "schema": self._schema_json,
        }
        tmp = os.path.join(self.path, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(m, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.path, MANIFEST))  # commit point

    # -- helpers -------------------------------------------------------------

    def _bucket_col(self) -> F.Column:
        key = F.concat_ws("\x01", *[F.col(c).cast("string") for c in self.pk])
        return F.pmod(F.crc32(key), F.lit(self.n_buckets)).cast("int")

    def _schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self._schema_json))

    def _read_bucket(self, rel: str) -> DataFrame:
        return self.spark.read.schema(self._schema()).parquet(
            os.path.join(self.path, rel)
        )

    # -- reads ---------------------------------------------------------------

    def read(self) -> DataFrame:
        """Current snapshot (committed version)."""
        if not self._buckets:
            if self._schema_json is None:
                raise ValueError("table is empty and has no schema yet")
            return self.spark.createDataFrame([], self._schema())
        paths = [os.path.join(self.path, rel) for rel in self._buckets.values()]
        return self.spark.read.schema(self._schema()).parquet(*paths)

    def read_changes(self, since_version: int = 1) -> DataFrame:
        """Change data feed from `since_version` (inclusive) to the
        current version: Delta CDF columns `_change_type` (insert /
        update_preimage / update_postimage / delete) and
        `_commit_version`."""
        cd = os.path.join(self.path, "changes")
        versions = []
        if os.path.isdir(cd):
            for v in sorted(os.listdir(cd)):
                if v.startswith("v") and since_version <= int(v[1:]) <= self.version:
                    versions.append(os.path.join(cd, v))
        schema = self._schema().add("_change_type", T.StringType()).add(
            "_commit_version", T.LongType()
        )
        if not versions:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*versions)

    def changes_as_changelog(self, since_version: int = 1) -> DataFrame:
        """CDF -> the engine's changelog convention (__op/__txid/__seq):
        update_preimage rows drop (the operators resolve old images by
        PK), update_postimage -> U, insert -> I, delete -> D."""
        ch = self.read_changes(since_version)
        op = (
            F.when(F.col("_change_type") == "insert", "I")
            .when(F.col("_change_type") == "update_postimage", "U")
            .when(F.col("_change_type") == "delete", "D")
        )
        return (
            ch.filter(F.col("_change_type") != "update_preimage")
            .select(
                op.alias("__op"),
                F.col("_commit_version").alias("__txid"),
                F.monotonically_increasing_id().alias("__seq"),
                *[c for c in ch.columns if not c.startswith("_")],
            )
        )

    # -- merge ---------------------------------------------------------------

    def merge(self, batch: DataFrame, delete_col: str | None = None) -> int:
        """MERGE `batch` by PK: update when matched, insert when not;
        rows with `delete_col` true delete instead. Returns the new
        committed version. Only buckets containing batch keys are
        rewritten; the rest carry forward untouched."""
        deletes = None
        if delete_col is not None:
            deletes = batch.filter(F.col(delete_col)).select(*self.pk)
            batch = batch.filter(~F.col(delete_col)).drop(delete_col)
        batch = batch.dropDuplicates(self.pk)

        if self._schema_json is None:
            self._schema_json = batch.schema.json()
        new_version = self.version + 1

        # buckets touched by this batch (one job over the slim key columns).
        # keyed/dk/cur are persisted for the duration of the merge: the
        # data write and the change-feed write otherwise recompute the
        # same join chain twice.
        keyed = batch.withColumn("__b", self._bucket_col()).persist()
        key_src = keyed.select("__b")
        dk = None
        if deletes is not None:
            dk = deletes.withColumn("__b", self._bucket_col()).persist()
            key_src = key_src.unionByName(dk.select("__b"))
        touched = sorted(r["__b"] for r in key_src.distinct().collect())

        # current rows of the touched buckets, with their bucket column
        # re-derived from the PK (buckets are a pure function of the PK)
        old_rels = [self._buckets[str(b)] for b in touched if str(b) in self._buckets]
        if old_rels:
            cur = self.spark.read.schema(self._schema()).parquet(
                *[os.path.join(self.path, rel) for rel in old_rels]
            ).withColumn("__b", self._bucket_col()).persist()
        else:
            cur = self.spark.createDataFrame([], keyed.schema)

        # set-based MERGE over all touched buckets at once
        cur_keys = cur.select(*self.pk)
        new_keys = keyed.select(*self.pk)
        pre = cur.join(new_keys, self.pk, "semi")      # matched: old image
        upd = keyed.join(cur_keys, self.pk, "semi")    # matched: new image
        ins = keyed.join(cur_keys, self.pk, "anti")
        kept = cur.join(new_keys, self.pk, "left_anti")
        if dk is not None:
            deld = kept.join(dk.select(*self.pk), self.pk, "semi")
            kept = kept.join(dk.select(*self.pk), self.pk, "left_anti")
        else:
            deld = None
        merged = kept.unionByName(keyed)

        # ONE partitioned write for every touched bucket (b=K subdirs)
        vdir = os.path.join("buckets", f"v{new_version:06d}")
        merged.write.mode("overwrite").partitionBy("__b").parquet(
            os.path.join(self.path, vdir)
        )
        for b in touched:
            rel = os.path.join(vdir, f"__b={b}")
            # partitionBy writes a dir only if the bucket has rows; an
            # all-deleted bucket becomes an empty entry
            self._buckets[str(b)] = rel
            os.makedirs(os.path.join(self.path, rel), exist_ok=True)

        # change feed for this version, one write
        def tag(df: DataFrame | None, t: str) -> DataFrame | None:
            if df is None:
                return None
            return df.drop("__b").select(
                "*",
                F.lit(t).alias("_change_type"),
                F.lit(new_version).cast("long").alias("_commit_version"),
            )

        parts = [p for p in (tag(ins, "insert"), tag(pre, "update_preimage"),
                             tag(upd, "update_postimage"), tag(deld, "delete"))
                 if p is not None]
        changes = parts[0]
        for p in parts[1:]:
            changes = changes.unionByName(p)
        changes.write.mode("overwrite").parquet(
            os.path.join(self.path, "changes", f"v{new_version:06d}")
        )

        keyed.unpersist()
        if dk is not None:
            dk.unpersist()
        if old_rels:
            cur.unpersist()
        self.version = new_version
        self._commit()
        self._vacuum()
        return new_version

    def _vacuum(self, keep_versions: int = 2) -> None:
        """Drop bucket dirs not referenced by the manifest and older than
        keep_versions (crash-rollback window)."""
        bd = os.path.join(self.path, "buckets")
        if not os.path.isdir(bd):
            return
        live = {rel.split(os.sep)[1] for rel in self._buckets.values()}
        floor = self.version - keep_versions + 1
        for v in os.listdir(bd):
            if not v.startswith("v"):
                continue
            if int(v[1:]) < floor and v not in live:
                shutil.rmtree(os.path.join(bd, v), ignore_errors=True)


def foreach_batch_merge(path: str, pk: list[str], delete_col: str | None = None,
                        n_buckets: int = 16):
    """writeStream.foreachBatch factory backed by TransactionalTable —
    the epoch-committed MERGE sink (atomic, bucket-pruned)."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        TransactionalTable(batch.sparkSession, path, pk, n_buckets).merge(
            batch, delete_col=delete_col
        )

    return fn
