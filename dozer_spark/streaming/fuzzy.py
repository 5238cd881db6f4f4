"""Streaming fuzzy-match index: incremental edit-distance-1 entity
matching against the entire accumulated corpus.

The streaming face of ops/fuzzy.fuzzy_self_join_dist1 — the record-
linkage shape a CDC pipeline needs ("does this new customer name match
anything we've ever seen, modulo one typo?") without recomputing old
variants. Same state/probe design as StreamingMinHashDedup: state is
the deletion-variant key table (variant, id, string) — O(corpus x len)
rows but short strings only — kept as a delta-log DiffStateTable when
durable (O(batch) epoch IO); each batch explodes its own variants with
the SAME shared helper the batch op uses (the streaming output cannot
drift from the batch oracle), probes state for cross-epoch candidates,
self-joins for within-batch candidates, and verifies every candidate
with ``levenshtein``.

Exactly-once pair emission: ids already in state are skipped
(at-least-once re-delivery safe), so a pair is discoverable only in the
epoch its LATER member first arrives — within-batch pairs via the
new-new join, cross-epoch pairs via the new-old probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dozer_spark.streaming.dedup import _check_state_geometry

_GEOM = {"max_dist": 1}


class StreamingFuzzyIndex:
    def __init__(self, spark, str_col: str, id_col: str,
                 state_dir: str | None = None,
                 broadcast_gate_bytes: int | None = None):
        self.spark = spark
        self.str_col = str_col
        self.id_col = id_col
        self.gate = broadcast_gate_bytes
        self._keys = None  # (id, s, __k)
        self._store = None
        self._prev_caches: list = []
        if state_dir is not None:
            from dozer_spark.streaming.incstate import (
                DiffStateTable,
                diff_state_path,
            )
            from dozer_spark.streaming.state import StateStore

            self._store = StateStore(spark, state_dir)
            _check_state_geometry(
                self._store, "fz_geom", _GEOM, "StreamingFuzzyIndex")
            self._tx = DiffStateTable(
                spark, diff_state_path(state_dir, "fuzzy_keys"),
                key_cols=["__fk"], internal_key=True,
            )
            if self._store.epoch > 0:
                self._keys = self._tx.read_committed(
                    self._store.load_meta("fuzzy_txv"))

    def process_batch(self, rows: DataFrame) -> DataFrame:
        """Edit-distance-<=1 pairs (id_a, id_b, s_a, s_b, dist) newly
        discoverable with this batch."""
        from dozer_spark.operators.hints import maybe_broadcast
        from dozer_spark.ops.fuzzy import deletion_variants
        from dozer_spark.streaming.changelog import row_digest

        for df in self._prev_caches:
            df.unpersist()
        self._prev_caches = []

        idc = self.id_col
        rows = (
            rows.select(F.col(idc).alias("id"),
                        F.col(self.str_col).alias("__str"))
            .filter(F.col("__str").isNotNull())
            .dropDuplicates(["id"])
        )
        if self._keys is not None:
            rows = rows.join(
                self._keys.select("id"), "id", "left_anti")

        keys_new = rows.select(
            "id", "__str", F.explode(deletion_variants(F.col("__str"))).alias("__k")
        ).persist()

        # new-vs-new: the full batch machinery (hot-bucket split, gated
        # broadcasts) — identical output guarantees to the batch op
        from dozer_spark.ops.dedup import _blocked_self_join_pairs

        nn = _blocked_self_join_pairs(
            keys_new, ["__k"], "id", hot_cap=4096,
            broadcast_gate_bytes=self.gate,
            carry=(("s_a", "s_b", "__str"),),
        )
        cand = nn
        if self._keys is not None:
            # merge (SMJ): the exploded batch keys sit right on the
            # source, so Catalyst under-sizes them (explode fan-out is
            # invisible to scan stats) and would broadcast at scale;
            # SMJ spills where a hash relation cannot
            a = keys_new.hint("merge").alias("a")
            o = maybe_broadcast(self._keys, self.gate).alias("o")
            older = F.col("o.id") < F.col("a.id")
            no = (
                a.join(o, F.col("a.__k") == F.col("o.__k"))
                .filter(F.col("a.id") != F.col("o.id"))
                .select(
                    F.least(F.col("a.id"), F.col("o.id")).alias("id_a"),
                    F.greatest(F.col("a.id"), F.col("o.id")).alias("id_b"),
                    F.when(older, F.col("o.__str")).otherwise(F.col("a.__str"))
                    .alias("s_a"),
                    F.when(older, F.col("a.__str")).otherwise(F.col("o.__str"))
                    .alias("s_b"),
                )
            )
            cand = cand.unionByName(no)
        pairs = (
            cand.dropDuplicates(["id_a", "id_b"])
            .withColumn("dist", F.levenshtein("s_a", "s_b"))
            .filter(F.col("dist") <= 1)
            .select("id_a", "id_b", "s_a", "s_b",
                    F.col("dist").cast("int").alias("dist"))
            .localCheckpoint(eager=False)
        )

        if self._store is not None:
            epoch = self._store.epoch + 1
            delta = keys_new.withColumn(
                "__fk", row_digest(["__k", "id"])
            ).withColumn("__del", F.lit(False))
            meta = self._tx.advance(delta, epoch, "fz_keys")
            self._store.stage_meta("fuzzy_txv", meta)
            self._store.stage_meta("fz_geom", _GEOM)
            self._keys = self._tx.read_live()
            self._store.commit()
        else:
            ck = keys_new.localCheckpoint(eager=True)
            self._keys = (ck if self._keys is None
                          else self._keys.unionByName(ck))
        self._prev_caches = [keys_new]
        return pairs
