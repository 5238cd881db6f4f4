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
                 broadcast_gate_bytes: int | None = None,
                 ts_col: str | None = None, retain: str | None = None,
                 prune_every: int = 8):
        """ts_col/retain enable BOUNDED-RECALL mode (the same contract
        as StreamingMinHashDedup): names are matched against a sliding
        event-time window instead of all history — a pair is emitted
        only when BOTH members' ts are >= watermark - retain at the
        later member's arrival, rows beyond the horizon are dropped on
        arrival (they could never pair), and the PHYSICAL state prune
        is amortized (every prune_every batches), making state
        O(window) instead of O(corpus). This is the lever for the
        measured O(state) per-epoch probe cost of full-history matching
        (SCALING.md, streaming fuzzy section)."""
        self.spark = spark
        self.str_col = str_col
        self.id_col = id_col
        self.gate = broadcast_gate_bytes
        if retain is not None and ts_col is None:
            raise ValueError("retain requires ts_col")
        self.ts_col = ts_col
        self.retain = retain
        self.prune_every = prune_every
        self._watermark = None
        self._batches = 0
        self._keys = None  # (id, __str, __k[, __ts])
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
                wm = self._store.load_meta("fz_wm")
                if wm and wm.get("wm") is not None:
                    import datetime as _dt

                    self._watermark = _dt.datetime.fromisoformat(wm["wm"])
                self._batches = self._store.epoch

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
        sel = [F.col(idc).alias("id"), F.col(self.str_col).alias("__str")]
        if self.retain is not None:
            sel.append(F.col(self.ts_col).alias("__ts"))
        rows = (
            rows.select(*sel)
            .filter(F.col("__str").isNotNull())
            .dropDuplicates(["id"])
        )
        if self._keys is not None:
            rows = rows.join(
                self._keys.select("id"), "id", "left_anti")

        # bounded-recall: advance the watermark, drop rows beyond the
        # horizon (they could never pair), window-restrict the probe
        cutoff = None
        old_keys = self._keys
        if self.retain is not None:
            mx = rows.agg(F.max("__ts")).first()[0]
            if mx is not None and (self._watermark is None
                                   or mx > self._watermark):
                self._watermark = mx
            if self._watermark is not None:
                cutoff = (F.lit(self._watermark)
                          - F.expr(f"INTERVAL {self.retain}"))
                rows = rows.filter(F.col("__ts") >= cutoff)
                if old_keys is not None:
                    old_keys = old_keys.filter(F.col("__ts") >= cutoff)

        cols = ["id", "__str"] + (["__ts"] if self.retain is not None else [])
        keys_new = rows.select(
            *cols, F.explode(deletion_variants(F.col("__str"))).alias("__k")
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
        if old_keys is not None:
            # merge (SMJ): the exploded batch keys sit right on the
            # source, so Catalyst under-sizes them (explode fan-out is
            # invisible to scan stats) and would broadcast at scale;
            # SMJ spills where a hash relation cannot
            a = keys_new.hint("merge").alias("a")
            o = maybe_broadcast(old_keys, self.gate).alias("o")
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

        # amortized PHYSICAL prune (correctness never depends on it —
        # the probe filters by cutoff)
        do_prune = (
            self.retain is not None and cutoff is not None
            and self._keys is not None
            and self._batches % self.prune_every == self.prune_every - 1
        )
        if self._store is not None:
            epoch = self._store.epoch + 1
            delta = keys_new.withColumn(
                "__fk", row_digest(["__k", "id"])
            ).withColumn("__del", F.lit(False))
            if do_prune:
                delta = delta.unionByName(
                    self._keys.filter(F.col("__ts") < cutoff)
                    .withColumn("__fk", row_digest(["__k", "id"]))
                    .withColumn("__del", F.lit(True))
                )
            meta = self._tx.advance(delta, epoch, "fz_keys")
            self._store.stage_meta("fuzzy_txv", meta)
            self._store.stage_meta("fz_geom", _GEOM)
            if self.retain is not None:
                self._store.stage_meta(
                    "fz_wm",
                    {"wm": self._watermark.isoformat()
                     if self._watermark is not None else None},
                )
            self._keys = self._tx.read_live()
            self._store.commit()
        else:
            ck = keys_new.localCheckpoint(eager=True)
            self._keys = (ck if self._keys is None
                          else self._keys.unionByName(ck))
            if do_prune:
                self._keys = self._keys.filter(
                    F.col("__ts") >= cutoff
                ).localCheckpoint(eager=True)
        self._batches += 1
        self._prev_caches = [keys_new]
        return pairs
