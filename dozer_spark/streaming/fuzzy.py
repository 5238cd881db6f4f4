"""Streaming fuzzy-match index: incremental edit-distance-1 entity
matching against the entire accumulated corpus.

The streaming face of ops/fuzzy.fuzzy_self_join_dist1 — the record-
linkage shape a CDC pipeline needs ("does this new customer name match
anything we've ever seen, modulo one typo?") without recomputing old
variants. State is the deletion-variant key table (variant, id,
string) — O(corpus x len) rows but short strings only — kept as a
delta-log DiffStateTable when durable (O(batch) epoch IO); each batch
explodes its own variants with the SAME shared helper the batch op
uses (the streaming output cannot drift from the batch oracle), probes
state for cross-epoch candidates, self-joins for within-batch
candidates, and verifies every candidate with ``levenshtein``.

Durable probe cost (the round-10 verdict's one scale-killer, fixed
round 11): the variant state is hash-BUCKETED BY THE VARIANT KEY
(bucket_cols=["__k"], state_buckets dirs), so the per-epoch new-old
probe reads only the state buckets the batch's variant keys hash to
(DiffStateTable.read_live_pruned) — O(matched buckets), not O(state) —
and the batch side broadcasts under the size gate so the state side is
a pure pruned scan with NO per-epoch shuffle or sort. A trickle batch
(the CDC serving regime) touches few buckets and pays near-constant
cost regardless of corpus size; a bulk batch degrades gracefully to a
full-bucket scan, still shuffle-free when the batch fits the gate. The
seen-id re-delivery check moved off the wide variant state onto a slim
per-id table (fuzzy_ids: one row per name, not one per variant), so no
epoch ever materializes the full variant state outside the amortized
TTL prune.

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
                 prune_every: int = 8, state_buckets: int = 256):
        """ts_col/retain enable BOUNDED-RECALL mode (the same contract
        as StreamingMinHashDedup): names are matched against a sliding
        event-time window instead of all history — a pair is emitted
        only when BOTH members' ts are >= watermark - retain at the
        later member's arrival, rows beyond the horizon are dropped on
        arrival (they could never pair), and the PHYSICAL state prune
        is amortized (every prune_every batches), making state
        O(window) instead of O(corpus).

        state_buckets: hash-bucket count of the durable variant-key
        state — the probe-prune granularity AND the deployment's
        parallelism lever (a resumed state keeps the count it was built
        with). More buckets = finer trickle-probe pruning + smaller
        files; size so state_rows/state_buckets stays a healthy parquet
        file (~tens of MB) at the target corpus."""
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
        self._keys = None  # ephemeral mode: (id, __str, __k[, __ts])
        self._seen = None  # durable mode: (id[, __ts])
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
                bucket_cols=["__k"], n_buckets=state_buckets,
            )
            self._ids_tx = DiffStateTable(
                spark, diff_state_path(state_dir, "fuzzy_ids"),
                key_cols=["id"],
            )
            if self._store.epoch > 0:
                ids_meta = self._store.load_meta("fuzzy_ids_txv")
                if ids_meta is None:
                    raise ValueError(
                        "StreamingFuzzyIndex: durable state at "
                        f"{state_dir!r} predates the bucketed-probe "
                        "layout (no fuzzy_ids state); delete the state "
                        "dir to rebuild"
                    )
                self._seen = self._ids_tx.read_committed(ids_meta)
                # restore the variant log position (pending deltas /
                # base version) for the pruned per-epoch probe reads
                self._tx.read_committed(self._store.load_meta("fuzzy_txv"))
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

        durable = self._store is not None
        idc = self.id_col
        sel = [F.col(idc).alias("id"), F.col(self.str_col).alias("__str")]
        if self.retain is not None:
            sel.append(F.col(self.ts_col).alias("__ts"))
        rows = (
            rows.select(*sel)
            .filter(F.col("__str").isNotNull())
            .dropDuplicates(["id"])
        )
        # at-least-once re-delivery: skip ids already indexed. Durable
        # mode checks the slim per-id table (one row per name); the
        # ephemeral fallback projects the in-memory variant frame.
        seen_ids = (self._seen if durable
                    else (self._keys if self._keys is not None else None))
        if seen_ids is not None:
            rows = rows.join(seen_ids.select("id"), "id", "left_anti")

        # bounded-recall: advance the watermark, drop rows beyond the
        # horizon (they could never pair), window-restrict the probe
        cutoff = None
        if self.retain is not None:
            mx = rows.agg(F.max("__ts")).first()[0]
            if mx is not None and (self._watermark is None
                                   or mx > self._watermark):
                self._watermark = mx
            if self._watermark is not None:
                cutoff = (F.lit(self._watermark)
                          - F.expr(f"INTERVAL {self.retain}"))
                rows = rows.filter(F.col("__ts") >= cutoff)

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

        # new-vs-old probe: durable state reads ONLY the buckets the
        # batch's variant keys hash to; ephemeral state is the full
        # in-memory frame (tests/oracle replays)
        old_keys = None
        if durable:
            if self._batches > 0:
                bids = self._tx.touched_bucket_ids(keys_new)
                old_keys = self._tx.read_live_pruned(bids)
        else:
            old_keys = self._keys
        if old_keys is not None and cutoff is not None:
            old_keys = old_keys.filter(F.col("__ts") >= cutoff)
        if old_keys is not None:
            # join strategy: pin the BATCH side to a broadcast when its
            # measured cache size clears the gate — the state side then
            # streams through a hash probe with no shuffle and no sort.
            # Too-big batch: fall back to SMJ via an explicit merge hint
            # (the exploded batch sits right on its source, so Catalyst
            # under-sizes it — explode fan-out is invisible to scan
            # stats — and would wrongly broadcast it at scale; SMJ
            # spills where a hash relation cannot).
            kb = maybe_broadcast(keys_new, self.gate)
            if kb is keys_new:
                a = keys_new.hint("merge").alias("a")
                o = maybe_broadcast(old_keys, self.gate).alias("o")
            else:
                a = kb.alias("a")
                o = old_keys.alias("o")
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
            and self._batches > 0
            and self._batches % self.prune_every == self.prune_every - 1
        )
        if durable:
            epoch = self._store.epoch + 1
            delta = keys_new.withColumn(
                "__fk", row_digest(["__k", "id"])
            ).withColumn("__del", F.lit(False))
            id_cols = ["id"] + (["__ts"] if self.retain is not None else [])
            ids_delta = rows.select(*id_cols).withColumn(
                "__del", F.lit(False))
            if do_prune:
                # the one full-state read of the design, paid every
                # prune_every epochs, never on the probe path
                stale = self._tx.read_live().filter(F.col("__ts") < cutoff)
                delta = delta.unionByName(
                    stale.withColumn("__fk", row_digest(["__k", "id"]))
                    .withColumn("__del", F.lit(True))
                )
                ids_delta = ids_delta.unionByName(
                    self._seen.filter(F.col("__ts") < cutoff)
                    .withColumn("__del", F.lit(True))
                )
            meta = self._tx.advance(delta, epoch, "fz_keys",
                        fresh_keys=not do_prune)
            ids_meta = self._ids_tx.advance(ids_delta, epoch, "fz_ids",
                                fresh_keys=not do_prune)
            self._store.stage_meta("fuzzy_txv", meta)
            self._store.stage_meta("fuzzy_ids_txv", ids_meta)
            self._store.stage_meta("fz_geom", _GEOM)
            if self.retain is not None:
                self._store.stage_meta(
                    "fz_wm",
                    {"wm": self._watermark.isoformat()
                     if self._watermark is not None else None},
                )
            self._seen = self._ids_tx.read_live()
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
