"""Fuzzy string matching for entity resolution / text normalization.

Edit-distance joins are the core primitive of record linkage (matching
dirty entity names across sources) and of spelling-variant mining in a
text-cleaning pipeline. The naive form is a quadratic cross join; the
classic mitigation (length-band blocking) still leaves O(band^2) work
inside each band and collapses entirely on fixed-format keys where every
string has the same length.

This module implements the FastSS deletion-neighborhood join (Bocek et
al. 2007, "Fast Similarity Search in Large Dictionaries"): two strings
are within edit distance 1 iff they are equal, one is a single-character
deletion of the other, or they share a same-position single-deletion
variant. Emitting each string's deletion neighborhood
``{s} ∪ {del_i(s)}`` as join keys therefore turns the edit-distance join
into an EQUI-join — candidate generation is linear (n x len keys, hash-
shuffled on the variant key like any groupBy), followed by an exact
``levenshtein`` verify that removes the cross-position false candidates
(e.g. "ab"/"ba" share the deletion key "a" but are distance 2).

At 100 TB this is the right shape: no quadratic block anywhere, the
variant-key shuffle distributes on high-cardinality short strings, the
verify is a JVM-side built-in on an already-bounded candidate set (each
key bucket holds only the strings that collide on one specific variant).
The reference engine has no fuzzy-match support at all (SURVEY.md §2.4
negative space); Spark supplies ``levenshtein`` natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column) -> Column:
    """Array of the string itself plus every single-character deletion.

    ``array_distinct`` collapses repeated variants (deleting either of
    two adjacent equal characters yields the same string). Empty strings
    contribute only themselves (guarded: Spark's sequence(1, 0) would
    count DOWN, not produce an empty array).
    """
    dels = F.when(
        F.length(col) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                col.substr(F.lit(1), i - F.lit(1)),
                col.substr(i + F.lit(1), F.length(col)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(F.array(col), dels))


def fuzzy_self_join_dist1(
    df: DataFrame,
    id_col: str,
    str_col: str,
    hot_cap: int = 4096,
    broadcast_gate_bytes: int | None = None,
) -> DataFrame:
    """All pairs of rows whose ``str_col`` values are within edit
    distance 1 (including exact duplicates under distinct ids).

    Output: (id_a, id_b, s_a, s_b, dist) with id_a < id_b, dist in
    {0, 1}. Exact — the deletion neighborhood is a complete candidate
    generator for distance <= 1, and every candidate is verified with
    ``levenshtein``.

    The variant-key self-join goes through the shared
    ``_blocked_self_join_pairs`` machinery (the MinHash/SimHash band
    join): a hot variant key (short strings are dense — every 2-char
    string containing 'x' collides on the variant 'x') gets the
    triangle-fragment split, bounding any one join cell at ~hot_cap^2
    work with identical output. Both sides carry a ``merge``
    (sort-merge) hint: the exploded key table sits directly on a scan,
    so Catalyst's size estimate ignores the ~len-per-row explode
    fan-out and would otherwise pick a driver-OOM broadcast (measured
    at 2M names); sort-merge over shuffled-hash because the hash
    relation cannot spill — SMJ degrades gracefully whatever the key
    table's real size turns out to be.

    FastSS generalizes to distance d via d-deletion neighborhoods
    (O(len^d) keys per string); this implementation fixes d=1, the
    record-linkage sweet spot where the neighborhood stays linear.
    """
    from dozer_spark.ops.dedup import _blocked_self_join_pairs

    s = (
        df.select(F.col(id_col).alias("id"), F.col(str_col).alias("__str"))
        .filter(F.col("__str").isNotNull())
    )
    keys = s.select(
        "id", "__str", F.explode(deletion_variants(F.col("__str"))).alias("__k")
    ).hint("merge")
    cand = _blocked_self_join_pairs(
        keys, ["__k"], "id", hot_cap=hot_cap,
        broadcast_gate_bytes=broadcast_gate_bytes,
        carry=(("s_a", "s_b", "__str"),),
    )
    return (
        cand.withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= 1)
        .select(
            "id_a", "id_b", "s_a", "s_b",
            F.col("dist").cast("int").alias("dist"),
        )
    )
