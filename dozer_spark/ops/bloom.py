"""Broadcast Bloom filter for membership prefilters.

The scale problem this solves: a semi-join against a "small" reference
set (eval-suite n-grams for decontamination, a blocklist, a seen-id
set) stops being broadcastable once the reference set's ROW bytes
outgrow the broadcast gate — a distinct gram table costs ~40+ bytes a
row, so ~200M grams already exceed an 8 GB gate and the join degrades
to a corpus-sized shuffle. A Bloom bitmap costs ~1.2 bytes per item at
1% false-positive rate (~9.6 bits), extending the no-corpus-shuffle
regime ~30x; the corpus side then shuffles only the bloom-surviving
superset into the exact confirm join, so the END RESULT is exactly the
exact path's (no false negatives by construction; false positives are
killed by the confirm join).

Deterministic by construction: positions derive from two xxhash64
values via Kirsch–Mitzenmacher double hashing pos_i = h1 + i*h2
(mod m) — h1/h2 are computed NATIVELY in Spark (JVM-side, codegen) on
both the build and probe sides, so the Python side never re-tokenizes
or re-hashes strings; it only folds two int64 columns against the
broadcast bitmap with vectorized numpy.

Reference scope: beyond dozer's surface — corpus-pipeline family
(SURVEY.md §2 extension list); the pattern is the standard one from
Spark's own runtime-filter work (InjectRuntimeFilter's bloom pushdown)
re-expressed at the application layer where the reference set is a
DataFrame, not a join side.
"""

from __future__ import annotations

import math

# module-global: pandas_udf typehint resolution needs `pd` importable
# from the defining module's globals under future-annotations
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _geometry(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n ln p / (ln 2)^2 bits, k = m/n ln 2
    hashes; floors keep the degenerate empty/tiny set well-defined."""
    n = max(1, n_items)
    m_bits = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m_bits / n * math.log(2))))
    return m_bits, min(k, 16)


def _hash_cols(col):
    """The two base hashes (native, JVM-side). Both sides of the filter
    MUST go through this function so build and probe agree bit-for-bit."""
    return (F.xxhash64(col).alias("__h1"),
            F.xxhash64(col, F.lit(1)).alias("__h2"))


class BloomFilter:
    """An immutable broadcast Bloom filter over one column's values.

    build() aggregates per-partition bitmaps executor-side (each task
    emits ONE m/8-byte row; the driver ORs ~n_partitions bitmaps — the
    only driver materialization, bounded by partitions * m/8 bytes, and
    m is chosen from the REFERENCE set size, which is small by the
    premise of using a Bloom filter at all). contains() returns a
    boolean Column usable in any filter.
    """

    def __init__(self, bitmap: bytes, m_bits: int, k: int, spark):
        self.m_bits = m_bits
        self.k = k
        self._bc = spark.sparkContext.broadcast(bitmap)

    @classmethod
    def build(cls, items: DataFrame, col: str, fpp: float = 0.01,
              n_items: int | None = None) -> "BloomFilter":
        spark = items.sparkSession
        if n_items is None:
            n_items = items.count()
        m_bits, k = _geometry(n_items, fpp)
        m_bytes = (m_bits + 7) // 8
        hashed = items.select(*_hash_cols(F.col(col)))

        def to_bitmaps(batches):
            bm = np.zeros(m_bytes, dtype=np.uint8)
            for pdf in batches:
                h1 = pdf["__h1"].to_numpy().astype(np.uint64)
                h2 = pdf["__h2"].to_numpy().astype(np.uint64)
                for i in range(k):
                    pos = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                    np.bitwise_or.at(
                        bm, (pos >> np.uint64(3)).astype(np.int64),
                        np.left_shift(
                            np.uint8(1),
                            (pos & np.uint64(7)).astype(np.uint8)),
                    )
            yield pd.DataFrame({"bm": [bm.tobytes()]})

        parts = hashed.mapInPandas(to_bitmaps, "bm binary").collect()
        out = np.zeros(m_bytes, dtype=np.uint8)
        for r in parts:
            out |= np.frombuffer(r.bm, dtype=np.uint8)
        return cls(out.tobytes(), m_bits, k, spark)

    def contains(self, col) -> "F.Column":
        """Boolean membership test Column (true = maybe-present, with
        the built fpp; false = definitely absent). Vectorized pandas
        probe over the two native hash columns."""
        from pyspark.sql.functions import pandas_udf

        bc, m_bits, k = self._bc, self.m_bits, self.k

        @pandas_udf("boolean")
        def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
            bm = np.frombuffer(bc.value, dtype=np.uint8)
            a = h1.to_numpy().astype(np.uint64)
            b = h2.to_numpy().astype(np.uint64)
            ok = np.ones(len(a), dtype=bool)
            for i in range(k):
                pos = (a + np.uint64(i) * b) % np.uint64(m_bits)
                byte = (pos >> np.uint64(3)).astype(np.int64)
                mask = np.left_shift(np.uint8(1),
                                     (pos & np.uint64(7)).astype(np.uint8))
                ok &= (bm[byte] & mask) != 0
            return pd.Series(ok)

        c1, c2 = _hash_cols(col)
        return probe(c1, c2)
