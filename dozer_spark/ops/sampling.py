"""Deterministic sampling for training-data pipelines.

df.sample() is seed-and-partitioning dependent — useless for reproducible
dataset cards or cross-engine verification. Hash-based sampling (keep a
row iff md5(key) lands under the cutoff) is:
- deterministic and engine-portable (same md5 everywhere),
- stable under repartitioning/retries,
- composable: the same row is in/out of the sample regardless of when or
  where the pipeline runs (critical for incremental dataset builds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5 prefix of 8 hex chars -> uniform 32-bit bucket
_BUCKETS = 1 << 32


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform [0, 2^32) bucket from a row key (md5-based, seeded by salt)."""
    s = F.concat(F.lit(salt + ":"), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep ~fraction of rows, deterministically by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    cutoff = int(fraction * _BUCKETS)
    return df.filter(hash_bucket(F.col(key_col), salt) < cutoff)


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep all rare ones): fraction chosen by strata value."""
    cutoff = None
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        c = F.when(F.col(strata_col) == value, F.lit(int(frac * _BUCKETS)))
        cutoff = c if cutoff is None else cutoff.when(
            F.col(strata_col) == value, F.lit(int(frac * _BUCKETS))
        )
    cutoff = (
        cutoff.otherwise(F.lit(int(default_fraction * _BUCKETS)))
        if cutoff is not None
        else F.lit(int(default_fraction * _BUCKETS))
    )
    return df.filter(hash_bucket(F.col(key_col), salt) < cutoff)


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic, leakage-free split: a key is ALWAYS on the same side
    regardless of runs/engines/partitioning."""
    cutoff = int(test_fraction * _BUCKETS)
    b = hash_bucket(F.col(key_col), salt)
    return df.filter(b >= cutoff), df.filter(b < cutoff)
