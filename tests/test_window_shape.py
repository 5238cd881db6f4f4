"""Driver-harness output-shape compatibility for the CORRECTNESS window.

The driver's canonicalizer converts each sampled query result to pandas
and runs ``sort_values`` over ALL columns; pandas factorizes each
column, which raises ``TypeError: unhashable type`` on list/dict cells
— i.e. any Spark array/map/struct output column. Round 11's
``pca_project_frozen`` emitted ``pc: array<double>`` and err'd in the
harness despite bit-exact values (VERDICT r11, "What's wrong" #1); the
registry query now posexplodes to scalar ``(vec_id, k, pc_k)`` rows.

These tests make that class of failure unshippable:

- every entry in the driver's sampled window (the FIRST 50 of
  ``registry()``) must have an atomic-only schema (cheap, lazy build);
- every ``window=True`` entry must survive the literal driver canon
  (execute at sf0.001 → pandas → ``sort_values`` over all columns);
- the r11 failure shape itself is demonstrated to FAIL the canon, so
  the check provably catches what the driver caught.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from dozer_spark.queries import registry
from tests.conftest import SF_SMOKE

WINDOW_SIZE = 50  # the driver samples the first 50 registry entries

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _window_entries():
    items = list(registry().items())
    return items[:WINDOW_SIZE]


def _driver_canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """The exact operation the driver's canonicalizer performs that
    array cells break: a full-column sort_values (lexsort factorizes
    every column)."""
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


@pytest.mark.slow
def test_window_schemas_are_atomic(spark):
    """No query in the driver's sampled window may emit an
    array/map/struct column — the canonicalizer cannot factorize it."""
    bad = []
    for name, q in _window_entries():
        df = q.build(spark, SF_SMOKE)
        for f in df.schema.fields:
            if isinstance(f.dataType, _COMPLEX):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, (
        "driver-window queries with non-atomic output columns "
        f"(canonicalizer-incompatible): {bad}"
    )


@pytest.mark.slow
def test_window_flagged_results_survive_driver_canon(spark):
    """Every window=True entry, executed at sf0.001 and converted to
    pandas, must factorize under sort_values — the literal driver
    canon. (A subset of the schema check above, but executed: catches
    exotic scalar types pandas still can't lexsort.)"""
    flagged = [(n, q) for n, q in registry().items() if q.window]
    assert flagged, "window=True entries disappeared from the registry"
    for name, q in flagged:
        pdf = q.build(spark, SF_SMOKE).limit(200).toPandas()
        canon = _driver_canon(pdf)  # must not raise
        assert len(canon) == len(pdf), name


def test_array_output_fails_driver_canon(spark):
    """Regression demonstration: the r11 pca_project_frozen shape (an
    array<double> `pc` column) raises in the driver canon — proving
    these tests would have caught CORRECTNESS_r11's one red row."""
    from dozer_spark.ops.embedding import pca_project_frozen
    from dozer_spark.ops.pca_frozen import (
        FROZEN_PCA_COMPONENTS_8x64,
        FROZEN_PCA_MEAN_64,
    )
    from dozer_spark.registry import Catalog

    e = Catalog.from_testdata(spark, SF_SMOKE).df("embeddings")
    old_shape = pca_project_frozen(
        e, "embedding", FROZEN_PCA_MEAN_64, FROZEN_PCA_COMPONENTS_8x64,
        id_col="vec_id")
    pdf = old_shape.limit(5).toPandas()
    with pytest.raises(TypeError, match="unhashable"):
        _driver_canon(pdf)
