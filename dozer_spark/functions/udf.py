"""User-defined functions — parity with the reference's UDF surface.

Reference supports three UDF kinds (dozer-types/src/models/udf_config.rs):
- Python UDF: CPython call with declared return type
  (dozer-sql/expression/src/python_udf.rs:1-81)
- ONNX UDF: runs an ONNX model over float args
  (dozer-sql/expression/src/onnx/udf.rs)
- JavaScript (Deno) UDF — out of scope here (documented).

Spark-first: Python UDFs are native, but we default every registration to
the Arrow/pandas path (10-100x over row-at-a-time); scalar python UDFs
are available behind vectorize=False for exact row semantics.

The ONNX path is plumbed (batched pandas UDF, model loaded once per
executor via a lazy singleton) with the actual onnxruntime import gated —
the library is not in this container, so model execution raises
NotImplementedError unless onnxruntime is installed; the Spark-side
plumbing is real and tested with a fake session object.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf


def register_python_udf(
    spark: SparkSession,
    name: str,
    fn: Callable,
    return_type: T.DataType,
    vectorize: bool = True,
):
    """Register `name` for use in spark.sql()/expr().

    vectorize=True wraps a scalar python function into a pandas UDF
    (fn applied per element of each Arrow batch); False registers a
    row-at-a-time UDF (slow path, exact scalar semantics).
    """
    if vectorize:

        @pandas_udf(return_type)
        def _vec(*cols: pd.Series) -> pd.Series:
            if len(cols) == 1:
                return cols[0].map(fn)
            return pd.Series([fn(*vals) for vals in zip(*cols)])

        spark.udf.register(name, _vec)
        return _vec
    wrapped = udf(fn, return_type)
    spark.udf.register(name, wrapped)
    return wrapped


class _OnnxModel:
    """Lazy per-executor ONNX session (loaded once per worker process)."""

    def __init__(self, path: str):
        self.path = path
        self._session = None

    def session(self):
        if self._session is None:
            try:
                import onnxruntime  # noqa: F401  (not bundled in this container)
            except ImportError as e:  # pragma: no cover - env without onnxruntime
                raise NotImplementedError(
                    "onnxruntime is not installed in this environment; "
                    "the ONNX UDF plumbing is stubbed (reference: "
                    "dozer-sql/expression/src/onnx/udf.rs)"
                ) from e
            self._session = onnxruntime.InferenceSession(self.path)
        return self._session

    def run(self, batch: np.ndarray) -> np.ndarray:
        sess = self.session()
        inp = sess.get_inputs()[0].name
        return sess.run(None, {inp: batch.astype(np.float32)})[0]


def register_onnx_udf(
    spark: SparkSession,
    name: str,
    model_path: str,
    n_inputs: int,
    runner: Callable[[np.ndarray], np.ndarray] | None = None,
):
    """ONNX UDF over float columns -> double, Arrow-batched.

    `runner` injects a model-execution function (tests pass a fake; the
    default builds an onnxruntime session lazily per executor)."""
    model = _OnnxModel(model_path)
    run = runner if runner is not None else model.run

    @pandas_udf(T.DoubleType())
    def _onnx(*cols: pd.Series) -> pd.Series:
        batch = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        out = np.asarray(run(batch)).reshape(len(cols[0]), -1)
        return pd.Series(out[:, 0].astype(np.float64))

    spark.udf.register(name, _onnx)
    return _onnx
