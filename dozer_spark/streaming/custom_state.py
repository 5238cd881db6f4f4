"""Custom stateful operators via transformWithStateInPandas.

The reference lets any processor keep arbitrary per-key state
(Processor::process with its own maps, dozer-core/src/node.rs:89-96).
Spark's structured-streaming analogue is the StatefulProcessor API
(transformWithStateInPandas, Spark 4): per-key value/list/map state in
the state store, optional TTL, timers — durable via checkpointLocation
instead of process memory.

`KeyedAccumulator` packages the most common reference shape: per-group
running aggregates maintained incrementally with optional state TTL
(lifetime.rs semantics). It also runs in BATCH mode (Spark 4 allows
transformWithStateInPandas on batch DataFrames) — which is how the unit
tests drive it without a streaming source.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


class _AccumulatorProcessor(StatefulProcessor):
    """Per-key accumulator: state <- update(state, batch_pdf); emits one
    row per key per batch with the current accumulator value."""

    def __init__(self, state_schema: T.StructType, init: tuple,
                 update: Callable[[tuple, pd.DataFrame], tuple],
                 ttl_ms: int | None = None):
        self._schema = state_schema
        self._init = init
        self._update = update
        self._ttl = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("acc", self._schema, self._ttl)

    def handleInputRows(self, key, rows, timerValues):
        acc = self._state.get() if self._state.exists() else self._init
        for pdf in rows:
            acc = self._update(tuple(acc), pdf)
        self._state.update(tuple(acc))
        yield pd.DataFrame(
            [{**{f"_{i}": k for i, k in enumerate(key)}, **dict(zip(
                [f.name for f in self._schema.fields], acc))}]
        ).rename(columns={f"_{i}": c for i, c in enumerate(self._key_cols)})

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf on the Python workers
    (its state-server wire protocol); absent in some environments."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class KeyedAccumulator:
    """Declarative per-key stateful accumulator.

    keys: grouping columns; state_schema: accumulator fields; init:
    initial accumulator tuple; update(acc, pdf) -> acc folds one Arrow
    batch of a key's rows. ttl: state lifetime (None = keep forever),
    the reference's Lifetime semantics on operator state.

    Two engines, same contract:
    - apply(): transformWithStateInPandas (Spark 4 StatefulProcessor,
      value state in RocksDB, batch AND streaming) — requires protobuf
      on the workers (tws_available()).
    - apply_with_state(): applyInPandasWithState (GroupState API,
      streaming only) — no extra dependencies; the fallback this
      container can execute.
    """

    def __init__(self, keys: list[str], state_schema: T.StructType, init: tuple,
                 update: Callable[[tuple, pd.DataFrame], tuple],
                 ttl: str | int | None = None):
        self.keys = keys
        self.state_schema = state_schema
        self.init = init
        self.update = update
        if ttl is None:
            self.ttl_ms = None
        else:
            from dozer_spark.operators.window import interval_ms

            self.ttl_ms = interval_ms(ttl)

    def _out_schema(self, df: DataFrame) -> T.StructType:
        return T.StructType(
            [df.schema[k] for k in self.keys] + list(self.state_schema.fields)
        )

    def apply(self, df: DataFrame, output_mode: str = "Update",
              time_mode: str = "None") -> DataFrame:
        if not tws_available():
            raise RuntimeError(
                "transformWithStateInPandas needs protobuf on the workers; "
                "use apply_with_state() (streaming) in this environment"
            )
        proc = _AccumulatorProcessor(
            self.state_schema, self.init, self.update, self.ttl_ms
        )
        proc._key_cols = self.keys
        return (
            df.groupBy(*self.keys)
            .transformWithStateInPandas(
                statefulProcessor=proc,
                outputStructType=self._out_schema(df),
                outputMode=output_mode,
                timeMode=time_mode,
            )
        )

    def apply_with_state(self, df: DataFrame,
                         output_mode: str = "update") -> DataFrame:
        """GroupState fallback (streaming only): same accumulator
        contract on applyInPandasWithState, with processing-time state
        timeout when a TTL is set."""
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        keys = self.keys
        init = self.init
        update = self.update
        state_fields = [f.name for f in self.state_schema.fields]
        timeout = (
            GroupStateTimeout.ProcessingTimeTimeout
            if self.ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        )
        ttl_ms = self.ttl_ms

        def fn(key, pdfs, state: GroupState):
            if state.hasTimedOut:
                state.remove()
                return
            acc = tuple(state.get) if state.exists else init
            for pdf in pdfs:
                acc = update(acc, pdf)
            state.update(acc)
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                [dict(zip(keys, key)) | dict(zip(state_fields, acc))]
            )

        return df.groupBy(*keys).applyInPandasWithState(
            fn,
            outputStructType=self._out_schema(df),
            stateStructType=self.state_schema,
            outputMode=output_mode,
            timeoutConf=timeout,
        )
