"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the escape hatch for per-key state Spark's built-ins don't cover
(SURVEY.md §2.7: the reference's only stateful constructs are the creation
memo and the data-timeout watchdog, src/DataTimeoutUtil.js:1-17).

Two operators:

- :func:`running_stats` — per-key cumulative (count, mean, std) maintained
  in the state store ACROSS micro-batches (Welford update, numerically
  stable). Deterministic under ``availableNow`` drains, so it is testable
  exactly; the built-in alternative (windowed agg) cannot express
  "cumulative since stream start" in update mode without retaining all
  history.
- :func:`keyed_liveness` — per-key processing-time timeout: a key that
  receives no data for ``timeout_ms`` emits a ``timeout`` record and drops
  its state. This is the reference's DataTimeoutUtil distributed per key
  (the source-level watchdog covers the whole connection; this covers each
  stream independently).

Scale notes: state lives in the executor state store partitioned by key —
no driver involvement, shuffles only on the grouping key. Arrow batches
bound per-group memory; per-key state is O(1) (three floats / one
timestamp).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame

RUNNING_STATS_OUTPUT = (
    "key string, n bigint, mean double, std double"
)
_RUNNING_STATS_STATE = "n bigint, mean double, m2 double"

LIVENESS_OUTPUT = "key string, event string, n_msgs bigint"
_LIVENESS_STATE = "n_msgs bigint"


def _welford_merge(n: int, mean: float, m2: float,
                   values: pd.Series) -> tuple[int, float, float]:
    for v in values.dropna():
        n += 1
        delta = float(v) - mean
        mean += delta / n
        m2 += delta * (float(v) - mean)
    return n, mean, m2


def _ship_package() -> None:
    """Python workers unpickle the stateful function by importing this
    module — which fails when the driver runs from a foreign cwd (the
    harness does). Ship the package zip first, exactly like the
    interpreter UDF does (see streaming/transform.py)."""
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        from mqtt_streamr_spark.shipping import ensure_shipped

        ensure_shipped(active)


def running_stats(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key cumulative count/mean/std across ALL micro-batches seen so
    far (update mode). One output row per key per batch in which the key
    appears."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    _ship_package()

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        import math

        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            n, mean, m2 = _welford_merge(n, mean, m2, pdf[value_col])
        state.update((n, mean, m2))
        std = math.sqrt(m2 / n) if n else float("nan")
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "mean": [mean], "std": [std]}
        )

    src = df if key_col == "key" else df.withColumnRenamed(key_col, "key")
    return (
        src.groupBy("key")
        .applyInPandasWithState(
            fn,
            RUNNING_STATS_OUTPUT,
            _RUNNING_STATS_STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def keyed_liveness(df: DataFrame, key_col: str,
                   timeout_ms: int = 900_000) -> DataFrame:
    """Per-key data-timeout (reference DataTimeoutUtil semantics, default
    900 s like --reconnect-on-data-timeout): emits ``active`` with the
    cumulative message count while a key keeps receiving data, and a final
    ``timeout`` record (then forgets the key) when it goes silent for
    ``timeout_ms`` of processing time."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    _ship_package()

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [key[0]], "event": ["timeout"], "n_msgs": [n]}
            )
            return
        n = state.get[0] if state.exists else 0
        n += sum(len(pdf) for pdf in pdfs)
        state.update((n,))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"key": [key[0]], "event": ["active"], "n_msgs": [n]}
        )

    src = df if key_col == "key" else df.withColumnRenamed(key_col, "key")
    return (
        src.groupBy("key")
        .applyInPandasWithState(
            fn,
            LIVENESS_OUTPUT,
            _LIVENESS_STATE,
            "update",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
