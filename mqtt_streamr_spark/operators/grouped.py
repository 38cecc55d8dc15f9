"""Grouped Pandas-UDF operators — the §2.8 extensibility surface beyond the
reference's per-record JSONata transform (/root/reference/bin/
mqtt-streamr.js:48-51 is its entire user-function surface):

- ``zscore_per_group``: grouped-map ``applyInPandas`` — each group arrives
  as one Arrow-backed pandas DataFrame; the UDF sees the whole group, which
  per-row Columns cannot (here: normalization against group statistics).
- ``geometric_mean``: a GROUPED_AGG pandas UDF (vectorized UDAF).

Scale notes: applyInPandas shuffles on the group key and materializes one
group per call — group size must fit an executor (fine for per-source /
per-type groups; for unbounded groups pre-aggregate or salt). The
GROUPED_AGG path does NOT do partial aggregation — each group's values
ship to one task — so prefer native aggregates when one exists; it's the
escape hatch for aggregates Catalyst lacks.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


def zscore_per_group(df: DataFrame, group_col: str, value_col: str,
                     z_col: str = "z") -> DataFrame:
    """Per-group z-score normalization ((x - mean) / sample-stddev) via
    applyInPandas. Degenerate groups (n=1 or zero variance) get z=0."""
    schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {z_col} double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        if pd.isna(std) or std == 0.0:
            pdf[z_col] = 0.0
        else:
            pdf[z_col] = (pdf[value_col] - pdf[value_col].mean()) / std
        return pdf

    return df.groupBy(group_col).applyInPandas(norm, schema=schema)


@pandas_udf("double")
def geometric_mean(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF: exp(mean(log(x))) over positive values;
    NULL (not NaN) when a group has no positive values."""
    import numpy as np

    pos = v[v > 0]
    if len(pos) == 0:
        return None
    return float(np.exp(np.log(pos).mean()))


def ewma_per_key(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                 alpha: float, order_cols: list[str] | None = None
                 ) -> DataFrame:
    """Per-key exponentially-weighted moving average — an ORDERED
    RECURRENCE (e_n = alpha*v_n + (1-alpha)*e_{n-1}, seeded e_1 = v_1),
    which no window frame expresses (each value depends on the full
    prefix) and whose closed form (powers of 1/(1-alpha)) overflows on
    long series. applyInPandas is the right surface: one shuffle on the
    key, each key's ordered history in one Arrow batch, the recurrence
    as an explicit loop so the float op ORDER matches the oracle's
    recursive CTE exactly. Output adds an ``ewma`` column to every row.

    Scale: a key's whole history must fit one executor (same contract as
    any per-key sequence op); for unbounded histories, checkpoint the
    carry-in state per time-slice instead (the streaming variant of this
    lives in streaming/stateful.py as running Welford stats)."""
    order = [ts_col] + list(order_cols or [])
    schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        )
        + ", ewma double"
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order).reset_index(drop=True)
        vals = pdf[value_col].to_list()
        out = []
        prev = None
        for v in vals:
            prev = float(v) if prev is None else alpha * float(v) \
                + (1.0 - alpha) * prev
            out.append(prev)
        pdf["ewma"] = out
        return pdf

    return df.groupBy(key_col).applyInPandas(smooth, schema=schema)


def ewma_final_per_key(df: DataFrame, key_col: str, ts_col: str,
                       value_col: str, alpha: float,
                       order_cols: list[str] | None = None) -> DataFrame:
    """Final EWMA + row count per key in ONE streaming pass.

    ``ewma_per_key`` pays one Arrow batch round-trip PER GROUP
    (FlatMapGroupsInPandas ships each group separately) — measured 3.8 s
    for 1500 groups / 100k rows at sf0.1 where the recurrence itself is
    milliseconds. When only each key's FINAL smoothed value is needed,
    partition-sort + ``mapInPandas`` computes every key's recurrence in a
    single pass per task (optimization guide §4.2/§4.5: whole batches
    across the boundary, state carried across batches inside the
    iterator) — measured 0.43 s on the same input, an 8.8x cut, with
    bit-identical floats (same op order: ``alpha*v + (1-alpha)*prev``).

    Returns one row per key: ``(key, n_events BIGINT, ewma_raw DOUBLE)``
    (unrounded — callers apply their own display rounding so the float
    path stays identical to the per-row variant).

    Contract: ``key_col`` must be non-null (a null key would open a new
    group per row, since NaN != NaN in the carry comparison, and pandas
    would coerce an int64 key batch to float64) — ENFORCED by a
    null-key filter before the shuffle (ADVICE r11: the contract was
    documented but unenforced; a null-keyed row now drops instead of
    silently corrupting every group's output). Rows for one
    key land in one partition via hash repartition, and batches within a
    partition arrive in order, so the carry state is exact across batch
    boundaries. Scale shape: one shuffle of the projected columns + a
    per-partition sort — no per-group Arrow framing, no second aggregate."""
    order = [key_col, ts_col] + list(order_cols or [])
    proj = [key_col, ts_col, value_col] + list(order_cols or [])

    def run_pass(it):  # type: ignore[no-untyped-def]
        cur = None
        prev = None
        n = 0
        for pdf in it:
            keys = pdf[key_col].to_numpy()
            vals = pdf[value_col].to_numpy()
            out_k: list = []
            out_n: list = []
            out_e: list = []
            for k, v in zip(keys, vals):
                if cur is not None and k != cur:
                    out_k.append(cur)
                    out_n.append(n)
                    out_e.append(prev)
                    prev = None
                    n = 0
                cur = k
                prev = float(v) if prev is None else alpha * float(v) \
                    + (1.0 - alpha) * prev
                n += 1
            if out_k:
                yield pd.DataFrame(
                    {key_col: out_k, "n_events": out_n, "ewma_raw": out_e}
                )
        if cur is not None:
            yield pd.DataFrame(
                {key_col: [cur], "n_events": [n], "ewma_raw": [prev]}
            )

    key_type = dict(df.dtypes)[key_col]
    return (
        df.select(*dict.fromkeys(proj))  # project BEFORE the exchange
        .filter(F.col(key_col).isNotNull())  # enforce the non-null-key
        #                                      contract (see docstring)
        .repartition(F.col(key_col))
        .sortWithinPartitions(*order)
        .mapInPandas(
            run_pass,
            schema=f"{key_col} {key_type}, n_events bigint, ewma_raw double",
        )
    )
