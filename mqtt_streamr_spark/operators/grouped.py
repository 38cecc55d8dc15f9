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
