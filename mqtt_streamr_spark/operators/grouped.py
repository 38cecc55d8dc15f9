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
