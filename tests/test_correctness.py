"""Driver-shaped correctness gate: run every registered query on Spark at
sf0.01 AND its DuckDB oracle on the same parquet, compare order-insensitive
values. This mirrors CORRECTNESS_r{N}.json before the driver does."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mqtt_streamr_spark.queries import ORACLES, QUERIES

from tests.conftest import SF_CORRECT


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if dt == np.float32:
            df[c] = df[c].astype(np.float64)
        elif str(dt).startswith("datetime64") and str(dt) != "datetime64[us]":
            df[c] = df[c].astype("datetime64[us]")
        elif dt == object:
            # normalize lists/arrays to tuples so sorting works
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )
    return df


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    spark_df = normalize(QUERIES[name](spark, SF_CORRECT).toPandas())
    duck_df = normalize(duck.execute(ORACLES[name]).df())
    assert list(spark_df.columns) == list(duck_df.columns), (
        f"{name}: column mismatch {spark_df.columns} vs {duck_df.columns}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count {len(spark_df)} vs {len(duck_df)}"
    )
    # The driver's value hash is RENDERING-sensitive: round 1's DuckDB
    # HUGEINT sum() rendered 500.0 vs Spark BIGINT 500 and failed 7 queries
    # whose values were numerically identical — while int32-vs-int64 rank()
    # passed (both render "500"). Enforce dtype-KIND parity (int family vs
    # float vs bool vs object vs datetime) so exactly the driver's failure
    # class fails locally first.
    def kind(t):
        k = t.kind
        return "i" if k in ("i", "u") else k

    assert [kind(t) for t in spark_df.dtypes] == [
        kind(t) for t in duck_df.dtypes
    ], (
        f"{name}: dtype-kind mismatch spark={dict(spark_df.dtypes)} "
        f"vs oracle={dict(duck_df.dtypes)} — cast the oracle (e.g. "
        f"sum(...)::BIGINT) or the Spark column so both render identically"
    )
    pd.testing.assert_frame_equal(
        spark_df, duck_df, check_dtype=False, check_exact=False,
        rtol=1e-9, atol=1e-9, obj=name,
    )


def test_no_vacuous_oracles(duck):
    """Every oracle must return >= 1 row at the verification SF: an
    empty-vs-empty hash match proves nothing (round 5 found three
    thresholds sized past the data's distribution this way). DuckDB-side
    only — cheap — and the count-match assert in the main gate ties the
    Spark side to the same cardinality."""
    empty = [
        name for name, sql in ORACLES.items()
        # existence only — LIMIT 1 over the subquery lets DuckDB stop
        # early instead of materializing the full result (the full
        # values are compared by the main gate anyway)
        if not duck.execute(
            f"SELECT 1 FROM ({sql}) LIMIT 1").fetchall()
    ]
    assert not empty, f"vacuous (zero-row) oracles at sf0.01: {empty}"


def test_every_query_has_entry():
    assert QUERIES, "registry must not be empty"
    for name in ORACLES:
        assert name in QUERIES


def test_driver_window_ordering():
    """The driver oracle-checks only the first DRIVER_WINDOW registry
    entries (round 1: 12 oracle-backed queries silently fell outside).
    Every MUST_VERIFY query must exist, fill the window exactly from the
    front, and carry an oracle; rows-only queries must sort last."""
    from mqtt_streamr_spark.queries import DRIVER_WINDOW, MUST_VERIFY

    assert len(MUST_VERIFY) <= DRIVER_WINDOW
    assert len(MUST_VERIFY) == len(set(MUST_VERIFY)), "duplicates"
    missing = [n for n in MUST_VERIFY if n not in QUERIES]
    assert not missing, f"MUST_VERIFY names not registered: {missing}"
    names = list(QUERIES)
    assert names[: len(MUST_VERIFY)] == MUST_VERIFY
    no_oracle = [n for n in MUST_VERIFY if n not in ORACLES]
    assert not no_oracle, f"window slots wasted on rows-only: {no_oracle}"
    tail = names[len(MUST_VERIFY) :]
    seen_rows_only = False
    for n in tail:
        if n not in ORACLES:
            seen_rows_only = True
        else:
            assert not seen_rows_only, f"oracle query {n} after rows-only"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
