"""Loader robustness: ``load(spark, "events")`` must return TimestampType
``ts`` for every physical parquet layout the test data has shipped in
(round-3 regression: the driver regenerated events.parquet as timestamp[us]
and the loader, hardcoded to the int64-nanos layout, threw
DATATYPE_MISMATCH before any query logic ran — VERDICT r3 §What's wrong #1).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from mqtt_streamr_spark.tables import _parse_bytes, load, spread

pytestmark = pytest.mark.usefixtures("spark")

_ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 20, 30],
    "event_type": ["view", "click", "purchase"],
    "value": [1.5, 2.5, 3.5],
    "props": ['{"a":1}', "{}", '{"b":2}'],
}
# distinct wall-clock instants incl. sub-second precision
_TS_US = [1704067200_123456, 1704153600_000000, 1704240000_999999]


def _write_events(tmp_path, ts_type):
    arrays = {k: pa.array(v) for k, v in _ROWS.items()}
    arrays["ts"] = pa.array(_TS_US, pa.timestamp("us")).cast(ts_type)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    table = pa.table({c: arrays[c] for c in cols})
    dest = tmp_path / "events.parquet"
    pq.write_table(table, dest, coerce_timestamps=None,
                   store_schema=False)
    return str(tmp_path)


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("ns"), pa.timestamp("us"), pa.timestamp("us", tz="UTC")],
    ids=["int64-nanos", "timestamp-us", "timestamp-us-utc"],
)
def test_load_events_both_physical_layouts(spark, tmp_path, ts_type):
    sf_dir = _write_events(tmp_path, ts_type)
    df = load(spark, "events", sf_dir)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    # both layouts must decode to the SAME wall-clock microseconds
    assert [t.microsecond for t in got] == [123456, 0, 999999]
    assert [t.day for t in got] == [1, 2, 3]


def test_load_events_driver_data(spark):
    df = load(spark, "events", "/root/testdata/sf0.001")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert df.count() > 0


def test_parse_bytes():
    assert _parse_bytes("134217728b") == 128 << 20
    assert _parse_bytes("128MB") == 128 << 20
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("4096") == 4096


def test_spread_repartitions_small_scan(spark):
    df = load(spark, "documents", "/root/testdata/sf0.001")
    out = spread(df, min_partitions=8)
    # small single-file scan -> repartitioned up (no df.rdd conversion used)
    assert out.rdd.getNumPartitions() >= 8


def test_spread_noop_when_enough_files(spark, tmp_path):
    dest = str(tmp_path / "many")
    spark.range(0, 1000).repartition(10).write.parquet(dest)
    df = spark.read.parquet(dest)
    out = spread(df, min_partitions=4)
    assert out is df  # >= target files: untouched, no shuffle inserted


def test_spread_noop_on_derived_dataframe(spark):
    # in-memory/derived DataFrames have no input files; their partitioning
    # reflects upstream shuffles — spread() must NOT insert a blind
    # repartition (ADVICE r4)
    df = spark.range(0, 100).groupBy((F.col("id") % 7).alias("k")).count()
    out = spread(df, min_partitions=64)
    assert out is df


def test_ensure_bucketed_idempotent_in_session(spark):
    from mqtt_streamr_spark.tables import ensure_bucketed

    t1 = ensure_bucketed(spark, "nation", "n_nationkey",
                         "/root/testdata/sf0.001", num_buckets=2)
    # second call: same table name, no rewrite (mtime unchanged)
    import os
    loc = spark.sql(f"DESCRIBE TABLE EXTENDED {t1}").collect()
    path = next(r["data_type"] for r in loc if r["col_name"] == "Location")
    path = path.replace("file:", "")
    before = max(os.path.getmtime(os.path.join(path, f))
                 for f in os.listdir(path) if not f.startswith("_"))
    t2 = ensure_bucketed(spark, "nation", "n_nationkey",
                         "/root/testdata/sf0.001", num_buckets=2)
    after = max(os.path.getmtime(os.path.join(path, f))
                for f in os.listdir(path) if not f.startswith("_"))
    assert t1 == t2 and before == after
    # bucket metadata present on the catalog table
    ddl = " ".join(r["col_name"] + " " + str(r["data_type"])
                   for r in spark.sql(f"DESCRIBE TABLE EXTENDED {t1}")
                   .collect())
    assert "Num Buckets 2" in ddl, ddl
