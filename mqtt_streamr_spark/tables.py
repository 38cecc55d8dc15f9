"""Catalog of the driver's deterministic test tables (see /root/repo/TESTDATA.md).

The reference does no file I/O at all (absence: /root/reference repo tree has
only bin/ + src/); the batch layer reads parquet with ``spark.read.parquet``,
which gives column pruning + predicate pushdown for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the schema
# implies (region=5 rows, nation=25 rows regardless of SF; supplier/part grow
# slowly). At 100 TB these stay broadcast-able; customer/orders/lineitem never.
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read the raw int64 and truncate ns -> µs exactly as
        # DuckDB does (floor division), so oracles agree to the microsecond.
        # NOTE: nanosAsLong is a SESSION-WIDE flag and stays set afterwards —
        # an intentional engine contract (nanos columns surface as int64;
        # replay_source sets it too). Engine sessions read nanos timestamps
        # only through this loader, which converts explicitly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return (
            spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster parallelism)
    partitions before a CPU-bound per-row stage (hashing, signatures).

    A small file scans as ONE partition, serializing the compute onto one
    core; at real scale the scan already has >= parallelism partitions and
    this is a no-op — so the round-robin shuffle is only ever paid on
    inputs small enough for it to be free."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql() can reference it."""
    for name in TABLES:
        load(spark, name, sf_dir).createOrReplaceTempView(name)
