"""Catalog of the driver's deterministic test tables (see /root/repo/TESTDATA.md).

The reference does no file I/O at all (absence: /root/reference repo tree has
only bin/ + src/); the batch layer reads parquet with ``spark.read.parquet``,
which gives column pruning + predicate pushdown for free.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
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
        # events.ts has shipped in three physical parquet layouts across
        # data generations; normalize_events_ts branches on the dtype the
        # scan actually produced. nanosAsLong is inert for non-nanos files
        # and required to even read the nanos layout, so it stays set.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return normalize_events_ts(df)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to session-TZ TimestampType.

    The driver's events parquet has shipped in three physical layouts
    across data generations: TIMESTAMP(NANOS) (surfaces as int64 under
    nanosAsLong), TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfaces as
    TIMESTAMP_NTZ), and plain TIMESTAMP. The engine contract is that
    ``ts`` is always session-TZ TimestampType downstream, so branch on
    the dtype the scan actually produced instead of hardcoding one
    layout. (Requires spark.sql.legacy.parquet.nanosAsLong=true to read
    the nanos layout at all — callers scanning events set it first.)"""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        # raw int64 nanos: truncate ns -> µs exactly as DuckDB does
        # (floor division), so oracles agree to the microsecond.
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        # naive µs: reinterpret the wall-clock value in the session TZ.
        # All downstream ops (date_trunc, window, collect) use the same
        # session TZ, so results are TZ-invariant and match DuckDB's
        # naive-timestamp arithmetic.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _parse_bytes(conf_val: str) -> int:
    """Parse a Spark byte-size conf string ('134217728b', '128MB', '1g')."""
    s = conf_val.strip().lower()
    units = {"b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
             "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}
    for suffix in sorted(units, key=len, reverse=True):
        if s.endswith(suffix):
            return int(s[: -len(suffix)]) * units[suffix]
    return int(s)


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster parallelism)
    partitions before a CPU-bound per-row stage (hashing, signatures).

    A small file scans as ONE partition, serializing the compute onto one
    core; at real scale the scan already has >= parallelism partitions and
    this is a no-op — so the round-robin shuffle is only ever paid on
    inputs small enough for it to be free.

    The scan-partition estimate uses ``inputFiles()`` + file sizes (no
    ``df.rdd`` conversion, Connect-safe). Non-local schemes where sizes
    can't be stat'ed are assumed already-parallel (real clusters write
    many files), and so are in-memory/derived DataFrames with no input
    files at all — their partitioning reflects upstream shuffles, and
    inserting a blind repartition would add a needless shuffle."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files or len(files) >= target:
        return df
    max_bytes = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    )
    est = 0
    for uri in files:
        if uri.startswith("file:"):
            path = uri[len("file:"):]
            try:
                size = os.path.getsize(path)
            except OSError:
                return df
            est += max(1, -(-size // max_bytes))
        else:
            return df  # remote scheme: assume the scan is already parallel
        if est >= target:
            return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so spark.sql() can reference it."""
    for name in TABLES:
        load(spark, name, sf_dir).createOrReplaceTempView(name)


def ensure_shredded_events(spark: SparkSession,
                           sf_dir: str = DEFAULT_SF_DIR) -> str:
    """Materialize the events table with ``props`` parsed into a SHREDDED
    variant parquet column ``v`` and return the path. Idempotent per
    sf_dir (deterministic location + _SUCCESS check).

    This is the 100 TB schemaless-scan primitive (SURVEY §4's "variant
    path extraction into parquet scans"): Spark 4.x writes the variant
    with inferred typed subcolumns (spark.sql.variant.writeShredding +
    inferShreddingSchema), and at read time PushVariantIntoScan rewrites
    a query's ``variant_get`` paths into a pruned struct scan schema —
    the parquet reader then decodes ONLY the accessed paths and pushes
    comparison predicates on them down to row-group statistics, instead
    of decoding the full variant binary per row. Plan-asserted in
    tests/test_plans.py. Shredding is paid once at ingest and amortized
    over every subsequent scan, the same economics as ensure_bucketed."""
    import hashlib
    import shutil
    import tempfile

    tag = hashlib.sha1(f"{sf_dir}|events_shredded_v1".encode()) \
        .hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"events_shredded_{tag}")
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        shutil.rmtree(d, ignore_errors=True)
        # both confs default to true on Spark 4.1 (verified: the written
        # footer carries typed_value subcolumns without touching them),
        # but set them explicitly so the shredded layout survives a user
        # session that flipped the defaults. conf.get(k, None) is None
        # for never-set keys — restore via unset, not a skipped set.
        prev = {
            k: spark.conf.get(k, None)
            for k in ("spark.sql.variant.writeShredding.enabled",
                      "spark.sql.variant.inferShreddingSchema")
        }
        try:
            spark.conf.set("spark.sql.variant.writeShredding.enabled",
                           "true")
            spark.conf.set("spark.sql.variant.inferShreddingSchema",
                           "true")
            (load(spark, "events", sf_dir)
             .withColumn("v", F.parse_json(F.col("props")))
             .drop("props")
             .write.mode("overwrite").parquet(d))
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    return d


def ensure_bucketed(spark: SparkSession, name: str, key: str,
                    sf_dir: str = DEFAULT_SF_DIR, num_buckets: int = 8
                    ) -> str:
    """Materialize ``name`` as a bucketed+sorted catalog table
    (``bucketBy(num_buckets, key).sortBy(key)``) and return its qualified
    table name. Idempotent per session (catalog check).

    This is the 100 TB co-location primitive: two fact tables bucketed
    and sorted on their join key sort-merge-join with NO exchange and NO
    sort on either side — the shuffle is paid once at ingest and
    amortized over every subsequent join (plan-asserted in
    tests/test_plans.py). The bucket files live under a deterministic
    per-(sf_dir, table) location so repeated sessions overwrite the same
    spot instead of accumulating copies."""
    import hashlib
    import shutil
    import tempfile

    tag = hashlib.sha1(f"{sf_dir}|{name}|{key}|{num_buckets}".encode()) \
        .hexdigest()[:12]
    db = "bucketed"
    base = f"{name}_by_{key}_{tag}"
    table = f"{db}.{base}"
    loc = os.path.join(tempfile.gettempdir(), "spark_bucketed_db")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    if not spark.catalog.tableExists(table):
        # bucket metadata lives in the session catalog; a FRESH session
        # cannot reuse a previous session's files as a bucketed table, so
        # clear the stale location and rewrite (cheap, derived data)
        stale = os.path.join(loc, base)
        shutil.rmtree(stale, ignore_errors=True)
        # repartition on the bucket key first: a small input parquet scans
        # as one task, and that one task would sort and encode EVERY
        # bucket's file serially (measured 2.9 s for sf0.1 lineitem).
        # Hash-repartitioning to num_buckets gives each write task exactly
        # one bucket (same murmur3 hash as the bucket spec), so the sort +
        # parquet encode parallelize num_buckets-wide (measured 1.8 s).
        # Layout and join plans are identical either way.
        (load(spark, name, sf_dir).repartition(num_buckets, F.col(key))
         .write.bucketBy(num_buckets, key).sortBy(key)
         .mode("overwrite").format("parquet").saveAsTable(table))
    return table


def ensure_bucketed_many(spark: SparkSession,
                         specs: list[tuple[str, str]],
                         sf_dir: str = DEFAULT_SF_DIR,
                         num_buckets: int = 8) -> list[str]:
    """``ensure_bucketed`` for several tables with the ingest jobs
    OVERLAPPED from a small driver thread pool: the writes are independent
    Spark jobs, so submitting them concurrently lets the scheduler
    back-fill each job's straggler tail with the other job's tasks
    (optimization guide §2.6) instead of paying the sum of both walls —
    measured 4.7 s -> 2.3 s for the orders+lineitem pair at sf0.1.
    The database is created up front so the per-table calls race only on
    their own (distinct) table names."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    loc = os.path.join(tempfile.gettempdir(), "spark_bucketed_db")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketed LOCATION '{loc}'")
    with ThreadPoolExecutor(max_workers=min(4, len(specs))) as pool:
        return list(
            pool.map(
                lambda nk: ensure_bucketed(
                    spark, nk[0], nk[1], sf_dir, num_buckets
                ),
                specs,
            )
        )
