"""applyInPandasWithState operators: cross-batch running stats and the
per-key liveness timeout (the reference's DataTimeoutUtil, distributed)."""

from __future__ import annotations

import math
import os
import tempfile
import time

import pyspark.sql.functions as F
import pytest

from mqtt_streamr_spark.streaming.stateful import keyed_liveness, running_stats


def _write_batches(spark, d: str, batches: list[list[tuple[str, float]]]):
    """One parquet file per batch so maxFilesPerTrigger=1 replays them as
    separate micro-batches (state must carry across)."""
    os.makedirs(d, exist_ok=True)
    for i, rows in enumerate(batches):
        (spark.createDataFrame(rows, "key string, value double")
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(d, f"b{i}")))


def test_running_stats_across_batches(spark):
    batches = [
        [("a", 1.0), ("a", 3.0), ("b", 10.0)],
        [("a", 5.0), ("b", 20.0), ("b", 30.0)],
        [("a", 7.0)],
    ]
    # ignore_cleanup_errors: a stopped streaming query's checkpoint writer
    # threads can race directory deletion (observed as OSError)
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as root:
        src_dir = os.path.join(root, "src")
        _write_batches(spark, src_dir, batches)
        stream = (
            spark.readStream.schema("key string, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src_dir, "*"))
        )
        q = (
            running_stats(stream, "key", "value")
            .writeStream.format("memory").queryName("rs")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=120)
        rows = spark.sql(
            "SELECT * FROM rs ORDER BY n"
        ).collect()
        # the LAST update per key is the cumulative total — compare to a
        # plain batch aggregation over all data
        last = {}
        for r in rows:
            last[r["key"]] = r
        flat = [v for b in batches for v in b]
        for key in ("a", "b"):
            vals = [v for k, v in flat if k == key]
            n, mean = len(vals), sum(vals) / len(vals)
            std = math.sqrt(sum((v - mean) ** 2 for v in vals) / n)
            got = last[key]
            assert got["n"] == n, (key, got)
            assert got["mean"] == pytest.approx(mean)
            assert got["std"] == pytest.approx(std)


def test_keyed_liveness_active_and_timeout(spark):
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as root:
        src_dir = os.path.join(root, "src")
        os.makedirs(src_dir)
        (spark.createDataFrame([("s1", 1.0), ("s1", 2.0), ("s2", 3.0)],
                               "key string, value double")
         .coalesce(1).write.parquet(os.path.join(src_dir, "b0")))
        stream = (
            spark.readStream.schema("key string, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src_dir, "*"))
        )
        q = (
            keyed_liveness(stream, "key", timeout_ms=500)
            .writeStream.format("memory").queryName("live")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 60
            # phase 1: both keys active with counts
            while time.time() < deadline:
                rows = spark.sql("SELECT * FROM live").collect()
                active = {r["key"]: r["n_msgs"] for r in rows
                          if r["event"] == "active"}
                if active.get("s1") == 2 and active.get("s2") == 1:
                    break
                time.sleep(0.5)
            else:
                pytest.fail(f"active rows never appeared: {rows}")
            # phase 2: feed only s2; s1 must time out (watchdog parity)
            (spark.createDataFrame([("s2", 4.0)], "key string, value double")
             .coalesce(1).write.parquet(os.path.join(src_dir, "b1")))
            while time.time() < deadline:
                rows = spark.sql("SELECT * FROM live").collect()
                touts = {r["key"]: r["n_msgs"] for r in rows
                         if r["event"] == "timeout"}
                if "s1" in touts:
                    assert touts["s1"] == 2, rows
                    break
                time.sleep(0.5)
            else:
                pytest.fail(f"s1 never timed out: {rows}")
        finally:
            q.stop()
