

def test_range_bin_join_matches_theta_join(spark):
    """Binned range join == naive BETWEEN join, including interval
    boundaries (inclusive both ends) and intervals spanning many bins."""
    import pyspark.sql.functions as F

    from mqtt_streamr_spark.operators.joins import range_bin_join

    left = spark.createDataFrame(
        [(1, 10, "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
         (2, 10, "2024-01-01 23:30:00", "2024-01-02 00:30:00"),  # midnight
         (3, 20, "2024-01-01 10:00:00", "2024-01-01 10:00:00")],  # zero-width
        "iv_id long, k long, lo_s string, hi_s string",
    ).select("iv_id", "k", F.col("lo_s").cast("timestamp").alias("lo"),
             F.col("hi_s").cast("timestamp").alias("hi"))
    right = spark.createDataFrame(
        [(100, 10, "2024-01-01 10:00:00"),   # == lo boundary
         (101, 10, "2024-01-01 12:00:00"),   # == hi boundary
         (102, 10, "2024-01-01 12:00:01"),   # just outside
         (103, 10, "2024-01-02 00:00:00"),   # inside midnight interval
         (104, 20, "2024-01-01 10:00:00"),   # zero-width match
         (105, 30, "2024-01-01 11:00:00")],  # wrong key
        "ev_id long, k long, ts_s string",
    ).select("ev_id", "k", F.col("ts_s").cast("timestamp").alias("ts"))

    binned = {
        (r["iv_id"], r["ev_id"])
        for r in range_bin_join(left, right, "k", "lo", "hi", "ts",
                                bin_width_s=900).collect()
    }
    naive = {
        (r["iv_id"], r["ev_id"])
        for r in left.join(
            right,
            (left["k"] == right["k"])
            & right["ts"].between(left["lo"], left["hi"]),
        ).collect()
    }
    assert binned == naive
    assert (1, 100) in binned and (1, 101) in binned
    assert (1, 102) not in binned
    assert (2, 103) in binned and (3, 104) in binned


def test_sessionize_gap_boundaries(spark):
    """Gap EXACTLY equal to the threshold continues the session; anything
    strictly greater starts a new one. First row per key always opens
    session 1; keys are independent."""
    import pyspark.sql.functions as F

    from mqtt_streamr_spark.operators.joins import sessionize

    rows = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"),
         (1, "2024-01-01 10:30:00"),   # gap == 1800 s -> same session
         (1, "2024-01-01 11:00:01"),   # gap 1801 s -> new session
         (2, "2024-01-01 09:00:00")],
        "k long, ts_s string",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"))
    got = {
        (r["k"], str(r["ts"])): r["session_seq"]
        for r in sessionize(rows, "k", "ts", gap_s=1800).collect()
    }
    assert got[(1, "2024-01-01 10:00:00")] == 1
    assert got[(1, "2024-01-01 10:30:00")] == 1
    assert got[(1, "2024-01-01 11:00:01")] == 2
    assert got[(2, "2024-01-01 09:00:00")] == 1
