"""Events-table queries: the batch-checkable half of the reference's streaming
pipeline — JSON parse with invalid-drop, variant extraction, topic routing
(truncation + template), wildcard matching, tumbling windows, and the
success/error stats contract. Each has a DuckDB oracle.

Reference parity points:
- invalid-JSON drop: /root/reference/bin/mqtt-streamr.js:149-155
- topic truncation: bin:99-106; template first-occurrence: bin:166
- success/error interval counts: /root/reference/src/Logger.js:17-21

Scale notes: every query is scan -> narrow string/JSON ops -> single
aggregation; the routing expressions are pure codegen'd Columns (no UDF),
so the same plan holds at 100 TB with the agg as the only shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col

from mqtt_streamr_spark.operators.routing import (
    mqtt_wildcard_to_regex,
    stream_id_from_template,
    topic_matches,
    truncate_topic,
)
from mqtt_streamr_spark.queries.registry import query
from mqtt_streamr_spark.tables import load

# topic synthesized from the events table the same way in Spark and oracle:
# /events/<event_type>/u<user_id % 10>
_TOPIC_SQL = "'/events/' || event_type || '/u' || CAST(user_id % 10 AS VARCHAR)"


def _with_topic(df: DataFrame) -> DataFrame:
    from mqtt_streamr_spark.operators.routing import synthetic_event_topic

    return df.withColumn(
        "topic", synthetic_event_topic("event_type", "user_id")
    )


@query(
    "events_json_extract_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4) AS avg_k,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction (get_json_object) + aggregation."""
    ev = load(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg(F.get_json_object("props", "$.k").cast("int")), 4).alias(
            "avg_k"
        ),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "events_variant_parse_drop",
    oracle="""
    WITH corrupted AS (
        SELECT event_type,
               CASE WHEN event_id % 7 = 0
                    THEN substring(props, 1, length(props) - 1)
                    ELSE props END AS payload
        FROM events
    )
    SELECT event_type,
           count(*) AS n_kept,
           round(avg(CAST(json_extract_string(payload, '$.k') AS INTEGER)), 4) AS avg_k
    FROM corrupted
    WHERE json_valid(payload)
    GROUP BY event_type
    """,
)
def events_variant_parse_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalid-JSON drop parity (bin:149-155) on the Spark-4 variant path:
    payloads corrupted at a deterministic rate, ``try_parse_json`` nulls them,
    the filter drops them — the PERMISSIVE-mode analog of the reference's
    try/catch + early return."""
    ev = load(spark, "events", sf_dir)
    corrupted = ev.withColumn(
        "payload",
        F.when(
            col("event_id") % 7 == 0,
            F.expr("substring(props, 1, length(props) - 1)"),
        ).otherwise(col("props")),
    ).withColumn("v", F.try_parse_json("payload"))
    return (
        corrupted.filter(col("v").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(
                F.avg(F.try_variant_get(col("v"), "$.k", "int")), 4
            ).alias("avg_k"),
        )
    )


@query(
    "events_variant_pruned_scan",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(avg(k), 4) AS avg_k
    FROM (SELECT event_type,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k
          FROM events)
    WHERE k > 50
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_variant_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless scan on the SHREDDED variant layout (SURVEY §4's
    variant scan pushdown, materialized via tables.ensure_shredded_events
    — ingest paid once per sf_dir, amortized like the bucketed tables):
    PushVariantIntoScan rewrites the ``$.k`` access into a pruned struct
    scan schema, so the parquet reader decodes only the shredded ``k``
    subcolumn and the ``k > 50`` predicate pushes down to row-group
    stats — the full variant binary is never touched. Plan-asserted in
    tests/test_plans.py; contrast events_json_extract_stats, which
    re-tokenizes the raw JSON string per row."""
    from mqtt_streamr_spark.tables import ensure_shredded_events

    ev = spark.read.parquet(ensure_shredded_events(spark, sf_dir))
    return (
        ev.select(
            "event_type",
            F.try_variant_get(col("v"), "$.k", "long").alias("k"),
        )
        .filter(col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@query(
    "events_daily_windows",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def events_daily_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows via Spark's native window() — the
    batch twin of the streaming stats aggregation (Logger.js:6,17-21)."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(col("window.start").alias("day"), "n_events", "total_value", "n_users")
    )


@query(
    "events_topic_routing",
    oracle=f"""
    WITH topics AS (SELECT {_TOPIC_SQL} AS topic FROM events),
    routed AS (
        SELECT '/streamr/' ||
               array_to_string(list_slice(string_split(topic, '/'), 1, 3), '/')
               AS stream_id
        FROM topics
    )
    SELECT stream_id, count(*) AS n_messages
    FROM routed GROUP BY stream_id
    """,
)
def events_topic_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full routing derivation: synthesize topic, truncate to 2 levels
    (bin:99-106 — keeps levels+1 = 3 parts because of the leading '/'),
    apply template '/streamr/$topic' (bin:166), count per stream."""
    ev = _with_topic(load(spark, "events", sf_dir))
    return (
        ev.withColumn(
            "stream_id",
            stream_id_from_template("topic", "/streamr/$topic", topic_levels=2),
        )
        .groupBy("stream_id")
        .agg(F.count(F.lit(1)).alias("n_messages"))
    )


@query(
    "events_template_first_occurrence",
    oracle=f"""
    WITH topics AS (SELECT {_TOPIC_SQL} AS topic FROM events),
    routed AS (
        SELECT '/a/' ||
               array_to_string(list_slice(string_split(topic, '/'), 1, 2), '/')
               || '/b/$topic' AS stream_id
        FROM topics
    )
    SELECT stream_id, count(*) AS n_messages
    FROM routed GROUP BY stream_id
    """,
)
def events_template_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JS String.replace substitutes the FIRST '$topic' only (bin:166): with
    template '/a/$topic/b/$topic' the second placeholder stays literal.
    levels=1 truncation of '/events/...' collapses to '/events'."""
    ev = _with_topic(load(spark, "events", sf_dir))
    return (
        ev.withColumn(
            "stream_id",
            stream_id_from_template("topic", "/a/$topic/b/$topic", topic_levels=1),
        )
        .groupBy("stream_id")
        .agg(F.count(F.lit(1)).alias("n_messages"))
    )


_WILDCARD = "/events/+/u3"
_WILDCARD_RE = mqtt_wildcard_to_regex(_WILDCARD)


@query(
    "events_wildcard_filter",
    oracle=f"""
    WITH topics AS (SELECT event_type, {_TOPIC_SQL} AS topic FROM events)
    SELECT event_type, count(*) AS n_matched
    FROM topics
    WHERE regexp_matches(topic, '{_WILDCARD_RE}')
    GROUP BY event_type
    """,
)
def events_wildcard_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MQTT '+' single-level wildcard matching, client-side (the reference
    delegates this to the broker, bin:130-138; the engine needs it for
    file-replay parity)."""
    ev = _with_topic(load(spark, "events", sf_dir))
    return (
        ev.filter(topic_matches("topic", _WILDCARD))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )


@query(
    "events_success_error_daily",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           CASE WHEN event_type = 'error' THEN 'error' ELSE 'success' END AS outcome,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def events_success_error_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Logger contract (success/error counts per interval, counters reset
    each window — Logger.js:17-21) as a tumbling event-time aggregate."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.withColumn(
            "outcome",
            F.when(col("event_type") == "error", F.lit("error")).otherwise(
                F.lit("success")
            ),
        )
        .groupBy(F.window("ts", "1 day"), "outcome")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(col("window.start").alias("day"), "outcome", "n")
    )


@query(
    "join_asof_purchase_view",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts, value AS p_value
               FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts, value AS v_value
          FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id,
           round(p.p_value, 2) AS p_value,
           round(v.v_value, 2) AS v_value
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def join_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (engine extension, SURVEY.md §2.3): each purchase joined
    to the same user's most recent earlier-or-equal view. Implemented with
    the union + partitioned-window pattern (one shuffle on user_id) — the
    DuckDB oracle uses its native ASOF LEFT JOIN."""
    from mqtt_streamr_spark.operators.joins import asof_join

    ev = load(spark, "events", sf_dir)
    p = ev.filter(col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", col("value").alias("p_value")
    )
    v = ev.filter(col("event_type") == "view").select(
        "user_id", "ts", col("value").alias("v_value")
    )
    out = asof_join(p, v, on="user_id", ts_col="ts")
    return out.select(
        "event_id", "user_id",
        F.round("p_value", 2).alias("p_value"),
        F.round("v_value_asof", 2).alias("v_value"),
    )


@query(
    "events_sliding_windows",
    oracle="""
    WITH e AS (SELECT ts, value,
                      time_bucket(INTERVAL '12 hours', ts) AS b
               FROM events),
    w AS (SELECT ts, value,
                 unnest([b, b - INTERVAL '12 hours']) AS w_start
          FROM e)
    SELECT w_start, count(*) AS n, round(sum(value), 2) AS total
    FROM w
    WHERE ts >= w_start AND ts < w_start + INTERVAL '24 hours'
    GROUP BY w_start
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 day, sliding every 12 h) — each event
    lands in exactly 2 windows; the oracle expands the same windows with
    time_bucket + unnest. Engine extension beyond the reference's
    processing-time-only stats (SURVEY.md §2.7 'Time semantics')."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("total"))
        .select(col("window.start").alias("w_start"), "n", "total")
    )


@query(
    "events_session_windows",
    oracle="""
    WITH x AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts)
                    >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        FROM events),
    s AS (SELECT user_id, ts, value,
                 sum(new_s) OVER (
                     PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM x)
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user via
    ``session_window`` — the streaming-native gap-session operator, checked
    against a gaps-and-islands SQL oracle. A new session starts when the
    gap is >= the timeout (session windows are half-open [start, last+gap))."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select("user_id",
                col("session_window.start").alias("session_start"),
                "n_events", "total_value")
    )


@query(
    "events_hierarchical_rollup",
    oracle="""
    SELECT date_trunc('day', ts) AS day, count(*) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY 1
    """,
)
def events_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: daily stats computed FROM the
    hourly rollup rather than rescanning raw events — the hierarchical
    reuse pattern that makes multi-resolution dashboards O(hours) instead
    of O(events) at 100 TB. The oracle aggregates raw directly; sums are
    associative so results agree."""
    ev = load(spark, "events", sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    return (
        hourly.groupBy(F.date_trunc("day", col("hour")).alias("day"))
        .agg(F.sum("n").alias("n"), F.round(F.sum("total"), 2).alias("total"))
    )


@query(
    "window_lag_lead_events",
    oracle="""
    WITH x AS (
        SELECT user_id, ts, value,
               value - lag(value) OVER w AS dv,
               epoch(lead(ts) OVER w - ts) AS gap_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id, count(*) AS n,
           round(sum(dv), 2) AS total_dv,
           round(avg(gap_s), 2) AS avg_gap_s
    FROM x GROUP BY user_id
    """,
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytic windows: per-user value deltas and inter-event
    gaps — one shuffle on user_id shared by both window functions."""
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    x = ev.select(
        "user_id",
        (col("value") - F.lag("value").over(w)).alias("dv"),
        (F.unix_micros(F.lead("ts").over(w))
         - F.unix_micros(col("ts"))).alias("gap_us"),
    )
    return x.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("dv"), 2).alias("total_dv"),
        F.round(F.avg(col("gap_us") / 1_000_000.0), 2).alias("avg_gap_s"),
    )


@query(
    "agg_value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def agg_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (SQL PERCENTILE = linear interpolation,
    same as DuckDB quantile_cont). Exact percentile is a sort-based
    aggregate — at 100 TB swap for approx_percentile (t-digest) and accept
    the documented error bound."""
    ev = load(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@query(
    "agg_value_percentiles_approx",
    oracle="""
    SELECT event_type,
           round(quantile_disc(value, 0.5), 4) AS p50,
           round(quantile_disc(value, 0.9), 4) AS p90,
           round(quantile_disc(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def agg_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: ``approx_percentile`` (Greenwald-Khanna
    sketch) keeps bounded per-group state and partial-aggregates map-side,
    where exact ``percentile`` buffers EVERY value per group (an implicit
    per-group sort that OOMs at scale). Discrete-quantile semantics match
    DuckDB ``quantile_disc``; with accuracy=10000 the rank error is
    < 1 row whenever a group holds fewer rows than the accuracy, so the
    sf0.01 oracle is hash-exact. At larger data, accuracy is the documented
    recall/memory knob (state is O(accuracy * log n), independent of group
    size). Plan-asserted sort-free in tests/test_plans.py."""
    ev = load(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("approx_percentile(value, 0.5, 10000)"), 4).alias("p50"),
        F.round(F.expr("approx_percentile(value, 0.9, 10000)"), 4).alias("p90"),
        F.round(F.expr("approx_percentile(value, 0.99, 10000)"), 4).alias("p99"),
    )


_EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
               "event_type string, value double, props string")
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"  # micros; default JSON/CSV format
#                                           is millis and silently truncates


def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    import hashlib
    import tempfile

    tag = hashlib.sha1(f"{sf_dir}|{fmt}".encode()).hexdigest()[:12]
    return f"{tempfile.gettempdir()}/events_rt_{fmt}_{tag}"


def _events_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """Write events out as ``fmt`` (jsonl/csv) and read it back with an
    explicit schema — the multi-format ingestion path (the engine's file
    surface is not parquet-only). Micro-second timestamps survive via an
    explicit timestampFormat; the aggregate below hash-matches the
    parquet-read oracle, proving the transport is lossless."""
    ev = load(spark, "events", sf_dir)
    d = _roundtrip_dir(sf_dir, fmt)
    w = ev.write.mode("overwrite").option("timestampFormat", _TS_FMT)
    r = (spark.read.schema(_EVENTS_DDL)
         .option("timestampFormat", _TS_FMT))
    if fmt == "jsonl":
        w.json(d)
        back = r.json(d)
    elif fmt == "orc":
        # ORC stores timestamps natively (no format option needed) and,
        # like parquet, gives predicate pushdown + column pruning on read.
        w.orc(d)
        back = spark.read.schema(_EVENTS_DDL).orc(d)
    else:
        w.option("header", "true").csv(d)
        back = r.option("header", "true").csv(d)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


_ROUNDTRIP_ORACLE = """
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 2) AS total_value,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM events GROUP BY event_type
    """


@query("events_jsonl_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def events_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines ingestion parity: events written as jsonl, read back
    with a declared schema, aggregated — hash-equal to reading the
    parquet. (Reference analog: every message IS json,
    bin/mqtt-streamr.js:149-155; this is the batch-file counterpart.)"""
    return _events_roundtrip(spark, sf_dir, "jsonl")


@query("events_csv_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def events_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingestion parity: same contract as the jsonl path (quoted
    fields cover the embedded-JSON props column)."""
    return _events_roundtrip(spark, sf_dir, "csv")


@query(
    "join_range_view_attribution",
    oracle="""
    WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts,
                      ts - INTERVAL 1 HOUR AS lo
               FROM events WHERE event_type = 'purchase'),
    v AS (SELECT event_id AS v_id, user_id, ts AS v_ts
          FROM events WHERE event_type = 'view'),
    j AS (SELECT p.p_id, p.user_id, p.p_ts
          FROM p JOIN v ON p.user_id = v.user_id
                       AND v.v_ts BETWEEN p.lo AND p.p_ts)
    SELECT date_trunc('day', p_ts) AS day,
           count(DISTINCT p_id) AS n_purchases,
           count(*) AS n_attributed_views,
           count(DISTINCT user_id) AS n_users
    FROM j GROUP BY 1
    """,
)
def join_range_view_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (purchase attribution: views in the hour before
    each purchase by the same user) via the BINNED range join — explode
    intervals over 15-min buckets, equi-join on (user, bucket), exact
    BETWEEN post-filter. The naive theta join keeps the user equi-key but
    nested-loops within each user group; binning makes the join a plain
    shuffled equi-join whose fan-out is interval/bin width (4-5 here).
    Plan-asserted: no nested-loop/cartesian node."""
    from mqtt_streamr_spark.operators.joins import range_bin_join

    ev = load(spark, "events", sf_dir)
    p = ev.filter(col("event_type") == "purchase").select(
        col("event_id").alias("p_id"), "user_id", col("ts").alias("p_ts"),
        (col("ts") - F.expr("INTERVAL 1 HOUR")).alias("lo"),
    )
    v = ev.filter(col("event_type") == "view").select(
        col("event_id").alias("v_id"), "user_id", col("ts").alias("v_ts"),
    )
    j = range_bin_join(p, v, on="user_id", lo_col="lo", hi_col="p_ts",
                       ts_col="v_ts", bin_width_s=900)
    return j.groupBy(F.date_trunc("day", "p_ts").alias("day")).agg(
        F.countDistinct("p_id").alias("n_purchases"),
        F.count(F.lit(1)).alias("n_attributed_views"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "events_sessionized_stats",
    oracle="""
    WITH g AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts - lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT user_id, ts,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM g),
    per_session AS (
        SELECT user_id, session_seq,
               count(*) AS n_events,
               epoch(max(ts) - min(ts)) AS duration_s,
               date_trunc('day', min(ts)) AS day
        FROM s GROUP BY user_id, session_seq)
    SELECT day,
           count(*) AS n_sessions,
           round(avg(n_events), 4) AS avg_events,
           max(n_events) AS max_events,
           round(avg(duration_s), 2) AS avg_duration_s
    FROM per_session GROUP BY day
    """,
)
def events_sessionized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level sessionization (30-min gap) -> per-session -> per-day
    stats. Unlike the session_window AGGREGATE (events_session_windows),
    sessionize() labels individual rows with a session sequence, keeping
    row granularity for funnels/attribution; one shuffle on user_id
    shared by the window and the first aggregation."""
    from mqtt_streamr_spark.operators.joins import sessionize

    ev = load(spark, "events", sf_dir)
    s = sessionize(ev.select("user_id", "ts"), "user_id", "ts", gap_s=1800)
    per_session = s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
         / 1_000_000.0).alias("duration_s"),
        F.date_trunc("day", F.min("ts")).alias("day"),
    )
    return per_session.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.max("n_events").alias("max_events"),
        F.round(F.avg("duration_s"), 2).alias("avg_duration_s"),
    )


@query(
    "agg_distinct_approx_hll",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)::BIGINT AS approx_users,
           count(DISTINCT date_trunc('day', ts))::BIGINT AS approx_days
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_distinct_approx_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB distinct-count path: ``approx_count_distinct``
    (HyperLogLog++) keeps O(1/rsd^2) state per group and merges map-side,
    where exact count(DISTINCT) shuffles every distinct value. rsd=0.02
    keeps the sketch in sparse mode (exact) at the oracle's sf0.01
    cardinalities so the exact-count oracle is hash-exact, while the
    register array stays small — rsd=0.005 was measured to cost ~10 s of
    pure register-merge overhead at ANY data size (fixed (1.04/rsd)^2
    registers per partial), a reminder that the accuracy knob is also
    the state-size knob. Companion to the exact ``agg_distinct_counts``
    the same way percentiles pair exact/approx."""
    ev = load(spark, "events", sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.expr("approx_count_distinct(user_id, 0.02)")
            .alias("approx_users"),
            F.expr(
                "approx_count_distinct(date_trunc('day', ts), 0.02)"
            ).alias("approx_days"),
        )
        .orderBy("event_type")
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH stage AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               AS t_purchase
      FROM events GROUP BY user_id
    ),
    flags AS (
      SELECT (t_view IS NOT NULL) AS viewed,
             (t_view IS NOT NULL AND t_click > t_view) AS clicked_after,
             (t_view IS NOT NULL AND t_click > t_view
              AND t_purchase > t_click) AS purchased_after
      FROM stage
    )
    SELECT count(*)::BIGINT AS n_users,
           sum(viewed::INT)::BIGINT AS n_viewed,
           sum(clicked_after::INT)::BIGINT AS n_clicked,
           sum(purchased_after::INT)::BIGINT AS n_purchased,
           round(sum(purchased_after::INT) * 1.0
                 / nullif(sum(viewed::INT), 0), 4) AS full_funnel_rate
    FROM flags
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> click -> purchase): per-user
    earliest timestamp per stage via one conditional-min agg (single
    shuffle on user_id), stage ordering checked on the tiny per-user
    result, global rates from a 1-row final agg. The standard product
    analytics query, expressed without self-joins — at 100 TB the
    per-user agg is the only data-sized shuffle."""
    ev = load(spark, "events", sf_dir)
    stage = ev.groupBy("user_id").agg(
        F.min(F.when(col("event_type") == "view", col("ts")))
        .alias("t_view"),
        F.min(F.when(col("event_type") == "click", col("ts")))
        .alias("t_click"),
        F.min(F.when(col("event_type") == "purchase", col("ts")))
        .alias("t_purchase"),
    )
    viewed = col("t_view").isNotNull()
    clicked = viewed & (col("t_click") > col("t_view"))
    purchased = clicked & (col("t_purchase") > col("t_click"))
    flags = stage.select(
        viewed.alias("viewed"), clicked.alias("clicked_after"),
        purchased.alias("purchased_after"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(col("viewed").cast("int")).alias("n_viewed"),
        F.sum(col("clicked_after").cast("int")).alias("n_clicked"),
        F.sum(col("purchased_after").cast("int")).alias("n_purchased"),
        F.round(
            F.sum(col("purchased_after").cast("int"))
            / F.nullif(F.sum(col("viewed").cast("int")), F.lit(0)), 4
        ).alias("full_funnel_rate"),
    )


@query(
    "join_asof_nearest_tolerance",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts, value AS p_value
               FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts, value AS v_value
          FROM events WHERE event_type = 'view'),
    b AS (SELECT p.event_id, max(v.ts) AS t
          FROM p JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
          GROUP BY p.event_id),
    f AS (SELECT p.event_id, min(v.ts) AS t
          FROM p JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
          GROUP BY p.event_id),
    pick AS (
      SELECT p.event_id, p.user_id, p.ts, p.p_value,
             CASE WHEN b.t IS NOT NULL AND (f.t IS NULL OR
                       epoch_us(p.ts) - epoch_us(b.t)
                       <= epoch_us(f.t) - epoch_us(p.ts))
                  THEN b.t ELSE f.t END AS vt
      FROM p LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
    ),
    lim AS (SELECT event_id, user_id, ts, p_value,
                   CASE WHEN vt IS NOT NULL
                         AND abs(epoch_us(ts) - epoch_us(vt))
                             <= 3600::BIGINT * 1000000
                        THEN vt END AS vt
            FROM pick)
    SELECT l.event_id, round(l.p_value, 2) AS p_value,
           round(v.v_value, 2) AS v_value
    FROM lim l LEFT JOIN v
      ON l.user_id = v.user_id AND l.vt = v.ts
    """,
)
def join_asof_nearest_tolerance(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """As-of join, NEAREST direction with a 1-hour tolerance: each
    purchase matched to the same user's closest view in either time
    direction, nulled when the nearest view is over an hour away —
    merge_asof(direction='nearest', tolerance=...) semantics
    (equidistant ties prefer the backward match). Same single-shuffle
    union+window machinery as the backward query; 'nearest' adds one
    extra in-partition window pass, no extra exchange."""
    from mqtt_streamr_spark.operators.joins import asof_join

    ev = load(spark, "events", sf_dir)
    p = ev.filter(col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", col("value").alias("p_value")
    )
    v = ev.filter(col("event_type") == "view").select(
        "user_id", "ts", col("value").alias("v_value")
    )
    j = asof_join(p, v, on="user_id", ts_col="ts",
                  direction="nearest", tolerance_s=3600)
    return j.select(
        "event_id",
        F.round("p_value", 2).alias("p_value"),
        F.round("v_value_asof", 2).alias("v_value"),
    )


@query(
    "window_trailing_range_avg",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, ts, value,
             round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
             ), 4) AS trailing_avg,
             count(*) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
             )::BIGINT AS trailing_n
      FROM events
    )
    SELECT event_id, trailing_avg, trailing_n FROM w
    ORDER BY trailing_n DESC, event_id LIMIT 25
    """,
)
def window_trailing_range_avg(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """RANGE-frame analytic window: each event's trailing-1-hour average
    and count over the same user's events — the time-based frame
    (rangeBetween on epoch seconds) that ROWS frames cannot express when
    event spacing is irregular. One shuffle on user_id; frame state is
    bounded by the hour horizon, not the partition size."""
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    out = ev.select(
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("trailing_avg"),
        F.count(F.lit(1)).over(w).alias("trailing_n"),
    )
    return out.orderBy(F.col("trailing_n").desc(), "event_id").limit(25)


@query(
    "pivot_daily_event_counts",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
             AS click,
           sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
             AS error,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
             AS purchase,
           sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT
             AS signup,
           sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
             AS view
    FROM events GROUP BY day ORDER BY day
    """,
)
def pivot_daily_event_counts(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """Relational pivot: event types become columns of per-day counts via
    ``groupBy(day).pivot(event_type, [explicit values])`` — the explicit
    value list is the scale-relevant form (without it Spark runs an extra
    distinct job over the whole input to discover the columns). Compiles
    to the same single-shuffle conditional aggregation the oracle
    spells out with CASE."""
    ev = load(spark, "events", sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for empty cells; the CASE oracle produces 0
    for t in types:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0)))
    return out.orderBy("day")


@query(
    "unpivot_event_type_counts",
    oracle="""
    WITH p AS (
      SELECT date_trunc('day', ts) AS day,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
               AS click,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
               AS view
      FROM events GROUP BY day
    )
    SELECT day, event_type, n
    FROM p UNPIVOT (n FOR event_type IN (click, view))
    ORDER BY day, event_type
    """,
)
def unpivot_event_type_counts(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Relational unpivot (melt): wide per-day count columns back to
    (day, event_type, n) rows via ``DataFrame.unpivot`` — the inverse of
    the pivot query, a pure map-side Expand (no shuffle beyond the
    upstream agg). DuckDB's UNPIVOT drops NULL cells; counts here are
    CASE-summed so every cell is non-null and the engines agree."""
    ev = load(spark, "events", sf_dir)
    wide = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.sum(F.when(col("event_type") == "click", 1).otherwise(0))
            .alias("click"),
            F.sum(F.when(col("event_type") == "view", 1).otherwise(0))
            .alias("view"),
        )
    )
    return (
        wide.unpivot("day", ["click", "view"], "event_type", "n")
        .orderBy("day", "event_type")
    )


@query("events_orc_roundtrip", oracle=_ROUNDTRIP_ORACLE)
def events_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingestion parity: events written as ORC and read back with a
    declared schema — the third columnar/file surface next to parquet and
    the jsonl/csv text formats, closing the §2.1 file-format row for every
    format Spark ships a native vectorized reader for."""
    return _events_roundtrip(spark, sf_dir, "orc")


@query(
    "events_partition_pruned_scan",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE ts::DATE = (SELECT min(ts::DATE) FROM events)
    GROUP BY event_type
    """,
)
def events_partition_pruned_scan(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """Hive-style partitioned layout + static partition pruning: events are
    written ``partitionBy(event_date)`` (pre-shuffled on the partition key
    so each date lands in ONE file — the standard fix for the small-files
    problem at 100 TB), then the day query reads back with a literal date
    filter. Catalyst turns that into ``PartitionFilters`` (plan-asserted in
    tests/test_plans.py): only the matching date directory is listed and
    scanned, so the query's I/O is proportional to one day, not the whole
    table — the core mechanism that makes time-ranged queries on a 100 TB
    event log cheap. The min-day lookup is a 1-row planning-step aggregate
    (same precedent as the ANN cell-id planning collects)."""
    import hashlib
    import tempfile

    ev = load(spark, "events", sf_dir)
    tag = hashlib.sha1(f"{sf_dir}|part".encode()).hexdigest()[:12]
    d = f"{tempfile.gettempdir()}/events_by_day_{tag}"
    # r11: write only the columns the day probe reads (guide §6.2) — the
    # full-width layout encoded every event column into the day files and
    # paid 2.3 s cold where the projected write is 1.0 s; the probe's
    # result is identical (it never touched the other columns).
    (ev.select("event_type", "user_id", "value",
               F.to_date("ts").alias("event_date"))
       .repartition(col("event_date"))
       .write.mode("overwrite").partitionBy("event_date").parquet(d))
    min_day = ev.agg(F.min(F.to_date("ts"))).first()[0]
    back = spark.read.parquet(d).where(col("event_date") == F.lit(min_day))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "events_gapfill_islands",
    oracle="""
    WITH b AS (SELECT (floor(epoch(ts))::BIGINT // 900) AS bin
               FROM events WHERE event_type = 'purchase'),
    cnt AS (SELECT bin, count(*)::BIGINT AS n FROM b GROUP BY bin),
    spine AS (SELECT unnest(generate_series((SELECT min(bin) FROM b),
                                            (SELECT max(bin) FROM b)))
                     AS bin),
    filled AS (SELECT s.bin, coalesce(c.n, 0) AS n
               FROM spine s LEFT JOIN cnt c USING (bin)),
    empty AS (SELECT bin,
                     bin - row_number() OVER (ORDER BY bin) AS grp
              FROM filled WHERE n = 0),
    runs AS (SELECT count(*)::BIGINT AS run FROM empty GROUP BY grp)
    SELECT (SELECT count(*) FROM filled) AS n_bins,
           (SELECT count(*) FROM filled WHERE n = 0) AS n_empty,
           coalesce((SELECT max(run) FROM runs), 0) AS longest_gap,
           (SELECT sum(n) FROM filled)::BIGINT AS total_events
    """,
)
def events_gapfill_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine gap fill + gaps-and-islands: bucket purchases into 15-min
    bins, generate the COMPLETE bin spine distributedly (sequence exploded
    from the 1-row min/max aggregate — no driver collect), left-join the
    per-bin counts, and report empty-bin totals plus the longest
    consecutive gap via the classic bin-minus-row_number island key.

    Scale shape: the per-bin aggregate is the only data-sized shuffle; the
    spine is metadata-sized (one row per 15 minutes — a year of 100 TB
    telemetry is ~35k rows), so the unpartitioned window over it is cheap
    by construction and the gap report stays O(spine)."""
    ev = load(spark, "events", sf_dir)
    b = ev.where(col("event_type") == "purchase").select(
        (F.unix_timestamp("ts") / 900).cast("long").alias("bin")
    )
    cnt = b.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    spine = (
        b.agg(F.min("bin").alias("lo"), F.max("bin").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("bin"))
    )
    filled = spine.join(cnt, "bin", "left").select(
        "bin", F.coalesce("n", F.lit(0)).alias("n")
    )
    from pyspark.sql import Window

    empty = filled.where(col("n") == 0).select(
        "bin",
        (col("bin") - F.row_number().over(
            Window.orderBy("bin"))).alias("grp"),
    )
    runs = empty.groupBy("grp").agg(F.count(F.lit(1)).alias("run"))
    return (
        filled.agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum(F.when(col("n") == 0, 1).otherwise(0)).alias("n_empty"),
            F.sum("n").alias("total_events"),
        )
        .crossJoin(
            F.broadcast(
                runs.agg(
                    F.coalesce(F.max("run"), F.lit(0)).alias("longest_gap")
                )
            )
        )
        .select("n_bins", "n_empty", "longest_gap", "total_events")
    )


@query(
    "events_rolling_7d_active_users",
    oracle="""
    WITH pairs AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
                   FROM events),
    mx AS (SELECT max(day) AS max_day FROM pairs),
    contrib AS (
      SELECT unnest(generate_series(day, day + INTERVAL 6 DAY,
                                    INTERVAL 1 DAY)) AS day,
             user_id
      FROM pairs),
    rolled AS (
      SELECT c.day, count(DISTINCT c.user_id)::BIGINT AS active_users_7d
      FROM contrib c, mx WHERE c.day <= mx.max_day
      GROUP BY c.day)
    SELECT day, active_users_7d FROM rolled ORDER BY day
    """,
)
def events_rolling_7d_active_users(spark: SparkSession, sf_dir: str
                                   ) -> DataFrame:
    """Trailing 7-day distinct active users per day — the rolling-DISTINCT
    aggregate that a RANGE window frame cannot express (count_distinct is
    unsupported over window frames). Shape: collapse to distinct
    (day, user) pairs first (one shuffle, output bounded by days x users),
    then each pair map-side EXPLODES into the <=7 trailing windows it
    contributes to and one count-distinct per day finishes — a bounded
    7x expansion instead of a day-spine range self-join, with no state
    proportional to the raw event count."""
    ev = load(spark, "events", sf_dir)
    pairs = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    mx = F.broadcast(pairs.agg(F.max("day").alias("max_day")))
    contrib = pairs.select(
        F.explode(
            F.sequence(
                col("day"),
                col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
        "user_id",
    )
    return (
        contrib.crossJoin(mx)
        .where(col("day") <= col("max_day"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
        .orderBy("day")
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
    joined AS (
      SELECT f.cohort_week,
             ((floor(epoch(a.week))::BIGINT
               - floor(epoch(f.cohort_week))::BIGINT) // 604800)
               AS week_offset,
             a.user_id
      FROM activity a JOIN firsts f USING (user_id))
    SELECT cohort_week, week_offset,
           count(DISTINCT user_id)::BIGINT AS n_active
    FROM joined WHERE week_offset <= 4
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    active in each subsequent week (offsets 0-4) — the standard
    product-analytics triangle. Shape: one min-agg for cohorts, one
    distinct (user, week) collapse, then an equi-join on user_id — both
    heavy inputs shuffle once on the SAME key, and the result is bounded
    by cohorts x offsets, independent of event volume."""
    ev = load(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    ).distinct()
    joined = activity.join(firsts, "user_id").select(
        "cohort_week",
        ((F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
         / 604800).cast("long").alias("week_offset"),
        "user_id",
    )
    return (
        joined.where(col("week_offset") <= 4)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, median(value) AS med
        FROM events GROUP BY event_type),
    dev AS (
        SELECT e.event_type, abs(e.value - m.med) AS ad, m.med
        FROM events e JOIN med m USING (event_type)),
    mad AS (
        SELECT event_type, median(ad) AS mad
        FROM dev GROUP BY event_type)
    SELECT d.event_type,
           count(*) AS n_events,
           sum(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END)::BIGINT
               AS n_outliers,
           round(any_value(d.med), 4) AS med_value,
           round(any_value(m.mad), 4) AS mad_value
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: per-group median/MAD (median absolute
    deviation) outlier flags — the robust alternative to mean/stddev
    z-scores (one wild value cannot drag the threshold). Two grouped
    medians + two joins, but both join sides collapse to GROUP
    cardinality (event types), so each join is a broadcast over the fact
    scan; the only data-sized shuffles are the two medians, and at 100 TB
    the exact medians swap for approx_percentile (same shape as the
    percentile pair, agg_value_percentiles[_approx])."""
    ev = load(spark, "events", sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(col("value") - col("med")))
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(col("ad") > 3 * col("mad"), 1).otherwise(0))
            .alias("n_outliers"),
            F.round(F.first("med"), 4).alias("med_value"),
            F.round(F.first("mad"), 4).alias("mad_value"),
        )
    )


@query(
    "events_ewma_per_user",
    oracle="""
    WITH RECURSIVE ordered AS (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events),
    r AS (
        SELECT user_id, rn, n, value::DOUBLE AS e
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.rn, o.n, 0.3 * o.value + (1.0 - 0.3) * r.e
        FROM ordered o
        JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
    SELECT user_id, max(rn)::BIGINT AS n_events,
           round(max(CASE WHEN rn = n THEN e END), 6) AS final_ewma
    FROM r GROUP BY user_id
    """,
)
def events_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (operators/grouped.ewma_final_per_key): the ordered
    recurrence no window frame expresses, computed in one partition-sorted
    mapInPandas pass (carry state across Arrow batches) and checked
    against a recursive-CTE oracle computing the identical float
    sequence. Returns each user's final smoothed value + event count.
    r11: replaced the per-group applyInPandas + re-aggregate shape (one
    Arrow round-trip per user, then a second shuffle for the groupBy)
    with the single-pass operator — 3.8 s -> 0.43 s warm at sf0.1,
    bit-identical output (same float op order; rounding stays in Spark)."""
    from mqtt_streamr_spark.operators.grouped import ewma_final_per_key

    ev = load(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "value")
    sm = ewma_final_per_key(ev, "user_id", "ts", "value", alpha=0.3,
                            order_cols=["event_id"])
    return sm.select(
        "user_id", "n_events", F.round("ewma_raw", 6).alias("final_ewma")
    )


@query(
    "events_value_histogram",
    oracle="""
    WITH b AS (
        SELECT event_type,
               least(greatest(floor(value / 25.0), 0), 19)::BIGINT AS bin
        FROM events WHERE value IS NOT NULL)
    SELECT event_type, bin, count(*) AS n
    FROM b GROUP BY event_type, bin
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 bins of width 25, clamped tails) per
    event type — the one-pass distribution profile: binning is a pure
    map expression, so the only shuffle is the (type, bin)-cardinality
    aggregate and the plan partial-aggregates map-side at any scale."""
    ev = load(spark, "events", sf_dir).filter(col("value").isNotNull())
    bin_col = F.least(
        F.greatest(F.floor(col("value") / 25.0), F.lit(0)), F.lit(19)
    ).cast("long")
    return (
        ev.select("event_type", bin_col.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events)
    SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n,
           round(count(*)::DOUBLE / sum(count(*)) OVER
                 (PARTITION BY event_type), 6) AS p
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: per-user event-to-next-event transition counts and
    row-normalized probabilities (first-order Markov matrix). ONE
    shuffle on user for the lead() sequencing; the transition aggregate
    and the normalizing window both run over type-pair cardinality —
    metadata-sized however big the event log."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        load(spark, "events", sf_dir)
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(col("next_type").isNotNull())
    )
    counts = seq.groupBy(
        col("event_type").alias("from_type"),
        col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    norm = Window.partitionBy("from_type")
    return counts.withColumn(
        "p", F.round(col("n") / F.sum("n").over(norm), 6)
    )


@query(
    "events_equidepth_buckets",
    oracle="""
    WITH b AS (
        SELECT event_type,
               quantile_cont(value, [0.25, 0.5, 0.75]) AS bounds
        FROM events WHERE value IS NOT NULL GROUP BY event_type),
    a AS (
        SELECT e.event_type,
               len(list_filter(b.bounds, x -> e.value > x)) AS bucket,
               e.value
        FROM events e JOIN b USING (event_type)
        WHERE e.value IS NOT NULL)
    SELECT event_type, bucket::INT AS bucket, count(*) AS n,
           round(min(value), 4) AS lo, round(max(value), 4) AS hi
    FROM a GROUP BY event_type, bucket
    """,
)
def events_equidepth_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) bucketing: per-type quartile boundaries,
    each row assigned to the bucket = #boundaries below its value — the
    equi-DEPTH complement of events_value_histogram's equi-width bins
    (this is how skew-robust histograms and NTILE-style stratifications
    are built without a global sort). The boundary table collapses to
    group cardinality and broadcasts; exact percentile here for oracle
    parity, approx_percentile is the documented scale path (same
    contract as agg_value_percentiles_approx)."""
    ev = load(spark, "events", sf_dir).filter(
        col("value").isNotNull()).select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.25, 0.5, 0.75))").alias("bounds"))
    a = ev.join(F.broadcast(bounds), "event_type").withColumn(
        "bucket",
        F.size(F.filter("bounds", lambda x: col("value") > x)),
    )
    return a.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


@query(
    "agg_sketch_rollup_weekly",
    oracle="""
    WITH d AS (SELECT DISTINCT date_trunc('week', ts) AS week, user_id
               FROM events)
    SELECT CAST(week AS VARCHAR) AS week,
           count(*) AS distinct_users
    FROM d GROUP BY week
    """,
)
def agg_sketch_rollup_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-sketch rollup — the pattern that answers distinct-count
    questions at 100 TB without rescanning raw data: build per-DAY HLL
    sketches once (hll_sketch_agg), then answer the WEEKLY question by
    merging the daily sketches (hll_union_agg) — 7 sketch merges instead
    of a week of raw scan. Exact at this cardinality (Datasketches HLL
    is exact in sparse mode, ≤150 users/week here) so the oracle
    hash-matches; at real scale the estimate carries the documented
    ~1.6% HLL error, same contract as agg_distinct_approx_hll."""
    ev = load(spark, "events", sf_dir)
    daily = (
        ev.groupBy(
            F.date_trunc("week", col("ts")).alias("week"),
            F.date_trunc("day", col("ts")).alias("day"),
        )
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    return (
        daily.groupBy("week")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("sketch")
            ).alias("distinct_users")
        )
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            "distinct_users",
        )
    )


@query(
    "events_schema_evolution_read",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           sum(CASE WHEN ts >= DATE '2024-02-01' THEN 1 ELSE 0 END)::BIGINT
               AS n_new_era,
           round(sum(CASE WHEN ts >= DATE '2024-02-01'
                          THEN value ELSE 0 END), 2) AS quality_sum
    FROM events GROUP BY event_type
    """,
)
def events_schema_evolution_read(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """Schema evolution across file generations — the long-lived-dataset
    reality: an old slice written WITHOUT a column, a new slice WITH it
    (here ``quality`` = value for the new era), read back as ONE dataset
    via mergeSchema. Old-era rows surface the added column as NULL; the
    aggregate proves nothing is dropped, duplicated, or misaligned. At
    scale, mergeSchema costs one footer read per file generation — keep
    generations (not files) few; the data itself is never rewritten."""
    ev = load(spark, "events", sf_dir).select(
        "event_id", "event_type", "ts", "value")
    d = _roundtrip_dir(sf_dir, "schevo")
    old = ev.filter(col("ts") < "2024-02-01")
    new = ev.filter(col("ts") >= "2024-02-01").withColumn(
        "quality", col("value"))
    old.write.mode("overwrite").parquet(f"{d}/gen=0")
    new.write.mode("overwrite").parquet(f"{d}/gen=1")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{d}/gen=0", f"{d}/gen=1")
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(col("quality").isNotNull(), 1).otherwise(0))
        .alias("n_new_era"),
        F.round(F.sum(F.coalesce(col("quality"), F.lit(0.0))), 2)
        .alias("quality_sum"),
    )


@query(
    "events_rfm_scores",
    oracle="""
    WITH mx AS (SELECT max(ts) AS now FROM events
                WHERE event_type = 'purchase'),
    rfm AS (
        SELECT user_id,
               date_diff('day', max(ts), (SELECT now FROM mx))
                   AS recency_days,
               count(*) AS frequency,
               round(sum(value), 2) AS monetary
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id),
    scored AS (
        SELECT user_id, recency_days, frequency, monetary,
               ntile(5) OVER (ORDER BY recency_days DESC, user_id)
                   AS r_score,
               ntile(5) OVER (ORDER BY frequency, user_id) AS f_score,
               ntile(5) OVER (ORDER BY monetary, user_id) AS m_score
        FROM rfm)
    SELECT user_id, recency_days::BIGINT AS recency_days, frequency,
           monetary, r_score::INT AS r_score, f_score::INT AS f_score,
           m_score::INT AS m_score
    FROM scored
    """,
)
def events_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM behavioral features — the classic per-user feature-engineering
    pass: recency (days since last purchase, against the corpus clock),
    frequency, monetary, each quintile-scored 1-5 via ntile with a
    deterministic user_id tie-break. One shuffle for the per-user
    aggregate; the ntile windows run over the USER table (already
    aggregate-sized). Better scores = higher bucket (recency reversed)."""
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir).filter(
        col("event_type") == "purchase")
    now = ev.agg(F.max("ts").alias("now"))
    rfm = (
        ev.crossJoin(F.broadcast(now))
        .groupBy("user_id")
        .agg(
            F.datediff(F.max("now"), F.max("ts")).cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
    )
    return rfm.select(
        "user_id", "recency_days", "frequency", "monetary",
        F.ntile(5).over(
            Window.orderBy(F.col("recency_days").desc(), "user_id")
        ).alias("r_score"),
        F.ntile(5).over(Window.orderBy("frequency", "user_id"))
        .alias("f_score"),
        F.ntile(5).over(Window.orderBy("monetary", "user_id"))
        .alias("m_score"),
    )


@query(
    "events_decayed_user_value",
    oracle="""
    WITH mx AS (SELECT max(ts) AS now FROM events
                WHERE event_type = 'purchase'),
    w AS (SELECT user_id, value,
                 power(0.5, (epoch_us((SELECT now FROM mx))
                             - epoch_us(ts)) / 604800000000.0) AS wt
          FROM events WHERE event_type = 'purchase')
    SELECT user_id,
           count(*) AS n_purchases,
           round(sum(value * wt), 4) AS decayed_value,
           round(sum(value), 2) AS raw_value
    FROM w GROUP BY user_id
    """,
)
def events_decayed_user_value(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Half-life-decayed user value (7-day half-life against the corpus
    clock): the recency-weighted featurization that replaces arbitrary
    'last N days' cutoffs. The weight is a map-side expression (corpus
    max ts broadcast as one row), so the plan is the same single
    per-user shuffle as a plain sum — decay costs nothing at scale."""
    ev = load(spark, "events", sf_dir).filter(
        col("event_type") == "purchase")
    now = ev.agg(F.max("ts").alias("now"))
    w = ev.crossJoin(F.broadcast(now)).withColumn(
        "wt",
        F.pow(
            F.lit(0.5),
            (F.unix_micros("now") - F.unix_micros("ts")) / 604800000000.0,
        ),
    )
    return w.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum(col("value") * col("wt")), 4).alias("decayed_value"),
        F.round(F.sum("value"), 2).alias("raw_value"),
    )


@query(
    "events_value_trend",
    oracle="""
    WITH t AS (SELECT event_type,
                      epoch_us(ts) / 86400000000.0 AS day_x, value
               FROM events WHERE value IS NOT NULL)
    SELECT event_type, count(*) AS n,
           round(regr_slope(value, day_x), 6) AS slope_per_day,
           round(regr_intercept(value, day_x), 4) AS intercept,
           round(regr_r2(value, day_x), 6) AS r2
    FROM t GROUP BY event_type
    """,
)
def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group linear trend via the native regression aggregates
    (regr_slope/intercept/r2): is each event type's value drifting over
    time, and how well does a line explain it? Constant partial-agg
    state per group (sums of x, y, xy, x², y²), so trend detection over
    100 TB costs exactly one aggregate pass."""
    ev = load(spark, "events", sf_dir).filter(col("value").isNotNull())
    t = ev.select(
        "event_type",
        (F.unix_micros("ts") / 86400000000.0).alias("day_x"),
        "value",
    )
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope("value", "day_x"), 6).alias("slope_per_day"),
        F.round(F.regr_intercept("value", "day_x"), 4).alias("intercept"),
        F.round(F.regr_r2("value", "day_x"), 6).alias("r2"),
    )


@query(
    "events_interevent_gaps",
    oracle="""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id))
                   AS gap_us
        FROM events)
    SELECT user_id, count(gap_us) AS n_gaps,
           round(quantile_cont(gap_us / 60000000.0, 0.5), 4)
               AS median_gap_min,
           round(max(gap_us) / 60000000.0, 4) AS max_gap_min
    FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
    """,
)
def events_interevent_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per user (median + max, minutes):
    the activity-cadence feature behind session-timeout and churn
    heuristics. One user-key shuffle for the lag(); the exact median
    is oracle parity, approx_percentile the scale path."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        load(spark, "events", sf_dir)
        .select("user_id", "ts", "event_id")
        .withColumn(
            "gap_us",
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)),
        )
        .filter(col("gap_us").isNotNull())
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.expr("percentile(gap_us / 60000000.0, 0.5)"), 4)
        .alias("median_gap_min"),
        F.round(F.max("gap_us") / 60000000.0, 4).alias("max_gap_min"),
    )


@query(
    "events_top_session_paths",
    oracle="""
    WITH x AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        FROM events),
    s AS (SELECT user_id, ts, event_id, event_type,
                 sum(new_s) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM x),
    r AS (SELECT user_id, sid, event_type,
                 row_number() OVER (PARTITION BY user_id, sid
                                    ORDER BY ts, event_id) AS rn
          FROM s),
    paths AS (
        SELECT string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= 3 GROUP BY user_id, sid)
    SELECT path, count(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 10
    """,
)
def events_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each session's first three event types as a
    path signature, ranked by frequency — the product-analytics view of
    HOW sessions start. Sessionization and path assembly share ONE
    user-key shuffle (same gaps-and-islands keys); the path aggregate
    runs over path-cardinality and the top-10 is TakeOrdered."""
    from pyspark.sql import Window

    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type")
    x = ev.withColumn(
        "new_s",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)
            >= 1800 * 1_000_000, 1
        ).otherwise(0),
    )
    s = x.withColumn(
        "sid", F.sum("new_s").over(wu.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    r = s.withColumn("rn", F.row_number().over(ws)).filter(col("rn") <= 3)
    paths = (
        r.groupBy("user_id", "sid")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                    lambda t: t["event_type"],
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(col("n_sessions").desc(), "path")
        .limit(10)
    )


@query(
    "events_incremental_rollup",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY day, event_type
    """,
)
def events_incremental_rollup(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Incremental rollup maintenance — the INSERT OVERWRITE PARTITION
    pattern: the historical slice's daily aggregate is 'already
    materialized' (computed once here), and the new slice contributes
    ONLY its own days' aggregates, unioned in without touching history.
    The oracle is the full recompute, proving the incremental result is
    exactly equal — because daily partitions are disjoint, maintenance
    cost tracks the NEW day's data however long history grows. (Days
    that straddle the cut would be overwritten whole — here the cut is
    day-aligned, the production contract for partition overwrite.)"""
    ev = load(spark, "events", sf_dir).select("ts", "event_type", "value")
    cut = "2024-02-15"

    def daily(df):
        return df.groupBy(
            F.date_trunc("day", col("ts")).alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )

    historical = daily(ev.filter(col("ts") < cut))  # materialized once
    new_days = daily(ev.filter(col("ts") >= cut))   # the only new work
    return historical.unionByName(new_days)


@query(
    "events_type_cooccurrence_lift",
    oracle="""
    WITH x AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        FROM events),
    s AS (SELECT user_id, event_type,
                 sum(new_s) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM x),
    st AS (SELECT DISTINCT user_id, sid, event_type FROM s),
    n AS (SELECT count(DISTINCT (user_id, sid)) AS n_sessions FROM st),
    sup AS (SELECT event_type, count(*) AS n FROM st GROUP BY event_type),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_ab
        FROM st a JOIN st b
          ON a.user_id = b.user_id AND a.sid = b.sid
         AND a.event_type < b.event_type
        GROUP BY type_a, type_b)
    SELECT p.type_a, p.type_b, p.n_ab,
           round(p.n_ab * (SELECT n_sessions FROM n) * 1.0
                 / (sa.n * sb.n), 6) AS lift
    FROM pairs p
    JOIN sup sa ON sa.event_type = p.type_a
    JOIN sup sb ON sb.event_type = p.type_b
    """,
)
def events_type_cooccurrence_lift(spark: SparkSession, sf_dir: str
                                  ) -> DataFrame:
    """Association mining over sessions: event-type pair support and
    LIFT (P(ab)/(P(a)P(b)) — >1 means the types co-occur more than
    independence predicts). Sessionize (one user-key shuffle), collapse
    to the per-session sorted type set, then count pair/type/session
    entries in ONE aggregation pass (r12 — see
    _cooccurrence_from_sessions). The itemset step of market-basket
    analysis, session-scoped."""
    from pyspark.sql import Window

    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type")
    s = (
        ev.withColumn(
            "new_s",
            F.when(
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)
                >= 1800 * 1_000_000, 1
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new_s").over(
                wu.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return _cooccurrence_from_sessions(s)


def _cooccurrence_from_sessions(s: DataFrame) -> DataFrame:
    """Pair support + lift from a sessionized (user_id, sid, event_type)
    frame.

    r12 shape (guide §2.1/§2.4): the former shape derived the sessionize
    window FIVE times in one plan — the pair self-join's two sides, the
    two broadcast per-type supports, and the session count (the
    before-plan shows 5 Scan→Exchange→Sort→Window subtrees, zero reuse;
    the two-window sort is re-executed per branch even when AQE reuses
    the first exchange). Now each session's sorted distinct type set
    (``sort_array(collect_set)`` — no extra exchange: the user_id window
    partitioning already clusters the (user_id, sid) groupBy) emits its
    pair entries (i<j over the sorted array ≡ the join's
    ``type_a < type_b``: same binary string order), its type entries and
    one session marker, and ONE groupBy counts all three kinds. The
    counts frame is metadata-sized by construction (≤ types² + types + 1
    rows, scale-independent) and is ``localCheckpoint``ed so the three
    consumers (pairs, the support map, the session count) read the
    materialized rows instead of re-deriving the window (a pushed-down
    kind filter would otherwise split the aggregation back into three
    full derivations). Equivalence with the self-join reference is
    pinned row-identical (incl. NULL event_type, which never pairs and
    whose support row was only ever consumed by never-matching
    equi-joins) by tests/test_operators.py."""
    g = s.groupBy("user_id", "sid").agg(
        F.sort_array(F.collect_set("event_type")).alias("types"))
    pair_entries = F.flatten(F.transform(
        F.col("types"),
        lambda x, i: F.transform(
            F.slice(F.col("types"), i + F.lit(2), F.size(F.col("types"))),
            lambda y: F.struct(F.lit("p").alias("kind"), x.alias("a"),
                               y.alias("b")),
        ),
    ))
    null_s = F.lit(None).cast("string")
    type_entries = F.transform(
        F.col("types"),
        lambda x: F.struct(F.lit("t").alias("kind"), x.alias("a"),
                           null_s.alias("b")),
    )
    session_entry = F.array(F.struct(
        F.lit("n").alias("kind"), null_s.alias("a"), null_s.alias("b")))
    counts = (
        g.select(F.explode(
            F.concat(pair_entries, type_entries, session_entry)).alias("e"))
        .groupBy(col("e.kind").alias("kind"), col("e.a").alias("a"),
                 col("e.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    ).localCheckpoint()
    pairs = counts.filter(col("kind") == "p").select(
        col("a").alias("type_a"), col("b").alias("type_b"),
        col("cnt").alias("n_ab"))
    sup_map = counts.filter(col("kind") == "t").agg(
        F.map_from_entries(
            F.collect_list(F.struct("a", "cnt"))).alias("sup"))
    n_sessions = counts.filter(col("kind") == "n").select(
        col("cnt").alias("n_sessions"))
    return (
        pairs.crossJoin(F.broadcast(sup_map))
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "type_a", "type_b", "n_ab",
            F.round(col("n_ab") * col("n_sessions")
                    / (F.element_at("sup", col("type_a"))
                       * F.element_at("sup", col("type_b"))), 6)
            .alias("lift"),
        )
    )


@query(
    "events_burstiness",
    oracle="""
    WITH d AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               count(*) AS n
        FROM events GROUP BY user_id, day)
    SELECT user_id,
           count(*) AS n_active_days,
           round(avg(n), 4) AS mean_daily,
           round(var_samp(n) / avg(n), 4) AS fano
    FROM d GROUP BY user_id HAVING count(*) > 1
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor = var/mean of daily event counts) per
    user: ~1 means Poisson-like steady activity, >>1 means bursty —
    the overdispersion feature behind bot detection and engagement
    segmentation. Two stacked aggregates, both partial-aggregating;
    the second runs over user×day cardinality."""
    ev = load(spark, "events", sf_dir)
    d = ev.groupBy(
        "user_id", F.date_trunc("day", col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_active_days"),
            F.round(F.avg("n"), 4).alias("mean_daily"),
            F.round(F.var_samp("n") / F.avg("n"), 4).alias("fano"),
        )
        .filter(col("n_active_days") > 1)
    )


@query(
    "events_weekly_growth",
    oracle="""
    WITH w AS (
        SELECT CAST(date_trunc('week', ts) AS VARCHAR) AS week,
               count(*) AS n, round(sum(value), 2) AS total
        FROM events GROUP BY 1)
    SELECT week, n, total,
           round((n - lag(n) OVER (ORDER BY week)) * 1.0
                 / lag(n) OVER (ORDER BY week), 6) AS wow_growth,
           round(avg(n) OVER (ORDER BY week
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2)
               AS ma4
    FROM w
    """,
)
def events_weekly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth + 4-week moving average — the reporting
    staple on top of any rollup. The weekly aggregate is the only
    data-sized shuffle; lag/moving-average windows run over the
    week-cardinality table (single partition by construction, and
    correctly so — it IS metadata)."""
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    w = ev.groupBy(
        F.date_format(F.date_trunc("week", col("ts")), "yyyy-MM-dd")
        .alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )
    wo = Window.orderBy("week")
    return w.select(
        "week", "n", "total",
        F.round((col("n") - F.lag("n").over(wo))
                / F.lag("n").over(wo), 6).alias("wow_growth"),
        F.round(F.avg("n").over(wo.rowsBetween(-3, 0)), 2).alias("ma4"),
    )


@query(
    "events_session_concurrency",
    oracle="""
    WITH x AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts)
                    >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        FROM events),
    s AS (SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM x),
    iv AS (SELECT min(ts) AS t0, max(ts) + INTERVAL '30 minutes' AS t1
           FROM s GROUP BY user_id, sid),
    d AS (SELECT t0 AS t, 1 AS dd FROM iv
          UNION ALL SELECT t1, -1 FROM iv),
    p AS (SELECT t, sum(dd)::BIGINT AS dd FROM d GROUP BY t),
    r AS (SELECT t, sum(dd) OVER (ORDER BY t
                                  ROWS UNBOUNDED PRECEDING) AS level
          FROM p)
    SELECT strftime(CAST(t AS DATE), '%Y-%m-%d') AS day,
           max(level)::BIGINT AS peak_concurrency,
           count(*) AS n_change_points
    FROM r GROUP BY 1
    """,
)
def events_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via a DISTRIBUTED boundary sweep
    (segmented prefix-sum). The naive sweep — +1 at session start, -1 at
    session end, one global running sum ordered by time — serializes onto
    a single task at scale because change points grow with the data. The
    scalable shape used here is the classic two-phase scan:

      1. aggregate boundary deltas per change point, then per DAY — one
         data-sized shuffle each;
      2. exclusive-prefix the per-day nets over the DAY table (metadata-
         sized: one row per day, so the unpartitioned window is cheap by
         construction) to get the concurrency level entering each day;
      3. running-sum within each day partition (parallel across days) and
         add the broadcast day offset.

    Peak per day = max level observed at that day's change points —
    identical to the oracle's single global cumsum at any scale, but with
    no global ordered window over data-sized input. Session intervals are
    Spark ``session_window`` half-open [first, last+gap) spans, the same
    contract events_session_windows pins against its gaps-and-islands
    oracle."""
    return _concurrency_from_events(load(spark, "events", sf_dir))


def _concurrency_from_events(ev: DataFrame) -> DataFrame:
    """Core of events_session_concurrency on an arbitrary events-shaped
    DataFrame (also driven by scale_check.py at 1x/4x/16x input)."""
    from pyspark.sql import Window

    s = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(col("session_window.start").alias("t0"),
                col("session_window.end").alias("t1"))
    )
    # r12 (guide §2.1): one +1/-1 delta row pair per session via a 2-array
    # explode — the former unionAll of two projections of ``s`` derived
    # the session-window aggregate once per union branch (the before-plan
    # shows two MergingSessions subtrees under the Union; same multiset
    # of rows either way)
    deltas = s.select(F.explode(F.array(
        F.struct(col("t0").alias("t"), F.lit(1).alias("dd")),
        F.struct(col("t1").alias("t"), F.lit(-1).alias("dd")),
    )).alias("e")).select(col("e.t").alias("t"), col("e.dd").alias("dd"))
    pts = (
        deltas.groupBy("t")
        .agg(F.sum("dd").alias("dd"))
        .withColumn("day", F.to_date("t"))
    )
    day_net = pts.groupBy("day").agg(F.sum("dd").alias("net"))
    w_days = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = day_net.select(
        "day", F.coalesce(F.sum("net").over(w_days), F.lit(0)).alias("base")
    )
    w_in_day = Window.partitionBy("day").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0)
    lev = (
        pts.withColumn("run", F.sum("dd").over(w_in_day))
        .join(F.broadcast(offsets), "day")
        .withColumn("level", col("base") + col("run"))
    )
    return (
        lev.groupBy("day")
        .agg(F.max("level").alias("peak_concurrency"),
             F.count(F.lit(1)).alias("n_change_points"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                "peak_concurrency", "n_change_points")
    )


@query(
    "events_forward_fill_daily",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, value
               FROM events WHERE value IS NOT NULL),
    obs AS (SELECT user_id, day, value AS obs_value FROM (
              SELECT *, row_number() OVER (
                         PARTITION BY user_id, day
                         ORDER BY ts DESC, event_id DESC) AS rn FROM e)
            WHERE rn = 1),
    span AS (SELECT user_id, min(day) AS lo, max(day) AS hi
             FROM obs GROUP BY user_id),
    spine AS (SELECT user_id,
                     CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                          AS DATE) AS day
              FROM span),
    f AS (SELECT s.user_id, s.day, o.obs_value,
                 last_value(o.obs_value IGNORE NULLS) OVER (
                     PARTITION BY s.user_id ORDER BY s.day
                     ROWS UNBOUNDED PRECEDING) AS filled_value
          FROM spine s LEFT JOIN obs o
               ON o.user_id = s.user_id AND o.day = s.day)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           sum(CASE WHEN obs_value IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_observed,
           sum(CASE WHEN obs_value IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_carried,
           round(sum(filled_value), 2) AS filled_total
    FROM f GROUP BY 1
    """,
)
def events_forward_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily resample with forward fill (last observation carried
    forward) — the time-series gap-repair staple (sensor panels, price
    marks, feature snapshots). Per (user, day) keep the LAST reading
    (max_by over the struct(ts, event_id) — lexicographic, so fully
    deterministic, AND partial-aggregatable: the map side combines down
    to one row per (user, day) BEFORE the exchange, where the previous
    row_number formulation shuffled every event row). Each observation
    then emits its own carried range [day, next_obs_day) via lead() +
    sequence() explode — the r11 rewrite that deletes the old
    spine-build + spine⋈obs left join + fill window (three exchanges,
    one of which crossed the broadcast/SMJ threshold mid-sweep and read
    as 26x shuffle at 16x input): forward fill IS the range each
    observation owns, so materializing a spine and searching backward
    with last(ignorenulls) paid two shuffles for information lead()
    already had. Both windows partition BY USER — no global ordered
    window; plan = two keyed exchanges + map-side explode + one final
    partial-agg groupBy."""
    return _forward_fill_from_events(load(spark, "events", sf_dir))


def _forward_fill_from_events(ev: DataFrame) -> DataFrame:
    """Core of events_forward_fill_daily on an arbitrary events-shaped
    DataFrame (also driven by scale_check.py at 1x/4x/16x input)."""
    from pyspark.sql import Window

    ev = ev.filter(col("value").isNotNull())
    obs = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("user_id", "day")
        .agg(F.max_by("value", F.struct("ts", "event_id"))
             .alias("obs_value"))
    )
    w_user = Window.partitionBy("user_id").orderBy("day")
    filled = (
        obs.withColumn(
            "end_day",
            F.coalesce(F.date_sub(F.lead("day").over(w_user), 1),
                       col("day")),
        )
        .select(
            "day", "obs_value",
            F.explode(F.expr("sequence(day, end_day, interval 1 day)"))
            .alias("fill_day"),
        )
    )
    return (
        filled.groupBy("fill_day")
        .agg(
            F.sum(F.when(col("fill_day") == col("day"), 1).otherwise(0))
            .alias("n_observed"),
            F.sum(F.when(col("fill_day") != col("day"), 1).otherwise(0))
            .alias("n_carried"),
            F.round(F.sum("obs_value"), 2).alias("filled_total"),
        )
        .select(F.date_format("fill_day", "yyyy-MM-dd").alias("day"),
                "n_observed", "n_carried", "filled_total")
    )


@query(
    "agg_quantile_sketch_weekly",
    oracle="""
    WITH daily AS (
        SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               CAST(ts AS DATE) AS day,
               CAST(floor(value / 25.0) AS BIGINT) AS bin,
               count(*) AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
    weekly AS (SELECT week, bin, sum(n)::BIGINT AS n
               FROM daily GROUP BY 1, 2),
    c AS (SELECT week, bin, n,
                 sum(n) OVER (PARTITION BY week ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(n) OVER (PARTITION BY week) AS total
          FROM weekly)
    SELECT week, total::BIGINT AS n_values, bin AS median_bin,
           round(bin * 25.0 + (total * 0.5 - (cum - n)) * 25.0 / n, 4)
               AS p50_est
    FROM c WHERE cum >= total * 0.5 AND (cum - n) < total * 0.5
    """,
)
def agg_quantile_sketch_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketch rollup — the percentile complement of
    agg_sketch_rollup_weekly's HLL distinct rollup: per-day fixed-bin
    histogram sketches (bin width 25.0, deterministic boundaries) built
    once from raw data, then the WEEKLY median answered by MERGING the
    daily sketches — bin counts are associative, so the merge is a plain
    sum per (week, bin), 7 tiny merges instead of a week of raw rescans.
    The p50 estimate interpolates linearly inside the covering bin
    (identical float expression order in Spark and the oracle, one
    division each — bit-reproducible across engines). Sketch size is
    O(value_range / bin_width) per day regardless of data volume, so the
    post-shuffle state is metadata-sized at 100 TB; the per-week cumsum
    window runs over ≤ a few dozen bins. Same fixed-boundary contract as
    a t-digest/KLL rollup, chosen deterministic so the oracle can
    hash-match exactly."""
    return _quantile_sketch_from_events(load(spark, "events", sf_dir))


def _quantile_sketch_from_events(ev: DataFrame) -> DataFrame:
    """Core of agg_quantile_sketch_weekly on an arbitrary events-shaped
    DataFrame (also driven by scale_check.py at 1x/4x/16x input)."""
    from pyspark.sql import Window

    ev = ev.filter(col("value").isNotNull())
    width = F.lit(25.0)
    daily = (
        ev.groupBy(
            F.date_format(F.date_trunc("week", col("ts")), "yyyy-MM-dd")
            .alias("week"),
            F.to_date("ts").alias("day"),
            F.floor(col("value") / width).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    weekly = daily.groupBy("week", "bin").agg(F.sum("n").alias("n"))
    w_cum = Window.partitionBy("week").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0)
    c = (
        weekly.withColumn("cum", F.sum("n").over(w_cum))
        .withColumn("total", F.sum("n").over(Window.partitionBy("week")))
    )
    target = col("total") * F.lit(0.5)
    hit = c.filter((col("cum") >= target) & ((col("cum") - col("n")) < target))
    return hit.select(
        "week",
        col("total").alias("n_values"),
        col("bin").alias("median_bin"),
        F.round(
            col("bin") * width
            + (target - (col("cum") - col("n"))) * width / col("n"),
            4,
        ).alias("p50_est"),
    )


@query(
    "join_interval_overlap_sessions",
    oracle="""
    WITH x AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts)
                    >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        FROM events),
    s AS (SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM x),
    iv AS (SELECT user_id, min(ts) AS t0,
                  max(ts) + INTERVAL '30 minutes' AS t1
           FROM s GROUP BY user_id, sid),
    vip AS (SELECT * FROM iv WHERE user_id % 10 = 0),
    oth AS (SELECT * FROM iv WHERE user_id % 10 <> 0)
    SELECT v.user_id AS v_user,
           count(*) AS n_overlaps,
           count(DISTINCT o.user_id) AS n_other_users
    FROM vip v JOIN oth o ON v.t0 < o.t1 AND o.t0 < v.t1
    GROUP BY 1
    """,
)
def join_interval_overlap_sessions(spark: SparkSession, sf_dir: str
                                   ) -> DataFrame:
    """Interval × interval overlap join (whose sessions ran concurrently
    with each VIP user's sessions) via the binned overlap join: both
    interval sets explode over the 15-min buckets they cover, equi-join
    on the bucket, and each overlapping pair is kept exactly once at the
    bucket containing the overlap's start — a plain shuffled equi-join
    with bounded fan-out instead of the BroadcastNestedLoop a theta
    overlap predicate plans. The oracle states the naive theta join
    directly; results agree because the start-bucket trick is a pure
    dedup, not an approximation. Session intervals are the same half-open
    [first, last+gap) session_window spans events_session_windows pins."""
    from mqtt_streamr_spark.operators.joins import interval_overlap_join

    ev = load(spark, "events", sf_dir)
    s = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id",
                col("session_window.start").alias("t0"),
                col("session_window.end").alias("t1"))
    )
    vip = s.filter(col("user_id") % 10 == 0).select(
        col("user_id").alias("v_user"),
        col("t0").alias("v_lo"), col("t1").alias("v_hi"))
    oth = s.filter(col("user_id") % 10 != 0).select(
        col("user_id").alias("o_user"),
        col("t0").alias("o_lo"), col("t1").alias("o_hi"))
    j = interval_overlap_join(vip, oth, "v_lo", "v_hi", "o_lo", "o_hi",
                              bin_width_s=900)
    return j.groupBy("v_user").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.countDistinct("o_user").alias("n_other_users"),
    )


@query(
    "join_interval_overlap_counts",
    oracle="""
    WITH x AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts)
                    >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        FROM events),
    s AS (SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM x),
    iv AS (SELECT user_id, min(ts) AS t0,
                  max(ts) + INTERVAL '30 minutes' AS t1
           FROM s GROUP BY user_id, sid),
    vip AS (SELECT * FROM iv WHERE user_id % 10 = 0),
    oth AS (SELECT * FROM iv WHERE user_id % 10 <> 0)
    SELECT v.user_id AS v_user,
           strftime(v.t0, '%Y-%m-%d %H:%M:%S') AS session_start,
           count(o.user_id)::BIGINT AS n_overlaps
    FROM vip v LEFT JOIN oth o ON v.t0 < o.t1 AND o.t0 < v.t1
    GROUP BY v.user_id, v.t0
    """,
)
def join_interval_overlap_counts(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """Per-VIP-session overlap COUNTS via the order-statistics sweep
    (r11): n_overlaps(a) = #{o.lo < a.hi} − #{o.hi <= a.lo} — two rank
    queries against the binned+prefix-summed endpoint multisets, never
    a pair row (operators/joins.interval_overlap_counts). This is the
    shipped mitigation for the pair join's quadratic TRUE OUTPUT (the
    sweep's interval_overlap_sessions row, ~23x time at 16x input —
    Ω(true pairs) for any exact pair-materializing algorithm): when the
    question is the count, the plan shuffles O(n) rows of a few longs.
    The oracle states the naive theta left-join + group-by; results
    agree because the identity is exact, not an approximation. Keeps
    zero-overlap sessions (pair joins drop them), so it also subsumes
    the anti-join question for free."""
    from mqtt_streamr_spark.operators.joins import interval_overlap_counts

    ev = load(spark, "events", sf_dir)
    s = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id",
                col("session_window.start").alias("t0"),
                col("session_window.end").alias("t1"))
    )
    vip = s.filter(col("user_id") % 10 == 0).select(
        col("user_id").alias("v_user"),
        col("t0").alias("v_lo"), col("t1").alias("v_hi"))
    oth = s.filter(col("user_id") % 10 != 0).select(
        col("t0").alias("o_lo"), col("t1").alias("o_hi"))
    c = interval_overlap_counts(vip, oth, ["v_user", "v_lo"],
                                "v_lo", "v_hi", "o_lo", "o_hi",
                                bin_width_s=900)
    return c.select(
        "v_user",
        F.date_format("v_lo", "yyyy-MM-dd HH:mm:ss")
        .alias("session_start"),
        "n_overlaps",
    )


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                          count(*)::BIGINT AS n
                   FROM events GROUP BY 1, 2),
    st AS (SELECT event_type, avg(n) AS mu, stddev(n) AS sd,
                  count(*)::BIGINT AS n_days
           FROM daily GROUP BY 1),
    c AS (SELECT d.event_type, d.day, st.sd, st.n_days,
                 sum(d.n - st.mu) OVER (PARTITION BY d.event_type
                                        ORDER BY d.day
                                        ROWS UNBOUNDED PRECEDING) AS s
          FROM daily d JOIN st USING (event_type)),
    r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY abs(s) DESC, day) AS rn
          FROM c)
    SELECT event_type, strftime(day, '%Y-%m-%d') AS cp_day,
           round(abs(s) / (sd * sqrt(n_days)), 6) AS cusum_stat,
           n_days
    FROM r WHERE rn = 1
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the day where the
    cumulative deviation of daily volume from its mean peaks, with the
    standardized statistic |S|/(sd*sqrt(n)) — the classic level-shift
    detector behind data-quality volume monitors. The daily aggregate is
    the only data-sized shuffle; every window after it runs over the
    (type x day) table, metadata-sized at any scale, and the running
    cumsum is evaluated in the same day order in both engines so the
    float stream is bit-identical."""
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    st = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev("n").alias("sd"),
        F.count(F.lit(1)).alias("n_days"))
    w_cum = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0)
    c = daily.join(F.broadcast(st), "event_type").withColumn(
        "s", F.sum(col("n") - col("mu")).over(w_cum))
    w_pick = Window.partitionBy("event_type").orderBy(
        F.abs(col("s")).desc(), col("day").asc())
    return (
        c.withColumn("rn", F.row_number().over(w_pick))
        .filter(col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("cp_day"),
            F.round(F.abs(col("s")) / (col("sd") * F.sqrt("n_days")), 6)
            .alias("cusum_stat"),
            "n_days",
        )
    )


@query(
    "events_seasonal_anomaly",
    oracle="""
    WITH hourly AS (SELECT CAST(ts AS DATE) AS day,
                           extract(hour FROM ts)::BIGINT AS hr,
                           count(*)::BIGINT AS n
                    FROM events GROUP BY 1, 2),
    base AS (SELECT dayofweek(day) AS dow, hr,
                    avg(n) AS mu, stddev(n) AS sd
             FROM hourly GROUP BY 1, 2),
    z AS (SELECT h.day, h.hr, h.n,
                 round((h.n - b.mu) / b.sd, 4) AS zscore
          FROM hourly h JOIN base b
               ON dayofweek(h.day) = b.dow AND h.hr = b.hr
          WHERE b.sd > 0)
    SELECT strftime(day, '%Y-%m-%d') AS day, hr, n, zscore
    FROM z WHERE abs(zscore) >= 1.4
    """,
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection: each (day, hour) traffic count
    scored against the mean/std of the SAME weekday-hour cell across the
    dataset — the volume monitor that CUSUM complements (CUSUM finds the
    level shift; this finds hours that break their own weekly rhythm).
    The hourly rollup is the only data-sized shuffle; the 168-cell
    baseline broadcasts back onto it, so the plan is one aggregation +
    one broadcast join at any scale. z is rounded AFTER the same
    (n-mu)/sd expression order in both engines. Threshold 1.4: with only
    ~4-5 weekly samples per cell in this dataset the sample-z is bounded
    by (k-1)/sqrt(k) < 1.8, so the classic 2-sigma cut can never fire —
    at production history depth (> 10 weeks) raise it back."""
    ev = load(spark, "events", sf_dir)
    hourly = ev.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    base = hourly.groupBy(
        F.dayofweek("day").alias("dow"), "hr"
    ).agg(F.avg("n").alias("mu"), F.stddev("n").alias("sd"))
    z = (
        hourly.withColumn("dow", F.dayofweek("day"))
        .join(F.broadcast(base), ["dow", "hr"])
        .filter(col("sd") > 0)
        .withColumn("zscore", F.round((col("n") - col("mu")) / col("sd"), 4))
    )
    return (
        z.filter(F.abs(col("zscore")) >= 1.4)
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                col("hr").cast("long").alias("hr"), "n", "zscore")
    )


@query(
    "events_benford_first_digit",
    oracle="""
    WITH v AS (SELECT value FROM events WHERE value IS NOT NULL
                                          AND value > 0),
    d AS (SELECT CAST(floor(value / power(10, floor(log10(value))))
                      AS BIGINT) AS digit
          FROM v),
    c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
    t AS (SELECT sum(n)::DOUBLE AS total FROM c)
    SELECT digit, n,
           round(n / t.total, 6) AS obs_share,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
           round((n / t.total) / log10(1.0 + 1.0 / digit), 4)
               AS lift
    FROM c, t
    """,
)
def events_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit profile — the classic
    fabricated-data / instrumentation-bug screen: observed share of each
    leading digit vs the log10(1+1/d) expectation, with the lift ratio
    per digit (uniform synthetic values read far from Benford, which is
    exactly what the profile should say). One data-sized aggregation to
    9 digit rows; the expectation join is a constant expression, so the
    whole report costs a single shuffle at any scale."""
    ev = load(spark, "events", sf_dir).filter(
        col("value").isNotNull() & (col("value") > 0))
    d = ev.select(
        F.floor(col("value") / F.pow(F.lit(10.0),
                                     F.floor(F.log10("value"))))
        .cast("long").alias("digit"))
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").cast("double").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit", "n",
            F.round(col("n") / col("total"), 6).alias("obs_share"),
            F.round(F.log10(F.lit(1.0) + F.lit(1.0) / col("digit")), 6)
            .alias("benford_share"),
            F.round((col("n") / col("total"))
                    / F.log10(F.lit(1.0) + F.lit(1.0) / col("digit")), 4)
            .alias("lift"),
        )
    )


@query(
    "events_freshness_panel",
    oracle="""
    WITH g AS (SELECT max(ts) AS gmax FROM events)
    SELECT event_type,
           count(*) AS n,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
           (epoch(g.gmax) - epoch(max(ts)))::BIGINT // 60 AS lag_minutes,
           sum(CASE WHEN ts >= g.gmax - INTERVAL 1 DAY
                    THEN 1 ELSE 0 END)::BIGINT AS rows_last_day,
           round(avg(CASE WHEN value IS NULL THEN 1.0 ELSE 0.0 END), 6)
               AS null_value_rate
    FROM events, g GROUP BY event_type, g.gmax
    """,
)
def events_freshness_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness/completeness panel per stream (event type): last-seen
    timestamp, staleness lag vs the dataset high-water mark, last-day
    volume, and null rate — the temporal data-quality complement of
    dq_expectations' constraint checks (a stale feed passes every
    constraint while silently serving old data). The high-water mark is
    a 1-row broadcast aggregate (the audited scalar-cross pattern); the
    per-type aggregation is the only data-sized shuffle. Lag is integer
    epoch arithmetic — exact in both engines."""
    ev = load(spark, "events", sf_dir)
    g = ev.agg(F.max("ts").alias("gmax"))
    return (
        ev.crossJoin(F.broadcast(g))
        .groupBy("event_type", "gmax")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("last_seen"),
            ((F.unix_timestamp(F.max("gmax"))
              - F.unix_timestamp(F.max("ts"))) / 60).cast("long")
            .alias("lag_minutes"),
            F.sum(F.when(
                col("ts") >= col("gmax") - F.expr("INTERVAL 1 DAY"), 1)
                .otherwise(0)).alias("rows_last_day"),
            F.round(F.avg(F.when(col("value").isNull(), 1.0)
                          .otherwise(0.0)), 6).alias("null_value_rate"),
        )
        .drop("gmax")
        .select("event_type", "n", "last_seen", "lag_minutes",
                "rows_last_day", "null_value_rate")
    )


@query(
    "graph_pagerank_event_types",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events),
    e AS (
        SELECT event_type AS src, next_type AS dst, count(*)::DOUBLE AS w
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
    en AS (
        SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p FROM e),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    dang AS (
        SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM e)),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),
    d0 AS (SELECT coalesce(sum(rank), 0) AS dm FROM r0
           WHERE node IN (SELECT node FROM dang)),
    r1 AS (
        SELECT n.node,
               (1.0 - 0.85) / nn.n
               + 0.85 * (coalesce(c.c, 0) + d0.dm / nn.n) AS rank
        FROM nodes n
        LEFT JOIN (SELECT en.dst, sum(r0.rank * en.p) AS c
                   FROM en JOIN r0 ON r0.node = en.src
                   GROUP BY en.dst) c ON c.dst = n.node, nn, d0),
    d1 AS (SELECT coalesce(sum(rank), 0) AS dm FROM r1
           WHERE node IN (SELECT node FROM dang)),
    r2 AS (
        SELECT n.node,
               (1.0 - 0.85) / nn.n
               + 0.85 * (coalesce(c.c, 0) + d1.dm / nn.n) AS rank
        FROM nodes n
        LEFT JOIN (SELECT en.dst, sum(r1.rank * en.p) AS c
                   FROM en JOIN r1 ON r1.node = en.src
                   GROUP BY en.dst) c ON c.dst = n.node, nn, d1),
    d2 AS (SELECT coalesce(sum(rank), 0) AS dm FROM r2
           WHERE node IN (SELECT node FROM dang)),
    r3 AS (
        SELECT n.node,
               (1.0 - 0.85) / nn.n
               + 0.85 * (coalesce(c.c, 0) + d2.dm / nn.n) AS rank
        FROM nodes n
        LEFT JOIN (SELECT en.dst, sum(r2.rank * en.p) AS c
                   FROM en JOIN r2 ON r2.node = en.src
                   GROUP BY en.dst) c ON c.dst = n.node, nn, d2)
    SELECT node, round(rank, 6) AS rank FROM r3
    """,
)
def graph_pagerank_event_types(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """Weighted PageRank (3 power iterations, d = 0.85) over the
    per-user event-transition graph — the stationary-distribution
    estimate of the Markov matrix that ``events_transition_matrix``
    builds (r8; second canonical iterative-graph shape beside
    ``dedup_duplicate_clusters``'s connected components). The oracle
    unrolls the same three iterations — including the dangling-mass
    redistribution term — as SQL CTEs, so this is a rare case of a
    fully hash-checkable iterative algorithm. The generic distributed
    operator is ``operators.graph.pagerank``: edges normalized +
    checkpointed once, two key-partitioned shuffles per iteration,
    lineage truncated — the node/edge scale path; the demo graph here
    is type-cardinality-sized."""
    from mqtt_streamr_spark.operators.graph import pagerank
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        load(spark, "events", sf_dir)
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(col("next_type").isNotNull())
    )
    edges = seq.groupBy(
        col("event_type").alias("src"), col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).cast("double").alias("w"))
    ranks = pagerank(edges, weight="w", iterations=3, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@query(
    "events_watermark_lateness_audit",
    oracle="""
    WITH jit AS (
        SELECT event_type, user_id, event_id,
               ts - (event_id % 17) * 3600 * INTERVAL 1 SECOND AS ev_ts
        FROM events
    ), seq AS (
        SELECT event_type, ev_ts,
               max(ev_ts) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) - INTERVAL 1 HOUR AS cutoff
        FROM jit
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN ev_ts < cutoff THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late,
           round(sum(CASE WHEN ev_ts < cutoff
                          THEN date_part('epoch', cutoff)
                               - date_part('epoch', ev_ts)
                          ELSE 0 END), 2) AS late_sec_total
    FROM seq GROUP BY event_type
    """,
)
def events_watermark_lateness_audit(spark: SparkSession, sf_dir: str
                                    ) -> DataFrame:
    """Per-window lateness accounting (r9): BATCH-audits which events a
    60-second watermark would have dropped, and by how much — the
    capacity-planning companion to the streaming watermark queries
    (Structured Streaming drops rows older than max(event time) - delay;
    this computes that rule retrospectively so a delay can be SIZED
    before deploying it). Arrival order is event_id within each user:
    the running high-watermark is a per-user ROWS-frame max, so the
    whole audit is ONE hash shuffle on user_id and scales by user count
    — no global ordering, no driver collection. The first arrival per
    user has no watermark yet and is never late (NULL high_wm compares
    false), mirroring the engine; the delay under audit is 1 hour. The
    testdata's event time is in
    arrival order, so disorder is injected deterministically
    (ev_ts = ts - (event_id % 17) hours, sized from the corpus's
    ~7 h median per-user inter-event gap; restated in the oracle) —
    the same trick the streaming dedup fixtures use."""
    from pyspark.sql import Window

    ev = load(spark, "events", sf_dir)
    jit = ev.select(
        "event_type", "user_id", "event_id",
        # interval arithmetic, not unix_timestamp round-trips: the
        # corpus timestamps carry microseconds and the oracle's epoch
        # math keeps them
        (col("ts") - F.expr(
            "make_interval(0, 0, 0, 0, 0, 0, (event_id % 17) * 3600)"
        )).alias("ev_ts"),
    )
    w = (
        Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    delay = F.expr("INTERVAL 1 HOUR")
    seq = jit.select(
        "event_type", "ev_ts",
        (F.max("ev_ts").over(w) - delay).alias("cutoff"),
    )
    late = col("ev_ts") < col("cutoff")
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(late.cast("long")).alias("n_late"),
        F.round(
            F.sum(
                F.when(late,
                       col("cutoff").cast("double")
                       - col("ev_ts").cast("double"))
                .otherwise(0.0)
            ), 2,
        ).alias("late_sec_total"),
    )
