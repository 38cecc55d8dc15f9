"""CLI entry point — drop-in analog of the reference's yargs interface
(/root/reference/bin/mqtt-streamr.js:12-68):

    python -m mqtt_streamr_spark \\
        --mqtt-url mqtt://broker:1883 --topic 'sensors/#' --topic 'home/+' \\
        --stream-id-template '/mydomain/$topic' --topic-levels 2 \\
        --transform '{"v": value * 2}' --log-interval 60 --sink-dir /data/out

Reference options map 1:1 (--mqtt-url --topic --verbose --public
--stream-id-template --stream-id --topic-levels --transform --log-interval
--reconnect-on-data-timeout --dry-run). --private-key is accepted for CLI
compatibility but only selects the identity string — there is no Streamr
network here; the sink is a partitioned table write. Engine extensions:
--sink-dir/--sink-format (the publish target), --schema (typed fast path),
--checkpoint-dir, --dead-letter-dir, --qos, --replay-parquet (batch replay
of a recorded events table instead of a live broker), --run-for (stop the
stream after N seconds; 0 = run until interrupted).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mqtt_streamr_spark",
        description="Bridge MQTT topics into partitioned streams on Spark.",
    )
    # reference parity (bin/mqtt-streamr.js:12-68)
    p.add_argument("--mqtt-url", help="MQTT server URL (mqtt://host:port or "
                   "broker://<name> for the in-process loopback broker)")
    p.add_argument("--topic", action="append", default=[],
                   help="topic to subscribe to; repeat for several; "
                   "MQTT wildcards supported")
    p.add_argument("--private-key", default=None,
                   help="accepted for reference-CLI compatibility (identity "
                   "string only; no network auth here)")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--public", action="store_true",
                   help="mark created streams publicly readable")
    p.add_argument("--stream-id-template", default="/$topic")
    p.add_argument("--stream-id", default=None,
                   help="fixed stream id; disables auto-create")
    p.add_argument("--topic-levels", type=int, default=None)
    p.add_argument("--transform", default=None, help="JSONata expression")
    p.add_argument("--log-interval", type=float, default=60.0)
    p.add_argument("--reconnect-on-data-timeout", type=float, default=900.0)
    p.add_argument("--dry-run", action="store_true")
    # engine extensions
    p.add_argument("--sink-dir", default=None,
                   help="partitioned sink table path (required unless "
                   "--dry-run)")
    p.add_argument("--sink-format", default="parquet")
    p.add_argument("--dead-letter-dir", default=None)
    p.add_argument("--schema", default=None,
                   help="declared message schema (DDL) -> typed fast "
                        "path; 'infer' samples the first batch")
    p.add_argument("--transform-mode", default="auto",
                   choices=["auto", "compiled", "interpreted"])
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--qos", type=int, default=0)
    p.add_argument("--replay-parquet", default=None,
                   help="replay a recorded events parquet in batch mode "
                   "instead of connecting to a broker")
    p.add_argument("--run-for", type=float, default=0.0,
                   help="stop the stream after N seconds (0 = forever)")
    return p


def main(argv: list[str] | None = None) -> int:
    from mqtt_streamr_spark.session import get_spark
    from mqtt_streamr_spark.sources.mqtt import register_mqtt_source
    from mqtt_streamr_spark.streaming.pipeline import (
        PipelineSpec,
        StreamingBridge,
        replay_source,
    )

    args = build_parser().parse_args(argv)
    if args.replay_parquet is None and not args.mqtt_url:
        print("error: --mqtt-url is required (or use --replay-parquet)",
              file=sys.stderr)
        return 2
    if args.replay_parquet is None and not args.topic:
        print("error: at least one --topic is required", file=sys.stderr)
        return 2

    spec = PipelineSpec(
        topics=args.topic,
        transform=args.transform,
        transform_mode=args.transform_mode,
        message_schema=args.schema,
        stream_id=args.stream_id,
        stream_id_template=args.stream_id_template,
        topic_levels=args.topic_levels,
        dry_run=args.dry_run,
        verbose=args.verbose,
        log_interval=args.log_interval,
        public=args.public,
        dead_letter_dir=args.dead_letter_dir,
        sink_format=args.sink_format,
        sink_dir=args.sink_dir,
    )
    try:
        spec.validate()
    except ValueError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    spark = get_spark(app_name="mqtt-streamr-spark")
    bridge = StreamingBridge(spec)
    bridge.logger.start()
    try:
        if args.replay_parquet is not None:
            bridge.run_batch(
                replay_source(spark, args.replay_parquet, streaming=False)
            )
            return 0
        register_mqtt_source(spark)
        src = (
            spark.readStream.format("mqtt")
            .option("url", args.mqtt_url)
            .option("topics", ",".join(args.topic))
            .option("qos", str(args.qos))
            .option("data_timeout", str(args.reconnect_on_data_timeout))
            .load()
        )
        import tempfile

        ckpt = args.checkpoint_dir or tempfile.mkdtemp(prefix="msr_ckpt_")
        q = bridge.start(src, checkpoint_dir=ckpt,
                         trigger_available_now=False)
        if args.run_for > 0:
            q.awaitTermination(timeout=args.run_for)
            q.stop()
        else:
            q.awaitTermination()
        return 0
    finally:
        bridge.logger.stop()


if __name__ == "__main__":
    raise SystemExit(main())
