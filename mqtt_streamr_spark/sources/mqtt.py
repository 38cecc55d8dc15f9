"""MQTT streaming source — Spark 4 Python Data Source API.

The reference's source is an mqtt.js client: connect (bin/mqtt-streamr.js:
120-126), subscribe to N topics with broker-side wildcard matching
(bin:130-138), QoS 0 = at-most-once (bin:132), plus a data-timeout watchdog
that force-reconnects when no message arrives (src/DataTimeoutUtil.js:1-17,
bin:86-97).

Engine mapping: a ``SimpleDataSourceStreamReader`` that buffers messages
from an MQTT client on the driver and hands each micro-batch to Spark.
Offsets count delivered messages; MQTT has no replay, so delivery is
at-most-once from the broker's perspective (exactly the reference's QoS 0
contract) while Spark's checkpoint makes everything *after* the buffer
at-least-once. Usage:

    register_mqtt_source(spark)
    df = (spark.readStream.format("mqtt")
          .option("url", "mqtt://broker:1883")
          .option("topics", "sensors/#,home/+/lamp")
          .load())

Three client backends:
- paho-mqtt (real broker, full protocol) — preferred for ``mqtt://``
  URLs when importable;
- the built-in minimal QoS-0 socket client (sources/minibroker.py) —
  automatic fallback for ``mqtt://`` URLs when paho is absent, so the
  source still speaks live MQTT 3.1.1 over TCP (soak-tested against the
  in-repo MiniBroker in tests/test_mqtt_source.py);
- the in-process loopback broker (``broker://<name>``) — the deterministic
  test double for the full DataSource plumbing (subscribe wildcards,
  buffering, offsets, watchdog).
"""

from __future__ import annotations

import json
import os
import re
import tempfile
import threading
import time
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from mqtt_streamr_spark.operators.routing import mqtt_wildcard_to_regex

SCHEMA_DDL = "topic string, payload string, arrival_ts timestamp"


# --- file-backed loopback broker (test double) -------------------------------
#
# Spark plans Python streaming sources in a dedicated worker process, so an
# in-memory registry in the test process would be invisible to the reader.
# The filesystem is the cross-process transport: publish = atomic file write,
# subscribe = pattern-filtered directory scan with a seen-set. Messages are
# retained until purge() — deliver-all-unseen avoids connect/publish races in
# tests (a deliberate determinism upgrade over live-broker semantics).

class LoopbackBroker:
    """Minimal cross-process pub/sub broker honoring MQTT wildcards —
    deterministic stand-in for a real broker in tests."""

    def __init__(self, name: str) -> None:
        self._dir = os.path.join(
            tempfile.gettempdir(), "mqtt_streamr_loopback", name
        )
        os.makedirs(self._dir, exist_ok=True)
        self._seq = 0
        self._lock = threading.Lock()

    @classmethod
    def get(cls, name: str) -> "LoopbackBroker":
        return cls(name)

    @property
    def spool_dir(self) -> str:
        return self._dir

    def publish(self, topic: str, payload: str) -> None:
        with self._lock:
            seq = self._seq
            self._seq += 1
        fname = f"{time.time_ns():020d}-{os.getpid()}-{seq:06d}.json"
        tmp = os.path.join(self._dir, "." + fname)
        with open(tmp, "w") as f:
            json.dump({"topic": topic, "payload": payload}, f)
        os.rename(tmp, os.path.join(self._dir, fname))

    def purge(self) -> None:
        """Remove all retained messages (test isolation across runs)."""
        for fname in os.listdir(self._dir):
            try:
                os.remove(os.path.join(self._dir, fname))
            except OSError:
                pass


class LoopbackClient:
    def __init__(self, broker: LoopbackBroker, topics: list[str]):
        self._dir = broker.spool_dir
        self._patterns = [
            re.compile(mqtt_wildcard_to_regex(t)) for t in topics
        ]
        self._seen: set[str] = set()
        self.connects = 0
        self.connect()

    def connect(self) -> None:
        self.connects += 1

    def reconnect(self) -> None:  # watchdog hook (bin:92-95 parity)
        self.connect()

    def drain(self) -> list[tuple[str, str, datetime]]:
        out: list[tuple[str, str, datetime]] = []
        try:
            names = sorted(os.listdir(self._dir))
        except FileNotFoundError:
            return out
        for fname in names:
            if fname.startswith(".") or fname in self._seen:
                continue
            self._seen.add(fname)
            try:
                with open(os.path.join(self._dir, fname)) as f:
                    msg = json.load(f)
            except (OSError, ValueError):
                continue
            if any(p.match(msg["topic"]) for p in self._patterns):
                out.append(
                    (msg["topic"], msg["payload"],
                     datetime.now(timezone.utc))
                )
        return out

    def close(self) -> None:
        pass


class PahoClient:  # pragma: no cover - needs a real broker + paho
    def __init__(self, url: str, topics: list[str], qos: int = 0):
        try:
            import paho.mqtt.client as mqtt
        except ImportError as exc:
            raise ImportError(
                "paho-mqtt is not installed in this environment; use the "
                "loopback broker (url='broker://<name>') for testing"
            ) from exc
        self._lock = threading.Lock()
        self._buffer: list[tuple[str, str, datetime]] = []
        self._topics = topics
        self._qos = qos
        try:  # paho-mqtt >= 2.0 requires an explicit callback API version
            self._client = mqtt.Client(mqtt.CallbackAPIVersion.VERSION1)
        except AttributeError:  # paho-mqtt 1.x
            self._client = mqtt.Client()
        self._client.on_message = self._on_message
        host, _, port = url.replace("mqtt://", "").partition(":")
        self._client.connect(host, int(port or 1883))
        for t in topics:
            self._client.subscribe(t, qos=qos)
        self._client.loop_start()

    def _on_message(self, client, userdata, msg) -> None:
        with self._lock:
            self._buffer.append(
                (msg.topic, msg.payload.decode("utf-8", "replace"),
                 datetime.now(timezone.utc))
            )

    def reconnect(self) -> None:
        self._client.reconnect()

    def drain(self) -> list[tuple[str, str, datetime]]:
        with self._lock:
            out, self._buffer = self._buffer, []
        return out

    def close(self) -> None:
        self._client.loop_stop()
        self._client.disconnect()


# --- the data source ---------------------------------------------------------

class MqttStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.url = options.get("url", "broker://default")
        topics = options.get("topics", "#")
        self.topics = [t.strip() for t in topics.split(",") if t.strip()]
        self.qos = int(options.get("qos", "0"))
        self.data_timeout = float(options.get("data_timeout", "0"))
        self._client = None
        self._watchdog = None
        self._n = 0

    def _ensure_client(self):
        if self._client is None:
            if self.url.startswith("broker://"):
                broker = LoopbackBroker.get(self.url[len("broker://"):])
                self._client = LoopbackClient(broker, self.topics)
            else:
                # real TCP broker: paho when importable (full protocol);
                # otherwise the built-in minimal QoS-0 socket client — a
                # live MQTT 3.1.1 connection either way
                try:
                    self._client = PahoClient(
                        self.url, self.topics, self.qos
                    )
                except ImportError:
                    from mqtt_streamr_spark.sources.minibroker import (
                        SocketMqttClient,
                    )

                    self._client = SocketMqttClient(
                        self.url, self.topics, self.qos
                    )
            if self.data_timeout > 0:
                from mqtt_streamr_spark.streaming.stats import (
                    DataTimeoutWatchdog,
                )

                self._watchdog = DataTimeoutWatchdog(
                    self.data_timeout, self._client.reconnect
                )
                self._watchdog.reset()
        return self._client

    def initialOffset(self) -> dict:
        return {"n": 0}

    def read(self, start: dict):
        client = self._ensure_client()
        msgs = client.drain()
        if msgs and self._watchdog is not None:
            self._watchdog.reset()  # liveness (bin:145-147 parity)
        end = {"n": start["n"] + len(msgs)}
        return iter(msgs), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # Replay path: planned-but-uncommitted batches after a restart, and
        # empty planned batches (start == end, no prefetch cache entry).
        # MQTT has no replay, so a replayed range yields nothing — exactly
        # the reference's QoS-0 at-most-once contract (bin:132).
        return iter([])

    def commit(self, end: dict) -> None:
        pass


class MqttDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mqtt"

    def schema(self) -> str:
        return SCHEMA_DDL

    def simpleStreamReader(self, schema: StructType):
        return MqttStreamReader(self.options)


# --- executor-parallel spool reader ------------------------------------------
#
# The "mqtt" source above buffers on the driver (SimpleDataSourceStreamReader
# prefetch) — correct, but single-threaded ingest, and MQTT itself has no
# replay. When the transport is DURABLE (the loopback spool here; in
# production a persistent bridge — e.g. broker-to-object-store or a
# Kafka-backed MQTT topic), a full DataSourceStreamReader can do better:
# offsets are spool positions, planInputPartitions splits the file range
# across executors, and a planned-but-uncommitted batch replays EXACTLY,
# upgrading delivery to genuine at-least-once.

class SpoolPartition(InputPartition):
    def __init__(self, files: list[str]):
        self.files = files


class MqttSpoolStreamReader(DataSourceStreamReader):
    """Partitioned streaming reader over a spool directory. Offsets are the
    lexicographically-sorted spool filenames (zero-padded time_ns prefixes,
    so name order = publish order); a batch is the half-open filename range
    (start, end]."""

    def __init__(self, options: dict):
        url = options.get("url", "broker://default")
        if not url.startswith("broker://"):
            raise ValueError("mqtt_spool requires a broker:// (spool) url")
        self._dir = LoopbackBroker.get(url[len("broker://"):]).spool_dir
        topics = options.get("topics", "#")
        self._patterns = [
            mqtt_wildcard_to_regex(t.strip())
            for t in topics.split(",") if t.strip()
        ]
        self._n_parts = int(options.get("numPartitions", "4"))

    def _list(self) -> list[str]:
        try:
            return sorted(
                f for f in os.listdir(self._dir) if not f.startswith(".")
            )
        except FileNotFoundError:
            return []

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        # Publish protocol: write dot-prefixed temp file, then atomic
        # rename. A publisher that picked name T1 but has not renamed yet
        # while a later T2 is already visible would be skipped forever if
        # the offset advanced past T1 — so cap the offset below the
        # earliest in-flight temp file. (Residual window: between time_ns()
        # and the temp file's open(); nanosecond-scale.)
        try:
            names = os.listdir(self._dir)
        except FileNotFoundError:
            return {"last": ""}
        pending = sorted(n[1:] for n in names if n.startswith("."))
        files = sorted(n for n in names if not n.startswith("."))
        if pending:
            files = [f for f in files if f < pending[0]]
        return {"last": files[-1] if files else ""}

    def partitions(self, start: dict, end: dict):
        names = [f for f in self._list()
                 if start["last"] < f <= end["last"]]
        if not names:
            return [SpoolPartition([])]
        slices = [names[i::self._n_parts] for i in range(self._n_parts)]
        return [SpoolPartition(s) for s in slices if s]

    def read(self, partition: SpoolPartition):
        # runs on EXECUTORS — self was pickled there; patterns are strings
        rx = [re.compile(p) for p in self._patterns]
        for fname in partition.files:
            try:
                with open(os.path.join(self._dir, fname)) as f:
                    msg = json.load(f)
            except (OSError, ValueError):
                continue
            if any(p.match(msg["topic"]) for p in rx):
                yield (msg["topic"], msg["payload"],
                       datetime.now(timezone.utc))

    def commit(self, end: dict) -> None:
        pass  # spool retention is the broker's concern (cf. Kafka)


class MqttSpoolDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "mqtt_spool"

    def schema(self) -> str:
        return SCHEMA_DDL

    def streamReader(self, schema: StructType):
        return MqttSpoolStreamReader(self.options)


def register_mqtt_source(spark: SparkSession) -> None:
    spark.dataSource.register(MqttDataSource)
    spark.dataSource.register(MqttSpoolDataSource)


def wait_for_rows(query, predicate, timeout: float = 30.0,
                  poll: float = 0.2) -> bool:
    """Test helper: process available data until ``predicate()`` or timeout."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        query.processAllAvailable()
        if predicate():
            return True
        time.sleep(poll)
    return False
