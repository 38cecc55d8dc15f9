"""Wire-level MQTT 3.1.1 mini-broker + minimal socket client (QoS 0/1).

The container ships neither an MQTT broker nor paho-mqtt, so the
real-socket leg of the source (SURVEY §2.1 "MQTT connect") previously ran
only against the file-loopback double. This module closes that gap with
a from-the-spec implementation of the MQTT 3.1.1 subset the reference
exercises (OASIS MQTT 3.1.1, §2-3: CONNECT/CONNACK, SUBSCRIBE/SUBACK,
QoS-0/QoS-1 PUBLISH with PUBACK, PINGREQ/PINGRESP, DISCONNECT):

- :class:`MiniBroker` — a threaded TCP broker routing publishes to
  subscribers by MQTT wildcard match (``+``/``#`` via
  ``mqtt_wildcard_to_regex``) at min(publish, granted) QoS. QoS-1 (r7):
  inbound qos1 publishes are PUBACKed after routing (the reference's
  "QoS 0/1" surface, bin:132), qos1 deliveries carry packet ids and
  un-acked counts are observable (``n_unacked``). A test double with
  REAL sockets — enough to soak the DataSource across the Spark
  python-worker process boundary — not a production broker (no QoS 2,
  retain, wills, auth, or persistent sessions; no retransmit, which
  3.1.1 mandates only on persistent-session reconnect).
- :class:`SocketMqttClient` — the matching minimal client with the same
  drain/reconnect/close surface as ``PahoClient`` (sources/mqtt.py), so
  the "mqtt" DataSource can speak to any broker at QoS 0/1 even without
  paho installed (paho remains preferred when importable: full protocol,
  keepalive management, backoff). ``publish(qos=1)`` blocks on PUBACK;
  qos1 deliveries are acked after buffering (at-least-once receive).

Everything here is the public wire format; payload bytes are decoded
UTF-8 (replace) to match the source schema's string payload column.
"""

from __future__ import annotations

import re
import socket
import struct
import threading
import time
from datetime import datetime, timezone

from mqtt_streamr_spark.operators.routing import mqtt_wildcard_to_regex

# packet types (spec §2.2.1)
CONNECT, CONNACK = 1, 2
PUBLISH = 3
PUBACK = 4
SUBSCRIBE, SUBACK = 8, 9
PINGREQ, PINGRESP = 12, 13
DISCONNECT = 14


def _encode_remaining(n: int) -> bytes:
    """Variable-length remaining-length encoding (spec §2.2.3)."""
    out = bytearray()
    while True:
        b = n % 128
        n //= 128
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("socket closed")
        buf += chunk
    return buf


def read_packet(sock: socket.socket) -> tuple[int, int, bytes]:
    """Read one MQTT control packet -> (type, flags, body)."""
    h = _read_exact(sock, 1)[0]
    n, shift = 0, 0
    for _ in range(4):
        b = _read_exact(sock, 1)[0]
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    else:
        raise ConnectionError("malformed remaining length")
    return h >> 4, h & 0x0F, _read_exact(sock, n) if n else b""


def write_packet(sock: socket.socket, ptype: int, flags: int,
                 body: bytes) -> None:
    sock.sendall(
        bytes([(ptype << 4) | flags]) + _encode_remaining(len(body)) + body
    )


def _mqtt_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


class MiniBroker:
    """Threaded MQTT 3.1.1 broker on an ephemeral port: QoS 0 and QoS 1
    (r7 — PUBACK to qos1 publishers, qos1 delivery with packet ids,
    per-subscriber un-acked tracking). r11 adds PERSISTENT sessions
    (spec §3.1.2.4) and the one wire behavior the soak previously could
    not reach: a client reconnecting with CleanSession=0 gets
    session-present=1 in CONNACK, its subscriptions back, and every
    un-PUBACKed QoS-1 delivery RETRANSMITTED with DUP=1 (spec §4.4 —
    retransmission is mandated exactly on persistent-session
    reconnect)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(16)
        self.host, self.port = self._srv.getsockname()
        # one entry per registered subscriber connection:
        # (patterns: list of (regex, granted_qos), conn, wlock,
        #  pending: dict pid -> (topic, payload) of un-acked qos1
        #  deliveries — payload retained for DUP retransmit)
        self._subs: list[tuple[list, socket.socket, threading.Lock,
                               dict]] = []
        # persistent sessions (CleanSession=0), by client id: patterns +
        # pending survive the connection; both objects are SHARED with
        # the live _subs entry while the client is connected
        self._sessions: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._pid = 0
        self._closing = False
        self.n_connects = 0
        self.n_redelivered = 0  # DUP retransmits sent on reconnect
        self.n_qos1_in = 0  # qos1 publishes PUBACKed to publishers
        self._accept_thread = threading.Thread(
            target=self._accept_loop, daemon=True
        )
        self._accept_thread.start()

    def n_unacked(self) -> int:
        """Outstanding qos1 deliveries awaiting subscriber PUBACKs —
        live connections plus detached persistent sessions (the pending
        dict is shared while connected, so dedup by object identity)."""
        with self._lock:
            seen: dict[int, dict] = {}
            for *_, p in self._subs:
                seen[id(p)] = p
            for sess in self._sessions.values():
                seen[id(sess["pending"])] = sess["pending"]
            return sum(len(p) for p in seen.values())

    @property
    def url(self) -> str:
        return f"mqtt://{self.host}:{self.port}"

    def _accept_loop(self) -> None:
        while not self._closing:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve, args=(conn,), daemon=True
            ).start()

    def _serve(self, conn: socket.socket) -> None:
        patterns: list[tuple[re.Pattern, int]] = []
        pending: dict[int, tuple[str, bytes]] = {}
        wlock = threading.Lock()
        registered = False
        persistent_cid: str | None = None
        try:
            ptype, _, cbody = read_packet(conn)
            if ptype != CONNECT:
                return
            # CONNECT body (spec §3.1): proto name, level, flags,
            # keepalive, client id — we need the CleanSession bit and
            # the id for persistent-session resume
            pn = struct.unpack(">H", cbody[:2])[0]
            i = 2 + pn + 1          # skip proto name + level
            cflags = cbody[i]
            i += 1 + 2              # flags + keepalive
            cl = struct.unpack(">H", cbody[i:i + 2])[0]
            cid = cbody[i + 2:i + 2 + cl].decode("utf-8")
            clean = bool(cflags & 0x02)
            session_present = False
            resumed = None
            with self._lock:
                self.n_connects += 1
                if clean:
                    self._sessions.pop(cid, None)
                elif cid:
                    persistent_cid = cid
                    resumed = self._sessions.get(cid)
                    if resumed is not None:
                        session_present = True
                        patterns = resumed["patterns"]
                        pending = resumed["pending"]
                    else:
                        self._sessions[cid] = {
                            "patterns": patterns, "pending": pending}
            write_packet(conn, CONNACK, 0,
                         bytes([1 if session_present else 0]) + b"\x00")
            if session_present:
                # resume: subscriptions re-attach without a SUBSCRIBE,
                # and every un-acked qos1 delivery retransmits with
                # DUP=1 under its ORIGINAL packet id (spec §4.4)
                if patterns:
                    with self._lock:
                        # drop any STALE entry still carrying this
                        # session's pending dict (the dead socket's
                        # serve loop may not have noticed the close
                        # yet) — otherwise _route double-targets the
                        # session and queues a pid nobody will ack
                        self._subs = [s for s in self._subs
                                      if s[3] is not pending]
                        self._subs.append((patterns, conn, wlock, pending))
                    registered = True
                with self._lock:
                    redeliver = list(pending.items())
                for pid, (topic, payload) in redeliver:
                    with wlock:
                        write_packet(
                            conn, PUBLISH, 0x02 | 0x08,
                            _mqtt_str(topic) + struct.pack(">H", pid)
                            + payload)
                    with self._lock:
                        self.n_redelivered += 1
            while True:
                ptype, flags, body = read_packet(conn)
                if ptype == SUBSCRIBE:
                    pid = body[:2]
                    i, codes = 2, b""
                    while i < len(body):
                        ln = struct.unpack(">H", body[i:i + 2])[0]
                        topic = body[i + 2:i + 2 + ln].decode("utf-8")
                        req_qos = body[i + 2 + ln]
                        i += 2 + ln + 1
                        granted = min(req_qos, 1)  # QoS 2 downgraded
                        patterns.append(
                            (re.compile(mqtt_wildcard_to_regex(topic)),
                             granted)
                        )
                        codes += bytes([granted])
                    # SUBACK under wlock BEFORE registering: _route writes
                    # under the same lock, so no PUBLISH can interleave
                    # ahead of the SUBACK the client is waiting for; and
                    # register the connection ONCE — later SUBSCRIBEs only
                    # extend the shared pattern list (double registration
                    # would deliver every match once per entry)
                    with wlock:
                        write_packet(conn, SUBACK, 0, pid + codes)
                    if not registered:
                        with self._lock:
                            self._subs.append(
                                (patterns, conn, wlock, pending))
                        registered = True
                elif ptype == PUBLISH:
                    qos = (flags >> 1) & 0x03
                    ln = struct.unpack(">H", body[:2])[0]
                    topic = body[2:2 + ln].decode("utf-8")
                    i = 2 + ln
                    if qos:
                        pub_pid = body[i:i + 2]
                        i += 2
                    self._route(topic, body[i:], qos)
                    if qos:  # at-least-once inbound: ack AFTER routing
                        with wlock:
                            write_packet(conn, PUBACK, 0, pub_pid)
                        with self._lock:
                            self.n_qos1_in += 1
                elif ptype == PUBACK:
                    (ack_pid,) = struct.unpack(">H", body[:2])
                    with self._lock:
                        pending.pop(ack_pid, None)
                elif ptype == PINGREQ:
                    write_packet(conn, PINGRESP, 0, b"")
                elif ptype == DISCONNECT:
                    return
        except (ConnectionError, OSError):
            return
        finally:
            with self._lock:
                self._subs = [s for s in self._subs if s[1] is not conn]
            try:
                conn.close()
            except OSError:
                pass

    def _route(self, topic: str, payload: bytes, pub_qos: int = 0) -> None:
        with self._lock:
            targets = list(self._subs)
        for patterns, sock, wlock, pending in targets:
            granted = max(
                (q for p, q in patterns if p.match(topic)), default=None
            )
            if granted is None:
                continue
            qos = min(pub_qos, granted)  # effective delivery QoS
            try:
                if qos == 0:
                    with wlock:
                        write_packet(sock, PUBLISH, 0,
                                     _mqtt_str(topic) + payload)
                else:
                    with self._lock:
                        self._pid = self._pid % 65535 + 1
                        pid = self._pid
                        pending[pid] = (topic, payload)
                    with wlock:
                        write_packet(
                            sock, PUBLISH, 0x02,
                            _mqtt_str(topic) + struct.pack(">H", pid)
                            + payload,
                        )
            except OSError:
                pass  # subscriber died; its serve loop cleans up
        # OFFLINE queueing for detached persistent sessions (spec
        # §3.1.2.4: the server stores QoS-1 messages matching a
        # disconnected session's subscriptions): assign a pid into the
        # session's pending dict — the reconnect retransmit path
        # delivers it. QoS-0 messages for detached sessions are
        # discarded (the server MAY store them; this double doesn't).
        with self._lock:
            connected = {id(p) for *_, p in self._subs}
            detached = [s for s in self._sessions.values()
                        if id(s["pending"]) not in connected]
        for sess in detached:
            granted = max(
                (q for p, q in sess["patterns"] if p.match(topic)),
                default=None,
            )
            if granted is None or min(pub_qos, granted) != 1:
                continue
            with self._lock:
                self._pid = self._pid % 65535 + 1
                sess["pending"][self._pid] = (topic, payload)

    def close(self) -> None:
        self._closing = True
        try:
            self._srv.close()
        except OSError:
            pass


class SocketMqttClient:
    """Minimal MQTT 3.1.1 client (QoS 0 + QoS 1, r7) with the PahoClient
    surface (drain/reconnect/close) plus publish() for test producers.
    ``qos=1`` subscribes at QoS 1 and PUBACKs every qos1 delivery;
    ``publish(..., qos=1)`` blocks until the broker's PUBACK
    (at-least-once publish)."""

    def __init__(self, url: str, topics: list[str], qos: int = 0,
                 client_id: str | None = None,
                 clean_session: bool = True):
        host, _, port = url.replace("mqtt://", "").partition(":")
        self._addr = (host, int(port or 1883))
        self._topics = topics
        self._qos = min(int(qos), 1)
        self._clean = bool(clean_session)
        self._client_id = client_id or f"mss-{time.time_ns() % 10**9}"
        self._lock = threading.Lock()
        self._buffer: list[tuple[str, str, datetime]] = []
        self._closing = False
        self._sock: socket.socket | None = None
        self._wlock = threading.Lock()
        self._pid = 0
        self._acks: dict[int, threading.Event] = {}
        self._connect()

    def _connect(self) -> None:
        s = socket.create_connection(self._addr, timeout=10)
        # CONNECT: proto "MQTT" level 4, keepalive 60; CleanSession per
        # construction (clean_session=False + stable client_id = the
        # persistent-session resume path, spec §3.1.2.4)
        flags = b"\x02" if self._clean else b"\x00"
        body = (_mqtt_str("MQTT") + b"\x04" + flags +
                struct.pack(">H", 60) + _mqtt_str(self._client_id))
        write_packet(s, CONNECT, 0, body)
        ptype, _, ack = read_packet(s)
        if ptype != CONNACK or ack[1] != 0:
            raise ConnectionError(f"CONNACK refused: {ack!r}")
        self.session_present = bool(ack[0] & 0x01)
        if self._topics and not self.session_present:
            sub = struct.pack(">H", 1)
            for t in self._topics:
                sub += _mqtt_str(t) + bytes([self._qos])
            write_packet(s, SUBSCRIBE, 0x02, sub)
            # a broker with this client already subscribed elsewhere may
            # interleave PUBLISH deliveries ahead of the SUBACK — buffer
            # them rather than failing the connect
            for _ in range(64):
                ptype, flags, body = read_packet(s)
                if ptype == SUBACK:
                    break
                if ptype == PUBLISH:
                    self._buffer_publish(flags, body, s)
            else:
                raise ConnectionError("no SUBACK")
        # the 10s create_connection timeout must govern the HANDSHAKE
        # only: left on, a quiet topic kills the reader thread with a
        # silent TimeoutError after 10 idle seconds (r7 fix — found by
        # the publish-back test, where Spark startup ate the window)
        s.settimeout(None)
        self._sock = s
        threading.Thread(target=self._reader, args=(s,),
                         daemon=True).start()

    def _buffer_publish(self, flags: int, body: bytes,
                        sock: socket.socket) -> None:
        qos = (flags >> 1) & 0x03
        ln = struct.unpack(">H", body[:2])[0]
        topic = body[2:2 + ln].decode("utf-8")
        i = 2 + ln
        pid = None
        if qos:
            (pid,) = struct.unpack(">H", body[i:i + 2])
            i += 2
        payload = body[i:].decode("utf-8", "replace")
        with self._lock:
            self._buffer.append(
                (topic, payload, datetime.now(timezone.utc))
            )
        if pid is not None:  # ack AFTER buffering: at-least-once receive
            with self._wlock:
                write_packet(sock, PUBACK, 0, struct.pack(">H", pid))

    def _reader(self, s: socket.socket) -> None:
        try:
            while not self._closing:
                ptype, flags, body = read_packet(s)
                if ptype == PUBLISH:
                    self._buffer_publish(flags, body, s)
                elif ptype == PUBACK:
                    (pid,) = struct.unpack(">H", body[:2])
                    with self._lock:
                        ev = self._acks.pop(pid, None)
                    if ev is not None:
                        ev.set()
        except (ConnectionError, OSError):
            return

    def publish(self, topic: str, payload: str, qos: int = 0,
                ack_timeout: float = 10.0) -> None:
        assert self._sock is not None
        if min(qos, 1) == 0:
            with self._wlock:
                write_packet(
                    self._sock, PUBLISH, 0,
                    _mqtt_str(topic) + payload.encode("utf-8"),
                )
            return
        with self._lock:
            self._pid = self._pid % 65535 + 1
            pid = self._pid
            ev = threading.Event()
            self._acks[pid] = ev
        with self._wlock:
            write_packet(
                self._sock, PUBLISH, 0x02,
                _mqtt_str(topic) + struct.pack(">H", pid)
                + payload.encode("utf-8"),
            )
        if not ev.wait(ack_timeout):
            with self._lock:
                self._acks.pop(pid, None)
            raise ConnectionError(
                f"no PUBACK for qos1 publish pid={pid} within "
                f"{ack_timeout}s")

    def reconnect(self) -> None:  # watchdog hook (bin:92-95 parity)
        try:
            if self._sock is not None:
                self._sock.close()
        except OSError:
            pass
        self._connect()

    def drain(self) -> list[tuple[str, str, datetime]]:
        with self._lock:
            out, self._buffer = self._buffer, []
        return out

    def close(self) -> None:
        self._closing = True
        try:
            if self._sock is not None:
                write_packet(self._sock, DISCONNECT, 0, b"")
                self._sock.close()
        except OSError:
            pass
