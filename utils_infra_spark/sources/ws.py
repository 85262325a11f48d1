"""Real WebSocket stream ingestion (S1/S2; SURVEY.md §2.1).

The reference ingests live feeds over WebSocket (ais-proxy/server.js:
256-345): connect, send a JSON subscription message on open, receive
JSON text frames, keep the link alive with ping/pong, and reconnect
with exponential backoff (1 s base, x2 growth, 60 s cap, 10 attempts,
giving up without retry on close codes 1000/1008). Earlier rounds
modeled this as a file-source analog; this module is the real thing,
in-sandbox, with zero dependencies beyond the stdlib:

- :class:`WebSocketClient` — an RFC 6455 client over a plain TCP
  socket: HTTP/1.1 Upgrade handshake with ``Sec-WebSocket-Accept``
  verification, masked client frames, fragmented-message reassembly,
  automatic pong replies, and a proper close handshake. Every public
  constant here (the handshake GUID, opcode numbers, length escapes)
  is from RFC 6455 itself.
- :class:`WebSocketDataSource` — a PySpark 4 Python streaming data
  source (``spark.dataSource.register`` + ``readStream.format(
  "websocket_feed")``) built on ``SimpleDataSourceStreamReader``. A
  background pump thread owns the connection and the reference's
  reconnect policy; each micro-batch drains the buffered messages as
  ``(seq, recv_ts, value)`` rows. Downstream, the existing S3
  normalizer (:mod:`..sources.normalize`) parses the wire shapes and
  the T1-T3 keyed upsert maintains the entity cache — the WS source
  only moves bytes.

Scale/semantics contract:

- **One connection, driver-side, by design.** The reference holds ONE
  upstream subscription per feed; a ``SimpleDataSourceStreamReader``
  reads on the driver, which matches that shape exactly (a push feed
  cannot be re-read by an arbitrary executor). Fan-in of many feeds at
  100 TB/day is horizontal: one ``readStream`` per subscription (the
  pump is cheap), or a full ``DataSourceStreamReader`` with one
  partition per connection; the normalize/upsert stages downstream
  are already distributed and shuffle only canonical records.
- **Offsets are a monotone per-message sequence.** ``read`` drains the
  buffer and advances ``{"seq": n}``; delivered-but-uncommitted rows
  are retained in an in-memory replay window served by
  ``readBetweenOffsets`` and pruned on ``commit``. The window is
  process-local: a driver restart replays nothing (at-most-once across
  restarts) — the same trade the reference makes, whose vessel cache
  file snapshot is also the only restart state. Production hardening
  would WAL the window to the checkpoint dir. Within the RESTARTED
  run, delivery is still exactly-once: the reader rebases the new
  pump's 0-based sequence onto the checkpointed start offset at first
  read, so live rows never hide under a non-advancing offset and the
  replay window stays valid for same-process batch retries.
- **Load shedding, not unbounded memory.** The pending buffer is
  bounded (``maxBuffer``); overflow drops the OLDEST pending rows and
  counts them (the reference's bounded vessel cache makes the same
  choice). Sequence numbers are assigned at arrival, so shed rows
  leave gaps rather than corrupting offsets.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import struct
import threading
import time
from collections import deque
from datetime import datetime, timezone

# RFC 6455 §1.3 handshake GUID and §5.2 opcodes (public constants).
WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
OP_CONT, OP_TEXT, OP_BINARY, OP_CLOSE, OP_PING, OP_PONG = 0x0, 0x1, 0x2, 0x8, 0x9, 0xA

# Reference reconnect policy (ais-proxy/server.js:351-363, 337-341).
BASE_RECONNECT_DELAY_S = 1.0
MAX_RECONNECT_DELAY_S = 60.0
MAX_RECONNECT_ATTEMPTS = 10
NO_RECONNECT_CLOSE_CODES = frozenset({1000, 1008})


def accept_key(client_key: str) -> str:
    """``Sec-WebSocket-Accept`` for a client key (RFC 6455 §4.2.2):
    base64(sha1(key + GUID)). Shared by the client's handshake check
    and the test server's handshake response."""
    digest = hashlib.sha1((client_key + WS_GUID).encode("ascii")).digest()
    return base64.b64encode(digest).decode("ascii")


def encode_frame(opcode: int, payload: bytes, *, mask: bool, fin: bool = True) -> bytes:
    """One WebSocket frame (RFC 6455 §5.2). Clients MUST mask; servers
    MUST NOT — the caller picks via ``mask``."""
    head = bytearray([(0x80 if fin else 0) | opcode])
    mask_bit = 0x80 if mask else 0
    n = len(payload)
    if n < 126:
        head.append(mask_bit | n)
    elif n < 1 << 16:
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        head += key
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return bytes(head) + payload


class CloseReceived(Exception):
    """Peer sent a close frame; ``code`` drives the reconnect policy."""

    def __init__(self, code: int, reason: str = ""):
        super().__init__(f"close {code} {reason}".strip())
        self.code = code
        self.reason = reason


class WebSocketClient:
    """Minimal RFC 6455 client over a stdlib TCP socket.

    ``recv_message()`` returns one complete text/binary payload
    (reassembling continuation frames), transparently answers pings
    with pongs, returns ``None`` on a poll timeout (so callers can
    check a stop flag), and raises :class:`CloseReceived` after
    echoing the peer's close frame.
    """

    def __init__(
        self,
        host: str,
        port: int,
        path: str = "/",
        *,
        timeout: float = 1.0,
        frame_timeout: float = 30.0,
    ):
        self.host, self.port, self.path = host, port, path
        self.frame_timeout = frame_timeout
        self._sock = socket.create_connection((host, port), timeout=10.0)
        self._sock.settimeout(timeout)
        self._buf = b""
        self._closed = False
        self._handshake()

    def _handshake(self) -> None:
        key = base64.b64encode(os.urandom(16)).decode("ascii")
        req = (
            f"GET {self.path} HTTP/1.1\r\n"
            f"Host: {self.host}:{self.port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        )
        self._sock.sendall(req.encode("ascii"))
        head = self._read_until(b"\r\n\r\n", deadline=time.monotonic() + 10.0)
        status, _, rest = head.partition(b"\r\n")
        parts = status.split()
        if len(parts) < 2 or parts[1] != b"101":
            raise ConnectionError(f"handshake rejected: {status.decode(errors='replace')}")
        headers = {}
        for line in rest.decode("latin-1").split("\r\n"):
            name, _, val = line.partition(":")
            if val:
                headers[name.strip().lower()] = val.strip()
        if headers.get("sec-websocket-accept") != accept_key(key):
            raise ConnectionError("handshake: bad Sec-WebSocket-Accept")

    def _read_until(self, marker: bytes, *, deadline: float) -> bytes:
        while marker not in self._buf:
            if time.monotonic() > deadline:
                raise TimeoutError("handshake timeout")
            try:
                chunk = self._sock.recv(4096)
            except socket.timeout:
                continue
            if not chunk:
                raise ConnectionError("connection closed during handshake")
            self._buf += chunk
        head, _, self._buf = self._buf.partition(marker)
        return head

    def _read_exact(self, n: int, *, wait: bool = True) -> bytes | None:
        """n bytes; with ``wait=False``, a poll timeout before any new
        byte arrives returns None. Mid-frame reads pass ``wait=True``
        and drain the frame once it has started — but only up to
        ``frame_timeout``: a peer that announces a payload and then
        stalls (half-open TCP after a partition, no FIN/RST) must
        become a ConnectionError so the reconnect policy can fire,
        not a thread parked forever."""
        deadline = time.monotonic() + self.frame_timeout
        while len(self._buf) < n:
            try:
                chunk = self._sock.recv(65536)
            except socket.timeout:
                if not wait:
                    return None
                if time.monotonic() > deadline:
                    raise ConnectionError(f"frame stalled > {self.frame_timeout}s")
                continue
            if not chunk:
                raise ConnectionError("connection closed mid-frame")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _recv_frame(self) -> tuple[int, bool, bytes] | None:
        b01 = self._read_exact(2, wait=False)
        if b01 is None:
            return None
        fin = bool(b01[0] & 0x80)
        opcode = b01[0] & 0x0F
        masked = bool(b01[1] & 0x80)
        n = b01[1] & 0x7F
        if n == 126:
            n = struct.unpack(">H", self._read_exact(2))[0]
        elif n == 127:
            n = struct.unpack(">Q", self._read_exact(8))[0]
        key = self._read_exact(4) if masked else None
        payload = self._read_exact(n) if n else b""
        if key:
            payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        return opcode, fin, payload

    def recv_message(self) -> bytes | None:
        """One application message, or None on poll timeout."""
        parts: list[bytes] = []
        started = None
        while True:
            frame = self._recv_frame()
            if frame is None:
                if parts:  # mid-message poll: wait for the tail, bounded
                    if started is None:
                        started = time.monotonic()
                    elif time.monotonic() - started > self.frame_timeout:
                        raise ConnectionError(
                            f"fragmented message stalled > {self.frame_timeout}s"
                        )
                    continue
                return None
            opcode, fin, payload = frame
            if opcode == OP_PING:
                self.send_raw(OP_PONG, payload)
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                code = struct.unpack(">H", payload[:2])[0] if len(payload) >= 2 else 1005
                self.close(echo_only=True)
                raise CloseReceived(code, payload[2:].decode("utf-8", "replace"))
            parts.append(payload)
            if fin:
                return b"".join(parts)

    def send_raw(self, opcode: int, payload: bytes) -> None:
        self._sock.sendall(encode_frame(opcode, payload, mask=True))

    def send_text(self, text: str) -> None:
        self.send_raw(OP_TEXT, text.encode("utf-8"))

    def ping(self, payload: bytes = b"") -> None:
        self.send_raw(OP_PING, payload)

    def close(self, code: int = 1000, *, echo_only: bool = False) -> None:
        if not self._closed:
            self._closed = True
            try:
                self.send_raw(OP_CLOSE, struct.pack(">H", code))
            except OSError:
                pass
        if not echo_only:
            try:
                self._sock.close()
            except OSError:
                pass


def backoff_delay(attempt: int) -> float:
    """Reconnect delay for the given 0-based attempt number —
    ``min(base * 2**attempt, 60 s)``, the reference's schedule
    (ais-proxy/server.js:357)."""
    return min(BASE_RECONNECT_DELAY_S * (2.0**attempt), MAX_RECONNECT_DELAY_S)


class FeedPump:
    """Background thread owning one WebSocket subscription.

    Connects, sends ``subscribe`` (if any) on every (re)open, appends
    each received text message to a bounded buffer, and applies the
    reference's reconnect policy: exponential backoff, attempt counter
    reset on successful open, permanent stop on close codes 1000/1008
    or after ``max_attempts`` consecutive failures.
    """

    def __init__(
        self,
        host: str,
        port: int,
        path: str = "/",
        *,
        subscribe: str | None = None,
        max_buffer: int = 100_000,
        base_delay: float = BASE_RECONNECT_DELAY_S,
        max_attempts: int = MAX_RECONNECT_ATTEMPTS,
        ping_interval: float = 30.0,
        idle_timeout: float | None = None,
    ):
        self.host, self.port, self.path = host, port, path
        self.subscribe = subscribe
        self.max_buffer = max_buffer
        self.base_delay = base_delay
        self.max_attempts = max_attempts
        self.ping_interval = ping_interval
        # with an idle_timeout, the pump stops itself when nobody has
        # drained it for that long — the Python datasource API gives
        # the reader no stop() hook, so a stopped query would
        # otherwise leak a live socket + forever-reconnecting thread
        # per start (and a phantom subscription upstream)
        self.idle_timeout = idle_timeout
        self.last_drain = time.monotonic()
        self._lock = threading.Lock()
        self._pending: deque[tuple[int, datetime, str]] = deque()
        self._seq = 0
        self.dropped = 0
        self.opens = 0
        self.stopped = threading.Event()
        self.stop_reason: str | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "FeedPump":
        self._thread = threading.Thread(target=self._run, daemon=True, name="ws-feed-pump")
        self._thread.start()
        return self

    def stop(self) -> None:
        self.stopped.set()
        if self._thread is not None:
            self._thread.join(timeout=10.0)

    def _run(self) -> None:
        attempts = 0
        while not self.stopped.is_set():
            try:
                client = WebSocketClient(self.host, self.port, self.path, timeout=0.1)
            except OSError:
                attempts += 1
                if attempts >= self.max_attempts:
                    self.stop_reason = f"gave up after {attempts} attempts"
                    break
                if self.stopped.wait(min(self.base_delay * (2.0 ** (attempts - 1)), 60.0)):
                    break
                continue
            self.opens += 1
            attempts = 0
            try:
                if self.subscribe:
                    client.send_text(self.subscribe)
                last_ping = time.monotonic()
                while not self.stopped.is_set():
                    if (
                        self.idle_timeout is not None
                        and time.monotonic() - self.last_drain > self.idle_timeout
                    ):
                        self.stop_reason = (
                            f"idle: no reader drain in {self.idle_timeout}s (query stopped?)"
                        )
                        self.stopped.set()
                        break
                    msg = client.recv_message()
                    if msg is not None:
                        self._append(msg.decode("utf-8", "replace"))
                    if time.monotonic() - last_ping >= self.ping_interval:
                        client.ping()
                        last_ping = time.monotonic()
            except CloseReceived as close:
                if close.code in NO_RECONNECT_CLOSE_CODES:
                    self.stop_reason = f"closed by peer ({close.code}), not reconnecting"
                    break
                attempts = 1
            except OSError:
                attempts = 1
            finally:
                client.close()
            if attempts and self.stopped.wait(self.base_delay):
                break
        self.stopped.set()

    def _append(self, value: str) -> None:
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        with self._lock:
            if len(self._pending) >= self.max_buffer:
                self._pending.popleft()
                self.dropped += 1
            self._pending.append((self._seq, now, value))
            self._seq += 1

    def drain(self) -> list[tuple[int, datetime, str]]:
        self.last_drain = time.monotonic()
        with self._lock:
            out = list(self._pending)
            self._pending.clear()
            return out


def _require(options, name: str) -> str:
    val = options.get(name)
    if val is None:
        raise ValueError(f"websocket_feed: missing required option '{name}'")
    return val


try:  # pragma: no cover - import guard so non-Spark tools can load the client
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class _WSFeedReader(SimpleDataSourceStreamReader):
        """Driver-side Simple reader: drain the pump per micro-batch.

        ``read`` moves pending rows into a replay window keyed by seq;
        ``readBetweenOffsets`` serves same-process recovery from that
        window; ``commit`` prunes it. The window is in-memory only —
        see the module docstring for the restart contract.
        """

        def __init__(self, options):
            self._options = options
            self._pump: FeedPump | None = None
            self._replay: deque[tuple[int, datetime, str]] = deque()
            # offset rebase for driver restarts: a fresh FeedPump
            # counts from 0, but the checkpointed start offset is
            # whatever the previous run reached — anchored on first
            # read (see read())
            self._seq_base: int | None = None

        def _ensure_pump(self) -> FeedPump:
            if self._pump is None:
                opts = self._options
                self._pump = FeedPump(
                    _require(opts, "host"),
                    int(_require(opts, "port")),
                    opts.get("path") or "/",
                    subscribe=opts.get("subscribe"),
                    max_buffer=int(opts.get("maxbuffer") or 100_000),
                    base_delay=float(opts.get("basedelay") or BASE_RECONNECT_DELAY_S),
                    max_attempts=int(opts.get("maxattempts") or MAX_RECONNECT_ATTEMPTS),
                    ping_interval=float(opts.get("pinginterval") or 30.0),
                    idle_timeout=float(opts.get("idletimeout") or 300.0),
                ).start()
            return self._pump

        def initialOffset(self) -> dict:
            self._ensure_pump()
            return {"seq": 0}

        def read(self, start: dict):
            pump = self._ensure_pump()
            rows = pump.drain()
            if not rows and pump.stopped.is_set() and pump.stop_reason:
                # a dead feed must be VISIBLE: without this the query
                # would keep reporting healthy empty batches forever
                # after an auth-revoked close (1008), a normal server
                # close (1000), or reconnect give-up — indistinguishable
                # from an idle feed. Buffered rows drain first; the
                # failure surfaces on the first empty batch after death.
                raise RuntimeError(f"websocket_feed terminated: {pump.stop_reason}")
            if self._seq_base is None:
                # Rebase the pump's process-local sequence onto the
                # checkpointed offset line. After a driver restart the
                # new pump restarts at 0 while start['seq'] is N;
                # without this, post-restart rows would be delivered
                # under a non-advancing offset (the max() clamp),
                # commit(N) would immediately prune them from the
                # replay window, and a same-process batch retry via
                # readBetweenOffsets would return empty — silent row
                # loss on recovery. With the rebase, offsets stay
                # monotone with live data and the replay window stays
                # valid across the restart. (In a fresh run
                # initialOffset() returns {seq: 0}, so the base is 0
                # and this is the identity.)
                self._seq_base = start["seq"]
            if self._seq_base:
                base = self._seq_base
                rows = [(s + base, ts, v) for s, ts, v in rows]
            self._replay.extend(rows)
            next_seq = rows[-1][0] + 1 if rows else start["seq"]
            return iter(rows), {"seq": max(next_seq, start["seq"])}

        def readBetweenOffsets(self, start: dict, end: dict):
            lo, hi = start["seq"], end["seq"]
            return iter([r for r in self._replay if lo <= r[0] < hi])

        def commit(self, end: dict) -> None:
            hi = end["seq"]
            while self._replay and self._replay[0][0] < hi:
                self._replay.popleft()

    class WebSocketDataSource(DataSource):
        """``readStream.format("websocket_feed")`` — options: ``host``,
        ``port`` (required); ``path``, ``subscribe`` (JSON sent on
        every open, like the reference's subscription message),
        ``maxBuffer``, ``baseDelay``, ``maxAttempts``,
        ``pingInterval``, ``idleTimeout`` (seconds without a reader
        drain after which the pump stops itself — the datasource API
        exposes no reader stop() hook, so this is what reclaims the
        socket/thread after query.stop(); default 300). A terminally
        dead feed (close 1000/1008, reconnect give-up) raises on the
        next empty batch instead of emitting healthy-looking nothing.
        Register with ``spark.dataSource.register(WebSocketDataSource)``."""

        @classmethod
        def name(cls) -> str:
            return "websocket_feed"

        def schema(self) -> str:
            return "seq bigint, recv_ts timestamp, value string"

        def simpleStreamReader(self, schema):
            return _WSFeedReader(self.options)

except ImportError:  # pragma: no cover
    WebSocketDataSource = None  # type: ignore[assignment]


def subscription_message(
    api_key: str, bounding_boxes: list[list[list[float]]], message_types: list[str]
) -> str:
    """The reference's AISStream subscription payload shape
    (ais-proxy/server.js:282-287) — sent as the first text frame after
    open."""
    return json.dumps(
        {
            "APIKey": api_key,
            "BoundingBoxes": bounding_boxes,
            "FilterMessageTypes": message_types,
        }
    )
