"""WebSocket push head-feed: loopback tests.

A scripted RFC 6455 loopback server plays the Ethereum node role
(handshake -> eth_subscribe ack -> newHeads notifications), driving the
same contracts the HTTP-poll transport tests pin (test_rpc.py): watch
semantics, monotonic head, reconnect-forever with RE-subscription, and
fail-fast on deterministic protocol errors — the reference behavior of
data_feed/block.rs:22-68 on its native transport.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import time

import pytest

from eth_event_stream_spark.sources.notify import BlockNotify
from eth_event_stream_spark.sources.rpc import RpcError, TransientRpcError
from eth_event_stream_spark.sources.ws import (
    OP_CONT,
    OP_PING,
    OP_TEXT,
    WsClient,
    accept_key,
    encode_frame,
)


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client closed")
        buf += chunk
    return buf


def _server_read_text(sock: socket.socket) -> str:
    """Server-side frame read: client frames are MASKED (RFC 6455 §5.3)."""
    while True:
        b0, b1 = _read_exact(sock, 2)
        opcode, masked, n = b0 & 0x0F, bool(b1 & 0x80), b1 & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", _read_exact(sock, 2))
        elif n == 127:
            (n,) = struct.unpack(">Q", _read_exact(sock, 8))
        assert masked, "client frames must be masked"
        mask = _read_exact(sock, 4)
        payload = bytes(
            b ^ mask[i % 4] for i, b in enumerate(_read_exact(sock, n))
        )
        if opcode == OP_TEXT:
            return payload.decode()
        if opcode in (0x8,):  # close
            raise ConnectionError("client sent close")
        # ignore client pongs/pings


class FakeWsNode:
    """Scripted newHeads node: per accepted connection, handshake, answer
    the eth_subscribe, then run the connection script — a list of
    ("head", n) / ("ping",) / ("frag", n) / ("close",) steps. Scripts are
    consumed per connection in order; after the last script, connections
    stay open until the client closes."""

    def __init__(self, scripts: list[list[tuple]], reject: str | None = None):
        self.scripts = scripts
        self.reject = reject  # None | "http" | "subscribe"
        self.subscriptions = 0
        self.connections = 0
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    @property
    def url(self) -> str:
        return f"ws://127.0.0.1:{self.port}/"

    def _accept_loop(self) -> None:
        while not self._stop:
            try:
                self._srv.settimeout(0.2)
                conn, _ = self._srv.accept()
            except TimeoutError:
                continue
            except OSError:
                return
            self.connections += 1
            threading.Thread(
                target=self._serve, args=(conn,), daemon=True
            ).start()

    def _serve(self, conn: socket.socket) -> None:
        try:
            conn.settimeout(10.0)
            raw = b""
            while b"\r\n\r\n" not in raw:
                raw += conn.recv(4096)
            key = ""
            for line in raw.split(b"\r\n"):
                if line.lower().startswith(b"sec-websocket-key:"):
                    key = line.split(b":", 1)[1].strip().decode()
            if self.reject == "http":
                conn.sendall(b"HTTP/1.1 403 Forbidden\r\n\r\n")
                conn.close()
                return
            conn.sendall(
                (
                    "HTTP/1.1 101 Switching Protocols\r\n"
                    "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                    f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
                ).encode()
            )
            sub = json.loads(_server_read_text(conn))
            assert sub["method"] == "eth_subscribe"
            self.subscriptions += 1
            if self.reject == "subscribe":
                ack = {"jsonrpc": "2.0", "id": sub["id"],
                       "error": {"code": -32601, "message": "no pubsub"}}
            else:
                ack = {"jsonrpc": "2.0", "id": sub["id"], "result": "0xsub1"}
            conn.sendall(encode_frame(OP_TEXT, json.dumps(ack).encode(), masked=False))
            script = self.scripts.pop(0) if self.scripts else []
            for step in script:
                if step[0] == "head":
                    msg = json.dumps(
                        {
                            "jsonrpc": "2.0",
                            "method": "eth_subscription",
                            "params": {
                                "subscription": "0xsub1",
                                "result": {"number": hex(step[1])},
                            },
                        }
                    ).encode()
                    conn.sendall(encode_frame(OP_TEXT, msg, masked=False))
                elif step[0] == "frag":
                    # the same head notification split into TEXT(fin=0) +
                    # CONT(fin=1) — exercises reassembly
                    msg = json.dumps(
                        {
                            "jsonrpc": "2.0",
                            "method": "eth_subscription",
                            "params": {
                                "subscription": "0xsub1",
                                "result": {"number": hex(step[1])},
                            },
                        }
                    ).encode()
                    half = len(msg) // 2
                    f1 = encode_frame(OP_TEXT, msg[:half], masked=False)
                    f1 = bytes([f1[0] & 0x7F]) + f1[1:]  # clear FIN
                    conn.sendall(f1)
                    conn.sendall(encode_frame(OP_CONT, msg[half:], masked=False))
                elif step[0] == "ping":
                    conn.sendall(encode_frame(OP_PING, b"hb", masked=False))
                elif step[0] == "badresult":
                    msg = json.dumps(
                        {
                            "jsonrpc": "2.0",
                            "method": "eth_subscription",
                            "params": {"subscription": "0xsub1", "result": None},
                        }
                    ).encode()
                    conn.sendall(encode_frame(OP_TEXT, msg, masked=False))
                elif step[0] == "close":
                    conn.close()
                    return
            # hold the connection open until the client goes away
            try:
                _server_read_text(conn)
            except (ConnectionError, OSError):
                pass
            conn.close()
        except (ConnectionError, OSError, AssertionError):
            conn.close()

    def stop(self) -> None:
        self._stop = True
        self._srv.close()


def _wait(pred, timeout=10.0, msg="condition"):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return
        time.sleep(0.01)
    raise TimeoutError(msg)


def test_ws_push_heads_watch_semantics():
    """Heads pushed over the WS subscription land in the watch channel:
    monotonic (a lower head from the node never moves it back), pings
    answered, fragmented notifications reassembled."""
    node = FakeWsNode([[("head", 5), ("ping",), ("head", 3), ("frag", 7)]])
    nf = BlockNotify(rpc_url="http://unused.invalid", ws_url=node.url)
    try:
        assert nf.wait_for(7, timeout_s=10.0) == 7
        assert nf.latest() == 7  # the head=3 push never lowered it
        assert node.subscriptions == 1
    finally:
        nf.stop()
        node.stop()


def test_ws_reconnects_and_resubscribes():
    """A dropped connection heals: the feed reconnects, RE-subscribes
    (subscriptions are per-connection), and later heads keep flowing —
    the reconnect-forever contract on the push transport."""
    node = FakeWsNode([[("head", 4), ("close",)], [("head", 9)]])
    nf = BlockNotify(rpc_url="http://unused.invalid", ws_url=node.url)
    try:
        assert nf.wait_for(4, timeout_s=10.0) >= 4
        assert nf.wait_for(9, timeout_s=10.0) == 9
        assert node.subscriptions == 2
        assert nf.error is None
    finally:
        nf.stop()
        node.stop()


def test_ws_subscribe_rejected_fails_fast():
    """A node that answers eth_subscribe with a JSON-RPC error is a
    deterministic protocol failure: the feed stores it and stops instead
    of reconnect-spinning against an endpoint that will never push."""
    node = FakeWsNode([], reject="subscribe")
    nf = BlockNotify(rpc_url="http://unused.invalid", ws_url=node.url)
    try:
        with pytest.raises(RpcError):
            nf.wait_for(1, timeout_s=10.0)
        assert nf.error is not None
        assert not isinstance(nf.error, TransientRpcError)
        assert node.connections == 1  # no reconnect spin
    finally:
        nf.stop()
        node.stop()


def test_ws_malformed_head_fails_fast_not_silently():
    """A notification with result=null must surface as RpcError through
    .error (fail-fast), NOT kill the feed thread with an uncaught
    AttributeError that leaves .error unset and wait_for hanging."""
    node = FakeWsNode([[("head", 3), ("badresult",)]])
    nf = BlockNotify(rpc_url="http://unused.invalid", ws_url=node.url)
    try:
        # the good head may or may not be observed before the bad frame's
        # error lands (wait_for surfaces a stored error first) — the
        # contract under test is only that the malformed result becomes a
        # stored RpcError instead of silently killing the thread
        with pytest.raises(RpcError, match="malformed"):
            nf.wait_for(99, timeout_s=10.0)
        assert nf.error is not None
        assert not isinstance(nf.error, TransientRpcError)
    finally:
        nf.stop()
        node.stop()


def test_ws_handshake_refused_fails_fast():
    """A non-101 upgrade answer (auth failure, wrong path) is
    deterministic — fail fast, no reconnect loop."""
    node = FakeWsNode([], reject="http")
    nf = BlockNotify(rpc_url="http://unused.invalid", ws_url=node.url)
    try:
        with pytest.raises(RpcError) as ei:
            nf.wait_for(1, timeout_s=10.0)
        assert "refused" in str(ei.value)
    finally:
        nf.stop()
        node.stop()


def test_ws_client_rejects_masked_server_frame():
    """RFC 6455 §5.1: server frames must not be masked — a violating
    server is a protocol error, not a transient drop."""
    srv = socket.create_server(("127.0.0.1", 0))
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        raw = b""
        while b"\r\n\r\n" not in raw:
            raw += conn.recv(4096)
        key = [
            line.split(b":", 1)[1].strip().decode()
            for line in raw.split(b"\r\n")
            if line.lower().startswith(b"sec-websocket-key:")
        ][0]
        conn.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
            ).encode()
        )
        # a MASKED frame from the server side — illegal
        conn.sendall(encode_frame(OP_TEXT, b"{}", masked=True))

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    c = WsClient(f"ws://127.0.0.1:{port}/")
    try:
        with pytest.raises(RpcError) as ei:
            c.recv_text()
        assert not isinstance(ei.value, TransientRpcError)
        assert "masked" in str(ei.value)
    finally:
        c.close()
        srv.close()
