"""Minimal RFC 6455 WebSocket client — the push transport for the
``newHeads`` block feed.

Reference shape (/root/reference/eth_event_stream/src/data_feed/block.rs:
22-68): connect over WebSocket, ``eth_subscribe("newHeads")``, and treat
every subscription notification as "the head is now H". This module is the
transport only; the subscribe/notify protocol and the reconnect-forever
loop live in ``notify.BlockNotify``.

stdlib-only (socket/hashlib/base64/struct): nothing to install on driver
or executors, same constraint as the HTTP transport (rpc.py). Scope is
deliberately the client half of RFC 6455 that an Ethereum node speaks:
``ws://`` (no TLS in this sandbox), text/ping/pong/close frames, 7/16/64-
bit payload lengths, client-side masking (mandatory per RFC 6455 §5.3),
and continuation-frame reassembly. Anything outside that surfaces through
the shared RPC error taxonomy: socket-level failures are
``TransientRpcError`` (the caller's reconnect loop heals them), protocol
violations — bad handshake status, wrong accept key, unmasked-frame
rules — are deterministic ``RpcError`` (fail fast, never spin).
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct
from urllib.parse import urlparse

from .rpc import RpcError, TransientRpcError

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def accept_key(key: str) -> str:
    """Sec-WebSocket-Accept for a client key (RFC 6455 §4.2.2) — shared
    with the loopback test server so both sides compute one truth."""
    return base64.b64encode(
        hashlib.sha1((key + _WS_GUID).encode()).digest()
    ).decode()


def _mask(payload: bytes, mask: bytes) -> bytes:
    # XOR with the repeating 4-byte mask; int-sized XOR via int.from_bytes
    # keeps this O(n) without numpy
    repeated = (mask * (len(payload) // 4 + 1))[: len(payload)]
    return (
        int.from_bytes(payload, "big") ^ int.from_bytes(repeated, "big")
    ).to_bytes(len(payload), "big") if payload else b""


def encode_frame(opcode: int, payload: bytes, masked: bool) -> bytes:
    """One FIN frame. Client frames must be masked; server frames must not
    (RFC 6455 §5.1) — the test server reuses this with masked=False."""
    head = bytearray([0x80 | opcode])
    n = len(payload)
    mask_bit = 0x80 if masked else 0
    if n < 126:
        head.append(mask_bit | n)
    elif n < 1 << 16:
        head.append(mask_bit | 126)
        head += struct.pack(">H", n)
    else:
        head.append(mask_bit | 127)
        head += struct.pack(">Q", n)
    if masked:
        m = os.urandom(4)
        return bytes(head) + m + _mask(payload, m)
    return bytes(head) + payload


class WsClient:
    """Blocking WebSocket client: connect + handshake in the constructor,
    ``send_text`` / ``recv_text`` afterward. Not thread-safe; the feed
    thread owns it. ``close()`` is safe from another thread and unblocks a
    blocked ``recv_text`` (the socket dies under it)."""

    def __init__(self, url: str, timeout_s: float = 10.0, idle_timeout_s: float = 60.0):
        u = urlparse(url)
        if u.scheme != "ws":
            raise RpcError(f"unsupported WebSocket scheme {u.scheme!r} (ws only)")
        host = u.hostname or "localhost"
        port = u.port or 80
        path = u.path or "/"
        try:
            self._sock = socket.create_connection((host, port), timeout=timeout_s)
        except OSError as e:
            raise TransientRpcError(f"ws connect: {e}") from e
        self._buf = b""
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            f"GET {path} HTTP/1.1\r\n"
            f"Host: {host}:{port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        )
        try:
            self._sock.sendall(req.encode())
            raw = self._read_until(b"\r\n\r\n")
        except OSError as e:
            self._sock.close()
            raise TransientRpcError(f"ws handshake: {e}") from e
        status = raw.split(b"\r\n", 1)[0].decode("latin-1")
        if " 101 " not in status + " ":
            self._sock.close()
            # a non-101 answer is the server REFUSING the upgrade — protocol,
            # not transport
            raise RpcError(f"ws handshake refused: {status!r}")
        headers = {}
        for line in raw.split(b"\r\n")[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        if headers.get(b"sec-websocket-accept", b"").decode() != accept_key(key):
            self._sock.close()
            raise RpcError("ws handshake: bad Sec-WebSocket-Accept")
        # subscription sockets idle between pushes (Ethereum block cadence
        # ~12 s, pings not guaranteed): the handshake's tight timeout would
        # misread every quiet gap as a drop and churn reconnects, so reads
        # after the handshake get their own, much larger idle budget; a
        # genuinely dead link still surfaces (as a transient) within it
        self._sock.settimeout(idle_timeout_s)

    # -- transport ----------------------------------------------------------

    def _read_until(self, sep: bytes) -> bytes:
        while sep not in self._buf:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise TransientRpcError("ws: connection closed during handshake")
            self._buf += chunk
        raw, self._buf = self._buf.split(sep, 1)
        return raw

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            try:
                chunk = self._sock.recv(65536)
            except OSError as e:
                raise TransientRpcError(f"ws recv: {e}") from e
            if not chunk:
                raise TransientRpcError("ws: connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_frame(self) -> tuple[int, bool, bytes]:
        b0, b1 = self._read_exact(2)
        fin, opcode = bool(b0 & 0x80), b0 & 0x0F
        masked, n = bool(b1 & 0x80), b1 & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", self._read_exact(2))
        elif n == 127:
            (n,) = struct.unpack(">Q", self._read_exact(8))
        if masked:
            # RFC 6455 §5.1: a server MUST NOT mask
            raise RpcError("ws: masked server frame")
        return opcode, fin, self._read_exact(n)

    def send_text(self, text: str) -> None:
        try:
            self._sock.sendall(encode_frame(OP_TEXT, text.encode(), masked=True))
        except OSError as e:
            raise TransientRpcError(f"ws send: {e}") from e

    def recv_text(self) -> str:
        """Next complete text message; answers pings, reassembles
        continuations, raises TransientRpcError on close (the reconnect
        loop treats a server-initiated close as a drop to heal)."""
        parts: list[bytes] = []
        while True:
            opcode, fin, payload = self._read_frame()
            if opcode == OP_PING:
                try:
                    self._sock.sendall(encode_frame(OP_PONG, payload, masked=True))
                except OSError as e:  # pong into a broken pipe = drop
                    raise TransientRpcError(f"ws pong: {e}") from e
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                raise TransientRpcError("ws: server closed the connection")
            if opcode in (OP_TEXT, OP_BINARY) or (opcode == OP_CONT and parts):
                parts.append(payload)
                if fin:
                    return b"".join(parts).decode()
                continue
            raise RpcError(f"ws: unexpected opcode {opcode:#x}")

    def close(self) -> None:
        try:
            self._sock.sendall(encode_frame(OP_CLOSE, b"", masked=True))
        except OSError:
            pass
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._sock.close()
