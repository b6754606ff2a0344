"""REQ/REP-pattern framed TCP transport.

Mirrors the ZMQ socket roles the reference uses (REP bind for scheduling,
realness_bridge.py:26-43; REQ connect for reward collection,
realness_bridge.py:66-68) over plain TCP with 4-byte big-endian length
framing.  The strict recv/send (REP) and send/recv (REQ) alternation is
enforced, like ZMQ would.
"""

from __future__ import annotations

import socket
import struct
import time

_HDR = struct.Struct(">I")


def _send_frame(conn: socket.socket, payload: bytes) -> None:
    conn.sendall(_HDR.pack(len(payload)) + payload)


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def _recv_frame(conn: socket.socket) -> bytes:
    (n,) = _HDR.unpack(_recv_exact(conn, _HDR.size))
    return _recv_exact(conn, n)


class RepSocket:
    """Bind-side reply socket: recv() then send(), strictly alternating."""

    def __init__(self, port: int, host: str = "0.0.0.0", timeout: float | None = None):
        self.port = port
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        if port == 0:
            self.port = self._listener.getsockname()[1]
        self._listener.listen(1)
        if timeout is not None:
            self._listener.settimeout(timeout)
        self._conn: socket.socket | None = None
        self._timeout = timeout
        self._awaiting_send = False

    def _ensure_conn(self):
        if self._conn is None:
            self._conn, _ = self._listener.accept()
            if self._timeout is not None:
                self._conn.settimeout(self._timeout)

    def recv(self) -> bytes:
        assert not self._awaiting_send, "REP: must send() before next recv()"
        self._ensure_conn()
        try:
            data = _recv_frame(self._conn)
        except ConnectionError:
            # peer went away; await a fresh connection (ZMQ REP behavior)
            self._conn.close()
            self._conn = None
            self._ensure_conn()
            data = _recv_frame(self._conn)
        self._awaiting_send = True
        return data

    def send(self, payload: bytes) -> None:
        assert self._awaiting_send, "REP: must recv() before send()"
        _send_frame(self._conn, payload)
        self._awaiting_send = False

    def close(self):
        if self._conn is not None:
            self._conn.close()
            self._conn = None
        self._listener.close()


class ReqSocket:
    """Connect-side request socket: send() then recv(), strictly alternating."""

    def __init__(self, host: str, port: int, timeout: float | None = None,
                 retries: int = 50, retry_delay: float = 0.1):
        last = None
        for _ in range(retries):
            try:
                self._conn = socket.create_connection((host, port), timeout=timeout)
                break
            except OSError as e:
                last = e
                time.sleep(retry_delay)
        else:
            raise ConnectionError(f"cannot connect to {host}:{port}: {last}")
        self._awaiting_recv = False

    def send(self, payload: bytes) -> None:
        assert not self._awaiting_recv, "REQ: must recv() before next send()"
        _send_frame(self._conn, payload)
        self._awaiting_recv = True

    def recv(self) -> bytes:
        assert self._awaiting_recv, "REQ: must send() before recv()"
        data = _recv_frame(self._conn)
        self._awaiting_recv = False
        return data

    def close(self):
        self._conn.close()
