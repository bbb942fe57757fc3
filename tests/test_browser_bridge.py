"""Browser bridge: a synthetic PCM client driven through the REAL
WebSocket path (handshake, masked binary frames, record reassembly) must
receive exactly the records the plain TCP client path produces."""

import socket
import struct
import sys
import threading
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from examples.serve_streams import HEADER, StreamServer  # noqa: E402
from examples.browser.server import (  # noqa: E402
    BrowserBridge,
    ws_accept_key,
    ws_encode_frame,
    ws_read_frame,
)


def _ws_connect(port: int) -> socket.socket:
    sock = socket.create_connection(("127.0.0.1", port), timeout=30)
    key = "dGhlIHNhbXBsZSBub25jZQ=="
    sock.sendall(
        (f"GET /ws HTTP/1.1\r\nHost: 127.0.0.1:{port}\r\n"
         "Upgrade: websocket\r\nConnection: Upgrade\r\n"
         f"Sec-WebSocket-Key: {key}\r\n"
         "Sec-WebSocket-Version: 13\r\n\r\n").encode()
    )
    resp = b""
    while b"\r\n\r\n" not in resp:
        chunk = sock.recv(4096)
        assert chunk, "handshake EOF"
        resp += chunk
    head = resp.split(b"\r\n\r\n")[0].decode()
    assert "101" in head.splitlines()[0]
    assert ws_accept_key(key) in head
    return sock


def _drain_records(sock: socket.socket, n_mels: int) -> bytes:
    buf = b""
    while True:
        try:
            opcode, payload = ws_read_frame(sock)
        except ConnectionError:
            break
        if opcode == 0x8:
            break
        if opcode == 0x2:
            buf += payload
    return buf


@pytest.fixture(scope="module")
def pcm(jfk_samples):
    return np.asarray(jfk_samples[: 16000 * 3], np.float32).tobytes()


def test_ws_client_matches_tcp_client(pcm):
    streams = StreamServer(n_streams=4, hops_per_tick=4)
    streams.start()
    bridge = BrowserBridge(stream_server=streams).start()
    try:
        # plain TCP reference pass
        tcp = socket.create_connection(("127.0.0.1", streams.port),
                                       timeout=30)
        tcp.sendall(pcm)
        tcp.shutdown(socket.SHUT_WR)
        want = b""
        while True:
            d = tcp.recv(65536)
            if not d:
                break
            want += d
        tcp.close()

        # websocket pass: masked binary frames in odd chunk sizes
        ws = _ws_connect(bridge.port)
        for off in range(0, len(pcm), 31997):
            ws.sendall(ws_encode_frame(pcm[off : off + 31997], mask=True))
        ws.sendall(ws_encode_frame(b"", opcode=0x8, mask=True))
        got = _drain_records(ws, streams.config.n_mels)
        ws.close()
    finally:
        bridge.stop()
        streams.stop()

    rec = HEADER.size + streams.config.n_mels
    assert len(want) > 0 and len(want) % rec == 0
    assert got == want, (len(got), len(want))
    idx0, va0, lo, hi = HEADER.unpack(want[:HEADER.size])
    assert lo <= hi


def test_static_pages_served():
    bridge = BrowserBridge(n_streams=2).start()
    try:
        import urllib.request

        for name, marker in [("", b"melspec_tpu live pipeline"),
                             ("app.js", b"drawColumn"),
                             ("worklet.js", b"pcm-capture")]:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{bridge.port}/{name}"
            ) as r:
                body = r.read()
                assert r.status == 200
                assert marker in body
                if name == "":
                    assert r.headers["Cross-Origin-Embedder-Policy"] \
                        == "require-corp"
        with pytest.raises(Exception):
            urllib.request.urlopen(
                f"http://127.0.0.1:{bridge.port}/../secret"
            )
    finally:
        bridge.stop()
