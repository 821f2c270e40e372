"""BSON codec + WebSocket telemetry server (loopback client)."""

import socket
import struct
import threading
import time

import numpy as np

from jetracer_orbslam2_tpu.runtime import bson
from jetracer_orbslam2_tpu.runtime.telemetry import (
    TelemetryPublisher, WebSocketServer, _accept_key)


def test_bson_roundtrip():
    doc = {
        "ax": 12, "ay": -3, "az": 178,
        "big": 2 ** 40,
        "score": 0.5,
        "name": "frame",
        "flag": True,
        "blob": np.arange(16, dtype=np.int16),
    }
    data = bson.encode(doc)
    out = bson.decode(data)
    assert out["ax"] == 12 and out["az"] == 178
    assert out["big"] == 2 ** 40
    assert out["score"] == 0.5
    assert out["name"] == "frame"
    assert out["flag"] is True
    np.testing.assert_array_equal(
        np.frombuffer(out["blob"], np.int16), np.arange(16, dtype=np.int16))


def _ws_client_connect(port):
    s = socket.create_connection(("127.0.0.1", port), timeout=3)
    key = "dGhlIHNhbXBsZSBub25jZQ=="
    s.sendall(
        (f"GET / HTTP/1.1\r\nHost: 127.0.0.1:{port}\r\n"
         "Upgrade: websocket\r\nConnection: Upgrade\r\n"
         f"Sec-WebSocket-Key: {key}\r\n"
         "Sec-WebSocket-Version: 13\r\n\r\n").encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += s.recv(4096)
    assert b"101" in resp.split(b"\r\n", 1)[0]
    assert _accept_key(key).encode() in resp
    return s


def _ws_read_binary(s):
    hdr = b""
    while len(hdr) < 2:
        hdr += s.recv(2 - len(hdr))
    n = hdr[1] & 0x7F
    if n == 126:
        ext = b""
        while len(ext) < 2:
            ext += s.recv(2 - len(ext))
        (n,) = struct.unpack(">H", ext)
    elif n == 127:
        ext = b""
        while len(ext) < 8:
            ext += s.recv(8 - len(ext))
        (n,) = struct.unpack(">Q", ext)
    payload = b""
    while len(payload) < n:
        payload += s.recv(n - len(payload))
    return payload


def test_websocket_broadcast_and_receive():
    got = []
    srv = WebSocketServer(port=0, on_message=got.append).start()
    try:
        c = _ws_client_connect(srv.port)
        deadline = time.time() + 3
        while srv.num_clients == 0 and time.time() < deadline:
            time.sleep(0.01)
        assert srv.num_clients == 1

        pub = TelemetryPublisher(srv, send_image=True)
        gray = (np.random.default_rng(0).uniform(0, 255, (48, 64))
                .astype(np.float32))
        xy = np.asarray([[5.0, 6.0], [10.0, 12.0], [1.0, 1.0]])
        valid = np.asarray([True, True, False])
        ok = pub.publish(gray, xy, valid, euler_deg=(1, 2, 3),
                         pose=np.eye(4))
        assert ok
        payload = _ws_read_binary(c)
        doc = bson.decode(payload)
        assert doc["width"] == 64 and doc["height"] == 48
        assert doc["ax"] == 1 and doc["az"] == 3
        kx = np.frombuffer(doc["keypoints_x"], np.int16)
        np.testing.assert_array_equal(kx, [5, 10])
        assert doc["image"][:2] == b"\xff\xd8"        # JPEG SOI marker
        pose = np.frombuffer(doc["pose"], np.float32).reshape(4, 4)
        np.testing.assert_allclose(pose, np.eye(4))

        # client -> server command path (masked frame)
        msg = b'{"message":"test"}'
        mask = b"\x01\x02\x03\x04"
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(msg))
        c.sendall(bytes([0x81, 0x80 | len(msg)]) + mask + masked)
        deadline = time.time() + 3
        while not got and time.time() < deadline:
            time.sleep(0.01)
        assert got and got[0] == msg
        c.close()
    finally:
        srv.close()


def test_websocket_rate_limit_drops():
    srv = WebSocketServer(port=0, rate_bytes_per_s=10_000).start()
    try:
        big = b"x" * 6000
        assert srv.broadcast(big) is True
        assert srv.broadcast(big) is False     # budget exhausted -> drop
        assert srv.dropped_frames == 1
        time.sleep(0.7)                         # refill
        assert srv.broadcast(big) is True
    finally:
        srv.close()
