"""Round-3 parity closers: FTheta distortion, keypoint overlay raster,
liveness watchdog (the last three absent components of SURVEY §2 rows
11/25 + the FTheta half of the align kernels, cuda-align.cu:60-109)."""

import time

import numpy as np
import jax.numpy as jnp
import pytest

from jetracer_orbslam2_tpu.ops import geometry as geo


def test_ftheta_roundtrip_and_shape():
    """distort∘undistort == id, distortion pulls points toward center."""
    dist = jnp.asarray([0.9, 0, 0, 0, 0], jnp.float32)   # ~52 deg FOV param
    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(-0.8, 0.8, (256, 2)).astype(np.float32))
    xd = geo.distort_ftheta(xy, dist)
    back = geo.undistort_ftheta(xd, dist)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=1e-4)
    # fisheye compresses progressively: the radial gain rd/r starts at
    # 2*tan(w/2)/w at the center and falls monotonically with radius
    r = np.linalg.norm(np.asarray(xy), axis=1)
    rd = np.linalg.norm(np.asarray(xd), axis=1)
    order = np.argsort(r)
    gain = rd[order] / np.maximum(r[order], 1e-9)
    w = 0.9
    assert abs(gain[0] - 2 * np.tan(w / 2) / w) < 1e-2
    assert (np.diff(gain) < 1e-6).all()          # monotone non-increasing
    assert gain[-1] < gain[0] * 0.9              # real compression at edge


def test_project_deproject_ftheta_consistent():
    intr = jnp.asarray([300.0, 300.0, 160.0, 120.0], jnp.float32)
    dist = jnp.asarray([0.8, 0, 0, 0, 0], jnp.float32)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(
        rng.uniform([-1, -1, 2], [1, 1, 6], (128, 3)).astype(np.float32))
    uv = geo.project(pts, intr, dist, model="ftheta")
    z = pts[:, 2]
    back = geo.deproject(uv, z, intr, dist, model="ftheta")
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_overlay_keypoints_raster():
    from jetracer_orbslam2_tpu.ops.overlay import overlay_keypoints

    gray = jnp.zeros((32, 48), jnp.float32)
    xy = jnp.asarray([[5.0, 7.0], [47.0, 31.0], [100.0, 3.0]], jnp.float32)
    valid = jnp.asarray([True, True, False])
    out = np.asarray(overlay_keypoints(gray, xy, valid))
    # 2x2 dot at (7,5) (reference post_processing.cu:45-70 footprint)
    assert (out[7:9, 5:7] == 255.0).all()
    # corner dot clipped to in-bounds pixels only
    assert out[31, 47] == 255.0
    # invalid keypoint drew nothing; total lit pixels = 4 + 1
    assert (out > 0).sum() == 5


def test_overlay_used_by_telemetry_publisher():
    from jetracer_orbslam2_tpu.runtime import bson
    from jetracer_orbslam2_tpu.runtime.telemetry import (
        TelemetryPublisher, WebSocketServer)

    class FakeServer:
        def __init__(self):
            self.payloads = []

        def broadcast(self, payload):
            self.payloads.append(payload)
            return True

    srv = FakeServer()
    pub = TelemetryPublisher(srv, send_image=True, jpeg_quality=100,
                             burn_overlay=True)
    gray = np.zeros((24, 32), np.float32)
    xy = np.asarray([[10.0, 10.0]], np.float32)
    pub.publish(gray, xy, np.asarray([True]))
    doc = bson.decode(srv.payloads[0])
    import io
    from PIL import Image

    img = np.asarray(Image.open(io.BytesIO(doc["image"])))
    assert img[10, 10] > 180                 # the burned-in dot survived JPEG


def test_watchdog_detects_stall_and_rearms():
    from jetracer_orbslam2_tpu.runtime.liveness import Watchdog

    events = []
    wd = Watchdog(timeout_s=0.1, on_stall=events.append,
                  check_interval_s=0.02).start()
    try:
        # healthy phase: beats keep it quiet
        for _ in range(8):
            wd.beat()
            time.sleep(0.02)
        assert wd.stalls == 0
        # stall phase
        time.sleep(0.3)
        assert wd.stalls == 1 and len(events) == 1
        assert events[0] >= 0.1
        # one episode = one report, until the next beat re-arms
        time.sleep(0.2)
        assert wd.stalls == 1
        wd.beat()
        time.sleep(0.3)
        assert wd.stalls == 2
    finally:
        wd.close()
