"""Camera distortion plumbed end-to-end (VERDICT round-3 item 1).

The reference applies Brown-Conrady/FTheta inside its production align
kernels on every frame (reference src/cuda/cuda-align.cu:23-109, used by
the deproject/project paths at :121-187).  Here the models run at the
KEYPOINT level: detection on the raw image, coordinates undistorted once
(ops/geometry.undistort_pixels), optionally rotated into a rectified
stereo frame (io/datasets.stereo_rectify_rotations — Bouguet).  These
tests pin (a) the math, (b) the RGB-D and stereo production paths on
geometrically exact distorted renders, and (c) the CLI on the committed
non-pre-rectified EuRoC-layout fixture.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jetracer_orbslam2_tpu.ops import geometry as geo

DIST = (-0.25, 0.06, 5e-4, 5e-4, 0.0)
EUROC_DIST = os.path.join(os.path.dirname(__file__), "fixtures",
                          "euroc_tiny_dist", "mav0")


def test_undistort_pixels_roundtrip():
    intr = jnp.asarray([300.0, 310.0, 160.0, 120.0])
    dist = jnp.asarray(DIST)
    xy = jnp.asarray(np.random.RandomState(0).uniform(
        [20, 20], [300, 220], (64, 2)), jnp.float32)
    ud = geo.undistort_pixels(xy, intr, dist)
    back = geo.distort_pixels(ud, intr, dist)
    np.testing.assert_allclose(back, xy, atol=2e-3)
    # no-op without distortion (up to the normalize/denormalize round trip)
    np.testing.assert_allclose(geo.undistort_pixels(xy, intr, None), xy,
                               atol=1e-4)


def test_undistort_pixels_with_rectifying_rotation():
    intr = jnp.asarray([300.0, 300.0, 160.0, 120.0])
    dist = jnp.asarray(DIST)
    rect = geo.so3_exp(jnp.asarray([0.01, -0.02, 0.005]))
    xy = jnp.asarray(np.random.RandomState(1).uniform(
        [40, 40], [280, 200], (64, 2)), jnp.float32)
    ud = geo.undistort_pixels(xy, intr, dist, rect=rect)
    back = geo.distort_pixels(ud, intr, dist, rect=rect)
    np.testing.assert_allclose(back, xy, atol=2e-3)


def test_stereo_rectify_rotations_properties():
    from jetracer_orbslam2_tpu.io.datasets import (
        _rodrigues_exp, stereo_rectify_rotations)

    rng = np.random.RandomState(3)
    for _ in range(5):
        R = _rodrigues_exp(rng.uniform(-0.05, 0.05, 3))
        t = np.asarray([-0.11, 0.0, 0.0]) + rng.uniform(-0.01, 0.01, 3)
        R_l, R_r, b = stereo_rectify_rotations(R, t)
        assert abs(b - np.linalg.norm(t)) < 1e-9
        # consistency: R_l = R_r @ R  (common frame for both cameras)
        np.testing.assert_allclose(R_l, R_r @ R, atol=1e-6)
        # baseline lands on -x for cam1: R_r t = (-b, 0, 0)
        np.testing.assert_allclose(R_r @ t, [-b, 0, 0], atol=1e-7)
        # proper rotations
        np.testing.assert_allclose(np.linalg.det(R_l), 1.0, atol=1e-6)
        np.testing.assert_allclose(R_l @ R_l.T, np.eye(3), atol=1e-6)


def _odometry_ate_cm(seq, dist, n):
    from jetracer_orbslam2_tpu.config import FrontendConfig, TrackingConfig
    from jetracer_orbslam2_tpu.evaluation import ate
    from jetracer_orbslam2_tpu.models.odometry import (
        init_state, odometry_scan)

    h, w = seq.gray.shape[1:]
    fcfg = FrontendConfig(height=h, width=w, dist=dist)
    tcfg = TrackingConfig()
    st = init_state(seq.gray[0], seq.depth[0], seq.intrinsics, fcfg, tcfg)
    _, poses, ok = odometry_scan(
        st, seq.gray[1:], seq.depth[1:], seq.intrinsics, fcfg, tcfg)
    poses = np.concatenate([np.eye(4)[None], np.asarray(poses)])
    return (float(ate(jnp.asarray(poses), seq.poses[:n]).rmse) * 100.0,
            float(np.mean(np.asarray(ok))))


def test_rgbd_odometry_on_distorted_camera():
    """Distorted RGB-D camera with cfg.dist tracks as well as the
    undistorted twin; production path = models/odometry (the same
    frontend_gray_depth the full SLAM system uses)."""
    from jetracer_orbslam2_tpu.io.synthetic import generate_sequence

    n = 12
    seq_u = generate_sequence(n_frames=n, shape=(240, 320))
    seq_d = generate_sequence(n_frames=n, shape=(240, 320), dist=DIST)
    ate_u, ok_u = _odometry_ate_cm(seq_u, None, n)
    ate_d, ok_d = _odometry_ate_cm(seq_d, DIST, n)
    assert ok_u == 1.0 and ok_d == 1.0
    assert ate_u < 1.0
    assert ate_d < max(2.0 * ate_u, 1.0), (ate_d, ate_u)


def test_stereo_frontend_keypoint_rectification():
    """Distorted + tilted-right-camera stereo rig: keypoint-level
    rectification recovers metric depth (checked against the renderer's
    exact depth) while the naive pre-rectified path is badly biased."""
    from jetracer_orbslam2_tpu.config import FrontendConfig
    from jetracer_orbslam2_tpu.io.datasets import stereo_rectify_rotations
    from jetracer_orbslam2_tpu.io.synthetic import generate_stereo_sequence
    from jetracer_orbslam2_tpu.models.stereo import frontend_stereo

    dist_r = (-0.22, 0.05, -4e-4, 3e-4, 0.0)
    rot = (0.008, -0.015, 0.004)
    seq = generate_stereo_sequence(
        n_frames=2, shape=(240, 320), dist_l=DIST, dist_r=dist_r,
        right_rotation=rot)
    # rig extrinsics exactly as the loader would derive them
    shift = np.eye(4)
    shift[0, 3] = seq.baseline
    shift[:3, :3] = np.asarray(geo.so3_exp(jnp.asarray(rot)))
    T_c1_c0 = np.linalg.inv(shift)
    R_l, R_r, b = stereo_rectify_rotations(T_c1_c0[:3, :3], T_c1_c0[:3, 3])

    cfg = FrontendConfig(height=240, width=320, num_levels=3,
                         max_keypoints=256, dist=DIST)
    feats = frontend_stereo(
        seq.left[0], seq.right[0], seq.intrinsics, b, cfg,
        dist_r=dist_r,
        rect_l=tuple(float(x) for x in R_l.ravel()),
        rect_r=tuple(float(x) for x in R_r.ravel()))
    # ground-truth camera-frame points: deproject the RAW keypoint pixel
    # through the exact distortion model with the rendered depth.  The
    # frontend's points live in the RECTIFIED frame: compare through R_l.
    has = np.asarray(feats.has_point)
    assert has.sum() >= 60, has.sum()
    pts_rect = np.asarray(feats.points)[has]
    # raw keypoint coords: re-distort the published rectified coords
    xy_raw = np.asarray(geo.distort_pixels(
        feats.xy, seq.intrinsics, jnp.asarray(DIST),
        rect=jnp.asarray(R_l)))[has]
    xi = np.clip(np.round(xy_raw[:, 0]).astype(int), 0, 319)
    yi = np.clip(np.round(xy_raw[:, 1]).astype(int), 0, 239)
    z_gt = np.asarray(seq.depth[0])[yi, xi]
    pts_gt_raw = np.asarray(geo.deproject(
        jnp.asarray(xy_raw, jnp.float32), jnp.asarray(z_gt, jnp.float32),
        seq.intrinsics, jnp.asarray(DIST)))
    pts_gt_rect = pts_gt_raw @ np.asarray(R_l).T
    err = np.linalg.norm(pts_rect - pts_gt_rect, axis=-1)
    rel = err / np.maximum(z_gt, 0.1)
    # median relative 3D error small with the calibration...
    assert np.median(rel) < 0.03, np.median(rel)

    # ...and markedly worse when the rig is treated as pre-rectified
    cfg_naive = FrontendConfig(height=240, width=320, num_levels=3,
                               max_keypoints=256)
    feats_n = frontend_stereo(
        seq.left[0], seq.right[0], seq.intrinsics, b, cfg_naive)
    has_n = np.asarray(feats_n.has_point)
    z_n = np.asarray(feats_n.points)[has_n][:, 2]
    xy_n = np.asarray(feats_n.xy)[has_n]
    xi = np.clip(np.round(xy_n[:, 0]).astype(int), 0, 319)
    yi = np.clip(np.round(xy_n[:, 1]).astype(int), 0, 239)
    z_gt_n = np.asarray(seq.depth[0])[yi, xi]
    rel_n = np.abs(z_n - z_gt_n) / np.maximum(z_gt_n, 0.1)
    assert np.median(rel_n) > 2.0 * np.median(rel), (
        np.median(rel_n), np.median(rel))


def test_euroc_dist_loader_parses_calibration():
    from jetracer_orbslam2_tpu.io.datasets import open_dataset

    ds = open_dataset(EUROC_DIST)
    assert ds.dist is not None and abs(ds.dist[0] + 0.25) < 1e-6
    assert ds.dist_r is not None and abs(ds.dist_r[0] + 0.22) < 1e-6
    assert ds.dist_model == "brown_conrady"
    assert ds.rect_l is not None and ds.rect_r is not None
    R_l = np.asarray(ds.rect_l).reshape(3, 3)
    np.testing.assert_allclose(R_l @ R_l.T, np.eye(3), atol=1e-5)
    # baseline recovered from the T_BS extrinsics, not a yaml shorthand
    assert abs(ds.baseline - 0.110074) < 1e-4


def test_cli_euroc_dist_fixture_end_to_end():
    """The committed NON-pre-rectified fixture through the production CLI:
    tracks with ATE comparable to its pre-rectified twin
    (tests/test_cli_stereo_fixtures.py::test_cli_euroc_fixture_end_to_end
    asserts < 0.2 on euroc_tiny)."""
    snippet = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; from jetracer_orbslam2_tpu.run import main; "
        f"sys.exit(main(['--dataset', {EUROC_DIST!r}, '--levels', '3', "
        "'--max-keypoints', '256', '--json']))"
    )
    r = subprocess.run([sys.executable, "-c", snippet],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["frames"] == 16
    assert report["tracked_frac"] > 0.9
    assert report["ate_rmse_m"] < 0.2, report
