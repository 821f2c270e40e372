"""Dataset loaders (on generated fixture trees) + stereo front-end."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from jetracer_orbslam2_tpu.io import synthetic
from jetracer_orbslam2_tpu.io.datasets import (
    EurocStereo, KittiOdometry, TumRGBD, open_dataset)


def _png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    if arr.dtype == np.uint16:
        Image.fromarray(arr, mode="I;16").save(path)
    else:
        Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tum"))
    n = 4
    rgb_lines, dep_lines, gt_lines = [], [], []
    rng = np.random.default_rng(0)
    for i in range(n):
        ts = 100.0 + 0.05 * i
        rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        dep = (rng.uniform(0.5, 4.0, (48, 64)) * 5000).astype(np.uint16)
        _png(os.path.join(root, "rgb", f"{ts:.6f}.png"), rgb)
        _png(os.path.join(root, "depth", f"{ts + 0.004:.6f}.png"), dep)
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        dep_lines.append(f"{ts + 0.004:.6f} depth/{ts + 0.004:.6f}.png")
        gt_lines.append(f"{ts:.6f} {0.1 * i:.3f} 0 0 0 0 0 1")
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", dep_lines),
                        ("groundtruth.txt", gt_lines)]:
        with open(os.path.join(root, name), "w") as f:
            f.write("# header\n" + "\n".join(lines) + "\n")
    return root


def test_tum_loader(tum_dir):
    ds = TumRGBD(tum_dir)
    assert len(ds) == 4
    f = ds.frame(0)
    assert f.gray.shape == (48, 64) and f.gray.dtype == np.float32
    assert f.depth.shape == (48, 64)
    assert 0.4 < f.depth.mean() < 4.1     # meters after 1/5000 scaling
    assert ds.groundtruth.shape == (4, 4, 4)
    np.testing.assert_allclose(ds.groundtruth[2][:3, 3], [0.2, 0, 0],
                               atol=1e-6)
    assert isinstance(open_dataset(tum_dir), TumRGBD)


@pytest.fixture(scope="module")
def euroc_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("euroc"))
    n = 3
    rng = np.random.default_rng(1)
    lines_l, lines_r, gt = [], [], ["#ts,px,py,pz,qw,qx,qy,qz"]
    for i in range(n):
        ts_ns = 1_000_000_000 + i * 50_000_000
        img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        _png(os.path.join(root, "cam0", "data", f"{ts_ns}.png"), img)
        _png(os.path.join(root, "cam1", "data", f"{ts_ns}.png"), img)
        lines_l.append(f"{ts_ns},{ts_ns}.png")
        lines_r.append(f"{ts_ns},{ts_ns}.png")
        gt.append(f"{ts_ns},{0.2 * i},0,0,1,0,0,0")
    for cam, lines in [("cam0", lines_l), ("cam1", lines_r)]:
        with open(os.path.join(root, cam, "data.csv"), "w") as f:
            f.write("#ts,name\n" + "\n".join(lines) + "\n")
    os.makedirs(os.path.join(root, "state_groundtruth_estimate0"))
    with open(os.path.join(
            root, "state_groundtruth_estimate0", "data.csv"), "w") as f:
        f.write("\n".join(gt) + "\n")
    return root


def test_euroc_loader(euroc_dir):
    ds = EurocStereo(euroc_dir)
    assert len(ds) == 3
    f = ds.frame(1)
    assert f.gray.shape == (48, 64)
    assert f.right.shape == (48, 64)
    assert f.depth is None
    assert ds.baseline > 0.1
    np.testing.assert_allclose(ds.groundtruth[1][:3, 3], [0.2, 0, 0],
                               atol=1e-6)
    assert isinstance(open_dataset(euroc_dir), EurocStereo)


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    n = 3
    rng = np.random.default_rng(2)
    for i in range(n):
        img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        _png(os.path.join(root, "image_0", f"{i:06d}.png"), img)
        _png(os.path.join(root, "image_1", f"{i:06d}.png"), img)
    with open(os.path.join(root, "times.txt"), "w") as f:
        f.write("\n".join(f"{0.1 * i:.6f}" for i in range(n)))
    with open(os.path.join(root, "calib.txt"), "w") as f:
        fx = 718.856
        f.write(
            f"P0: {fx} 0 607.19 0 0 {fx} 185.2 0 0 0 1 0\n"
            f"P1: {fx} 0 607.19 {-fx * 0.5371} 0 {fx} 185.2 0 0 0 1 0\n")
    with open(os.path.join(root, "poses.txt"), "w") as f:
        for i in range(n):
            f.write(f"1 0 0 {0.5 * i} 0 1 0 0 0 0 1 0\n")
    return root


def test_kitti_loader(kitti_dir):
    ds = KittiOdometry(kitti_dir)
    assert len(ds) == 3
    f = ds.frame(2)
    assert f.gray.shape == (48, 64) and f.right.shape == (48, 64)
    assert abs(ds.baseline - 0.5371) < 1e-4
    np.testing.assert_allclose(ds.groundtruth[2][:3, 3], [1.0, 0, 0],
                               atol=1e-6)   # row-major 3x4 layout
    assert isinstance(open_dataset(kitti_dir), KittiOdometry)


def test_stereo_frontend_depth_matches_gt():
    """Stereo-matched keypoint depth must agree with the renderer's GT."""
    from jetracer_orbslam2_tpu.config import FrontendConfig
    from jetracer_orbslam2_tpu.models.stereo import frontend_stereo

    H, W = 240, 320
    seq = synthetic.generate_stereo_sequence(
        n_frames=1, shape=(H, W), baseline=0.2)
    cfg = FrontendConfig(height=H, width=W, num_levels=3, max_keypoints=512)
    f = frontend_stereo(
        seq.left[0], seq.right[0], seq.intrinsics, seq.baseline, cfg,
        max_depth=20.0)
    n_depth = int(f.has_point.sum())
    assert n_depth > 100, n_depth
    xy = np.asarray(f.xy).astype(int)
    gt_z = np.asarray(seq.depth[0])[
        np.clip(xy[:, 1], 0, H - 1), np.clip(xy[:, 0], 0, W - 1)]
    est_z = np.asarray(f.points)[:, 2]
    mask = np.asarray(f.has_point)
    rel_err = np.abs(est_z[mask] - gt_z[mask]) / gt_z[mask]
    # sub-pixel disparity quantization limits accuracy; median must be tight
    assert np.median(rel_err) < 0.05, np.median(rel_err)
    assert (rel_err < 0.15).mean() > 0.85


def test_stereo_odometry_end_to_end():
    """Frame-to-frame tracking on synthetic stereo (no depth sensor)."""
    from jetracer_orbslam2_tpu.config import FrontendConfig, TrackingConfig
    from jetracer_orbslam2_tpu.models.stereo import frontend_stereo
    from jetracer_orbslam2_tpu.models import tracking
    from jetracer_orbslam2_tpu.evaluation import ate
    import jax

    H, W, N = 240, 320, 10
    seq = synthetic.generate_stereo_sequence(
        n_frames=N, shape=(H, W), baseline=0.2, step=0.03)
    cfg = FrontendConfig(height=H, width=W, num_levels=3, max_keypoints=512)
    tcfg = TrackingConfig()
    feats = [frontend_stereo(seq.left[i], seq.right[i], seq.intrinsics,
                             seq.baseline, cfg, max_depth=20.0)
             for i in range(N)]
    T = jnp.eye(4)
    vel = jnp.eye(4)
    poses = [np.eye(4)]
    key = jax.random.PRNGKey(0)
    for i in range(1, N):
        key, sub = jax.random.split(key)
        res = tracking.track_rgbd(
            feats[i - 1], feats[i], T, vel, seq.intrinsics, sub, tcfg)
        T, vel = res.T_wc, res.velocity
        assert bool(res.tracked_ok), i
        poses.append(np.asarray(T))
    r = ate(jnp.asarray(np.stack(poses)), seq.poses[:N])
    # NOTE on the bound: on this slow synthetic scene the UNREFINED
    # integer disparities score ~0.005 because the renderer re-quantizes
    # the same features into identical pixel bins every frame, so their
    # depth errors cancel exactly in frame-to-frame Kabsch — a synthetic
    # artifact real footage does not have.  Subpixel disparity refinement
    # (models/stereo._refine_disparity) trades that accidental correlation
    # for honestly-unbiased depth, which wins decisively on the map-based
    # SLAM paths (tests/test_cli_stereo_fixtures.py) at slightly worse
    # frame-to-frame numbers here.
    assert float(r.rmse) < 0.06, float(r.rmse)
