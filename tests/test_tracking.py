"""Tracking unit tests + end-to-end synthetic odometry integration test."""

import numpy as np
import jax
import jax.numpy as jnp

from jetracer_orbslam2_tpu.config import FrontendConfig, TrackingConfig
from jetracer_orbslam2_tpu.models import frontend, tracking
from jetracer_orbslam2_tpu.io import synthetic
from jetracer_orbslam2_tpu.ops import geometry as geo
from jetracer_orbslam2_tpu import evaluation


def test_ransac_kabsch_with_outliers():
    rng = np.random.RandomState(0)
    w = rng.randn(3).astype(np.float32) * 0.3
    R = np.asarray(geo.so3_exp(jnp.asarray(w)))
    t = rng.randn(3).astype(np.float32) * 0.5
    src = rng.randn(128, 3).astype(np.float32)
    dst = src @ R.T + t
    dst[90:] += rng.uniform(1, 3, (38, 3))  # 30% outliers
    weights = np.ones(128, np.float32)
    rr = tracking.ransac_kabsch(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(weights),
        jax.random.PRNGKey(0), iters=128, thresh=0.02, min_inliers=8,
    )
    assert bool(rr.ok)
    T = np.asarray(rr.T)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-3)
    assert int(rr.num_inliers) >= 85


def test_ransac_insufficient_inliers_flags_not_ok():
    rng = np.random.RandomState(1)
    src = rng.randn(32, 3).astype(np.float32)
    dst = rng.randn(32, 3).astype(np.float32)  # unrelated
    rr = tracking.ransac_kabsch(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(32),
        jax.random.PRNGKey(1), iters=64, thresh=0.01, min_inliers=8,
    )
    assert not bool(rr.ok)
    np.testing.assert_allclose(np.asarray(rr.T), np.eye(4))


def test_icp_converges_small_motion():
    rng = np.random.RandomState(2)
    w = rng.randn(3).astype(np.float32) * 0.05
    R = np.asarray(geo.so3_exp(jnp.asarray(w)))
    t = rng.randn(3).astype(np.float32) * 0.03
    src = rng.randn(100, 3).astype(np.float32)
    dst = src @ R.T + t
    mask = jnp.ones(100, bool)
    T, err = tracking.icp(jnp.asarray(src), jnp.asarray(dst), mask, mask, iters=10)
    np.testing.assert_allclose(np.asarray(T)[:3, :3], R, atol=5e-3)
    np.testing.assert_allclose(np.asarray(T)[:3, 3], t, atol=5e-3)
    assert float(err) < 1e-3


def test_synthetic_renderer_depth_consistency():
    seq = synthetic.generate_sequence(n_frames=2, shape=(120, 160), seed=0)
    depth = np.asarray(seq.depth)
    assert (depth > 0).mean() > 0.99   # box is closed: every ray hits
    assert depth.max() < 10.0
    # straight-ahead pixel looks at the back wall 5m away from origin
    assert abs(depth[0, 60, 80] - 5.0) < 0.1


def test_end_to_end_synthetic_odometry():
    """Frame-to-frame tracking on a rendered sequence: ATE must be small.

    This is the capability the reference computes-but-discards
    (buildStream.cpp:583-584 forces identity poses) — here it must work.
    """
    shape = (240, 320)
    seq = synthetic.generate_sequence(n_frames=10, shape=shape, seed=3,
                                      step=0.03, yaw_rate=0.006)
    cfg = FrontendConfig(height=shape[0], width=shape[1],
                         num_levels=3, max_keypoints=512)
    tcfg = TrackingConfig(min_matches=10, min_inliers=8)

    feats = []
    for i in range(10):
        f = frontend.frontend_gray_depth(
            seq.gray[i], seq.depth[i], seq.intrinsics, cfg,
            min_depth=tcfg.min_depth, max_depth=tcfg.max_depth)
        feats.append(f)
        assert int(jnp.sum(f.valid)) > 100, f"too few keypoints on frame {i}"
        assert int(jnp.sum(f.has_point)) > 100

    T = jnp.eye(4)
    vel = jnp.eye(4)
    est = [np.eye(4)]
    key = jax.random.PRNGKey(0)
    for i in range(1, 10):
        key, k = jax.random.split(key)
        res = tracking.track_rgbd(feats[i - 1], feats[i], T, vel,
                                  seq.intrinsics, k, tcfg)
        assert bool(res.tracked_ok), (
            f"frame {i}: matches={int(res.num_matches)} "
            f"inliers={int(res.num_inliers)}")
        T, vel = res.T_wc, res.velocity
        est.append(np.asarray(T))

    est = jnp.asarray(np.stack(est))
    r = evaluation.ate(est, seq.poses[:10])
    assert float(r.rmse) < 0.05, f"ATE RMSE {float(r.rmse):.4f}m too high"


def test_ate_perfect_trajectory_is_zero():
    poses = synthetic.smooth_trajectory(20)
    r = evaluation.ate(poses, poses)
    assert float(r.rmse) < 1e-5


def test_ate_invariant_to_global_transform():
    rng = np.random.RandomState(4)
    poses = synthetic.smooth_trajectory(20)
    xi = jnp.asarray(rng.randn(6).astype(np.float32))
    T = geo.se3_exp(xi)
    moved = jnp.einsum("ij,njk->nik", T, poses)
    r = evaluation.ate(moved, poses)
    assert float(r.rmse) < 1e-4


def test_rpe_zero_for_identical():
    poses = synthetic.smooth_trajectory(15)
    t_err, r_err = evaluation.rpe(poses, poses)
    assert float(t_err) < 1e-5 and float(r_err) < 1e-3

def test_rpe_drift_measures_known_scale_error():
    """An estimate that travels 1% farther per step than ground truth has
    a translational drift rate of exactly 1% — rpe_drift recovers it, and
    rotation drift stays ~0 (the KITTI drift-per-meter convention)."""
    gt = np.tile(np.eye(4, dtype=np.float32), (30, 1, 1))
    est = gt.copy()
    step = 0.10
    for i in range(30):
        gt[i, 0, 3] = step * i
        est[i, 0, 3] = step * i * 1.01
    t_drift, r_drift = evaluation.rpe_drift(
        jnp.asarray(est), jnp.asarray(gt), delta=5)
    assert abs(float(t_drift) - 0.01) < 1e-4, float(t_drift)
    assert float(r_drift) < 1e-4


def test_rpe_drift_measures_known_rotation_drift():
    """A constant 0.01 rad heading error per meter traveled shows up as
    r_drift ~= 0.01 rad/m."""
    n, step = 40, 0.05
    gt = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    est = gt.copy()
    for i in range(n):
        gt[i, 0, 3] = step * i
        est[i, 0, 3] = step * i
        th = 0.01 * step * i                  # rad, grows with distance
        est[i, :3, :3] = np.asarray(
            [[np.cos(th), -np.sin(th), 0],
             [np.sin(th), np.cos(th), 0],
             [0, 0, 1]], np.float32)
    t_drift, r_drift = evaluation.rpe_drift(
        jnp.asarray(est), jnp.asarray(gt), delta=8)
    assert abs(float(r_drift) - 0.01) < 1e-3, float(r_drift)
