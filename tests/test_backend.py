"""Pose graph, loop closure, and full-SLAM integration tests."""

import numpy as np
import jax
import jax.numpy as jnp

from jetracer_orbslam2_tpu.config import (
    PoseGraphConfig, SystemConfig, FrontendConfig, MapConfig)
from jetracer_orbslam2_tpu.models.backend.pose_graph import (
    PoseGraphProblem, optimize_pose_graph)
from jetracer_orbslam2_tpu.ops import geometry as geo


def _yaw(th):
    T = np.eye(4, dtype=np.float32)
    T[0, 0] = T[2, 2] = np.cos(th)
    T[0, 2] = np.sin(th)
    T[2, 0] = -np.sin(th)
    return T


def make_ring(P=12, radius=2.0, drift=0.02, rng=None):
    """Ground-truth poses on a closed ring + drifted odometry estimates."""
    gt = []
    for k in range(P):
        th = 2 * np.pi * k / P
        T = _yaw(th)
        T[0, 3] = radius * np.sin(th)
        T[2, 3] = radius * (1 - np.cos(th))
        gt.append(T.astype(np.float32))
    gt = np.stack(gt)
    # odometry measurements with systematic drift
    rel = np.stack([np.linalg.inv(gt[k]) @ gt[k + 1] for k in range(P - 1)])
    rng = rng or np.random.default_rng(0)
    est = [gt[0]]
    for k in range(P - 1):
        noise = geo.se3_exp(jnp.asarray(
            rng.normal(0, drift, 6).astype(np.float32)))
        est.append(est[-1] @ rel[k] @ np.asarray(noise))
    return gt, np.stack(est), rel


def test_pose_graph_closes_ring():
    gt, est, rel = make_ring()
    P = len(gt)
    # edges: odometry chain with TRUE relative measurements + loop edge
    edge_i = np.arange(P - 1, dtype=np.int32)
    edge_j = edge_i + 1
    edge_T = rel
    # loop edge last->first with the true relative pose
    loop_T = np.linalg.inv(gt[-1]) @ gt[0]
    prob = PoseGraphProblem(
        poses=jnp.asarray(est),
        edge_i=jnp.asarray(np.concatenate([edge_i, [P - 1]])),
        edge_j=jnp.asarray(np.concatenate([edge_j, [0]])),
        edge_T=jnp.asarray(np.concatenate([edge_T, loop_T[None]])),
        edge_weight=jnp.ones(P, jnp.float32),
        fixed=jnp.asarray([True] + [False] * (P - 1)),
    )
    before = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1).max()
    poses, trace = optimize_pose_graph(prob, PoseGraphConfig(iters=20))
    after = np.linalg.norm(
        np.asarray(poses)[:, :3, 3] - gt[:, :3, 3], axis=1).max()
    tr = np.asarray(trace)
    assert tr[-1] < 1e-5 * tr[0] + 1e-8, tr
    assert after < 0.3 * before, (before, after)


def test_pose_graph_identity_when_consistent():
    gt, est, rel = make_ring(drift=0.0)
    P = len(gt)
    prob = PoseGraphProblem(
        poses=jnp.asarray(gt),
        edge_i=jnp.asarray(np.arange(P - 1, dtype=np.int32)),
        edge_j=jnp.asarray(np.arange(1, P, dtype=np.int32)),
        edge_T=jnp.asarray(rel),
        edge_weight=jnp.ones(P - 1, jnp.float32),
        fixed=jnp.asarray([True] + [False] * (P - 1)),
    )
    poses, trace = optimize_pose_graph(prob, PoseGraphConfig(iters=5))
    np.testing.assert_allclose(np.asarray(poses), gt, atol=1e-4)


def _slam_cfg(H, W):
    return SystemConfig(
        frontend=FrontendConfig(height=H, width=W, num_levels=3,
                                max_keypoints=512),
        map=MapConfig(max_keyframes=32, max_landmarks=4096, max_obs=16384,
                      window_size=4),
    )


def test_slam_end_to_end_synthetic():
    from jetracer_orbslam2_tpu.io.synthetic import generate_sequence
    from jetracer_orbslam2_tpu.models.slam import Slam
    from jetracer_orbslam2_tpu.evaluation import ate

    H, W, N = 240, 320, 40
    seq = generate_sequence(n_frames=N, shape=(H, W), step=0.03)
    cfg = _slam_cfg(H, W)
    slam = Slam(cfg, seq.intrinsics)
    for i in range(N):
        slam.process_frame(seq.gray[i], seq.depth[i])
    out = slam.result()
    assert out.tracked.all(), out.tracked
    assert out.num_keyframes >= 2
    assert out.num_landmarks > 100
    r = ate(jnp.asarray(out.poses), seq.poses[:N])
    assert float(r.rmse) < 0.06, float(r.rmse)


def test_map_landmarks_survive_roundtrip():
    """Landmark positions from keyframe insertion must be world-consistent:
    re-projecting a landmark into its reference keyframe lands on the
    keypoint it came from."""
    from jetracer_orbslam2_tpu.io.synthetic import generate_sequence
    from jetracer_orbslam2_tpu.models.slam import Slam

    H, W, N = 240, 320, 8
    seq = generate_sequence(n_frames=N, shape=(H, W))
    cfg = _slam_cfg(H, W)
    slam = Slam(cfg, seq.intrinsics)
    for i in range(N):
        slam.process_frame(seq.gray[i], seq.depth[i])
    m = slam.m
    nlm = int(m.num_lm)
    assert nlm > 50
    lm = np.asarray(m.lm_pos[:nlm])
    ref = np.asarray(m.lm_ref_kf[:nlm])
    T = np.asarray(m.kf_pose)
    fx, fy, cx, cy = np.asarray(seq.intrinsics)
    ok = 0
    for j in range(min(nlm, 200)):
        Tcw = np.linalg.inv(T[ref[j]])
        pc = Tcw[:3, :3] @ lm[j] + Tcw[:3, 3]
        if pc[2] > 0.1:
            u, v = fx * pc[0] / pc[2] + cx, fy * pc[1] / pc[2] + cy
            if 0 <= u < W and 0 <= v < H:
                ok += 1
    assert ok > 0.9 * min(nlm, 200)
