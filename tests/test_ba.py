"""Bundle adjustment: synthetic convergence tests.

Builds a known world (random landmarks, circular camera ring), perturbs
poses+points, and asserts LM with Schur complement recovers them.  The
reference has nothing comparable to test against (its pose output is
identity, src/SlamGpuPipeline/buildStream.cpp:583-584), so the oracle is
the generating ground truth itself.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jetracer_orbslam2_tpu.config import BAConfig
from jetracer_orbslam2_tpu.models.backend.ba import BAProblem, bundle_adjust
from jetracer_orbslam2_tpu.ops import geometry as geo

INTR = jnp.array([500.0, 500.0, 320.0, 240.0], jnp.float32)


def make_problem(rng, P=6, L=200, noise_px=0.5, pose_noise=0.03,
                 point_noise=0.05):
    # landmarks in a box in front of the ring
    pts_gt = rng.uniform([-2, -2, 4], [2, 2, 8], size=(L, 3)).astype(np.float32)
    poses_gt = []
    for i in range(P):
        ang = 0.08 * i
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]], np.float32)
        t = np.array([0.4 * i, 0.05 * i, 0.0], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        poses_gt.append(T)
    poses_gt = np.stack(poses_gt)  # T_wc

    # observations: every landmark seen from every pose (if in front)
    obs_kf, obs_lm, obs_uv = [], [], []
    for i in range(P):
        T_cw = np.linalg.inv(poses_gt[i])
        pc = pts_gt @ T_cw[:3, :3].T + T_cw[:3, 3]
        uv = pc[:, :2] / pc[:, 2:3] * 500.0 + np.array([320.0, 240.0])
        ok = pc[:, 2] > 0.5
        for j in np.nonzero(ok)[0]:
            obs_kf.append(i)
            obs_lm.append(j)
            obs_uv.append(uv[j] + rng.normal(0, noise_px, 2))
    E = len(obs_kf)

    # perturb initial guess (first pose fixed = gauge)
    poses0 = poses_gt.copy()
    for i in range(1, P):
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        poses0[i] = np.asarray(geo.se3_exp(jnp.asarray(xi))) @ poses0[i]
    pts0 = pts_gt + rng.normal(0, point_noise, (L, 3)).astype(np.float32)

    fixed = np.zeros(P, bool)
    fixed[0] = True
    # pure reprojection problem (no depth residuals): exercises the mono
    # path; depth-anchored behavior is covered in test_ba_depth_residuals
    prob = BAProblem.without_depth(
        poses=jnp.asarray(poses0),
        points=jnp.asarray(pts0),
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_lm=jnp.asarray(obs_lm, jnp.int32),
        obs_uv=jnp.asarray(np.stack(obs_uv), jnp.float32),
        obs_valid=jnp.ones(E, bool),
        fixed=jnp.asarray(fixed),
    )
    return prob, poses_gt, pts_gt


def test_ba_converges():
    rng = np.random.default_rng(0)
    prob, poses_gt, pts_gt = make_problem(rng)
    poses, points, stats = bundle_adjust(prob, INTR, BAConfig(iters=15))
    # cost must drop by a large factor
    assert float(stats.cost[-1]) < 0.05 * float(stats.cost[0])
    # pose translation error small
    err = np.linalg.norm(np.asarray(poses)[:, :3, 3] - poses_gt[:, :3, 3], axis=1)
    assert err.max() < 0.01, err
    rot_err = [np.linalg.norm(np.asarray(
        geo.so3_log(jnp.asarray(np.asarray(poses)[i, :3, :3] @ poses_gt[i, :3, :3].T))))
        for i in range(len(poses_gt))]
    assert max(rot_err) < 0.005


def test_ba_noise_free_exact():
    rng = np.random.default_rng(1)
    prob, poses_gt, pts_gt = make_problem(rng, noise_px=0.0)
    # reprojection-only BA has a scale gauge; fix two poses (at GT) to pin it
    prob = prob._replace(
        poses=prob.poses.at[1].set(jnp.asarray(poses_gt[1])),
        fixed=prob.fixed.at[1].set(True))
    poses, points, stats = bundle_adjust(prob, INTR, BAConfig(iters=15))
    assert float(stats.cost[-1]) < 1e-4
    err = np.linalg.norm(np.asarray(poses)[:, :3, 3] - poses_gt[:, :3, 3], axis=1)
    assert err.max() < 1e-3


def test_ba_respects_gauge():
    rng = np.random.default_rng(2)
    prob, poses_gt, _ = make_problem(rng)
    poses, _, _ = bundle_adjust(prob, INTR, BAConfig(iters=5))
    np.testing.assert_allclose(np.asarray(poses)[0], poses_gt[0], atol=1e-6)


def test_ba_depth_residuals_anchor_scale():
    """With depth measurements, ONE fixed pose suffices: the scale gauge
    that plagues reprojection-only BA (see test_ba_noise_free_exact) is
    pinned by the z residuals."""
    rng = np.random.default_rng(5)
    prob, poses_gt, pts_gt = make_problem(rng, noise_px=0.0)
    # attach perfect depth measurements from GT geometry
    Tcw = np.linalg.inv(poses_gt)
    pc = np.einsum("eij,ej->ei",
                   Tcw[np.asarray(prob.obs_kf)][:, :3, :3],
                   pts_gt[np.asarray(prob.obs_lm)]) \
        + Tcw[np.asarray(prob.obs_kf)][:, :3, 3]
    prob = prob._replace(
        obs_z=jnp.asarray(pc[:, 2].astype(np.float32)),
        obs_z_valid=jnp.ones(prob.obs_kf.shape[0], bool))
    poses, points, stats = bundle_adjust(prob, INTR, BAConfig(iters=15))
    err = np.linalg.norm(np.asarray(poses)[:, :3, 3] - poses_gt[:, :3, 3],
                         axis=1)
    assert err.max() < 1e-3, err
    assert float(stats.cost[-1]) < 1e-3


def test_ba_invalid_obs_ignored():
    rng = np.random.default_rng(3)
    prob, poses_gt, pts_gt = make_problem(rng, noise_px=0.0)
    # corrupt half the measurements but mark them invalid
    E = prob.obs_uv.shape[0]
    bad = np.zeros(E, bool)
    bad[::2] = True
    uv = np.asarray(prob.obs_uv).copy()
    uv[bad] += 500.0
    prob = prob._replace(
        obs_uv=jnp.asarray(uv), obs_valid=jnp.asarray(~bad))
    poses, points, stats = bundle_adjust(prob, INTR, BAConfig(iters=15))
    assert float(stats.cost[-1]) < 1e-4

def test_fused_pallas_ba_matches_xla_solver():
    """The fused Pallas normal-equations/Schur kernels (ops/pallas_ba,
    interpreter mode on CPU) reproduce the XLA dense solver: same cost
    trace, same poses, same points.  On TPU the same kernels run compiled
    (gated by use_pallas_ba); scripts/bench_ba_fused.py measures them."""
    from jetracer_orbslam2_tpu.models.backend import ba as ba_core

    rng = np.random.RandomState(11)
    # P must be 8 (the kernel's sublane layout); L exercises tile padding
    prob, _, _ = make_problem(rng, P=8, L=300)
    cfg = BAConfig(iters=5)
    P, L = prob.poses.shape[0], prob.points.shape[0]
    obs, _ = ba_core.edges_to_dense(
        P, L, prob.obs_kf, prob.obs_lm, prob.obs_uv, prob.obs_z,
        prob.obs_z_valid, prob.obs_valid)
    poses_cw = jax.vmap(geo.pose_inverse)(prob.poses)
    lm_valid = jnp.ones(L, bool)

    p1, x1, t1 = ba_core.lm_run_dense(
        poses_cw, prob.points, obs, prob.fixed, lm_valid,
        INTR, cfg, fused=False)
    p2, x2, t2 = ba_core.lm_run_dense(
        poses_cw, prob.points, obs, prob.fixed, lm_valid,
        INTR, cfg, fused="interpret")
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=5e-3)
    assert float(jnp.max(jnp.abs(p1 - p2))) < 5e-3
    assert float(jnp.max(jnp.abs(x1 - x2))) < 2e-2
