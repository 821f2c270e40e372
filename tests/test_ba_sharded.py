"""Sharded BA on an 8-device virtual mesh must match single-device BA."""

import numpy as np
import jax
import jax.numpy as jnp

from jetracer_orbslam2_tpu.config import BAConfig
from jetracer_orbslam2_tpu.models.backend.ba import bundle_adjust
from jetracer_orbslam2_tpu.parallel import (
    make_mesh, prepare_sharded_problem, sharded_bundle_adjust)

from test_ba import make_problem, INTR


def test_sharded_matches_single_device():
    rng = np.random.default_rng(0)
    prob, poses_gt, pts_gt = make_problem(rng, P=6, L=64)
    cfg = BAConfig(iters=8)

    poses_1, points_1, stats = bundle_adjust(prob, INTR, cfg)

    mesh = make_mesh(8)
    sprob = prepare_sharded_problem(prob, 8)
    poses_8, points_8, trace = sharded_bundle_adjust(sprob, INTR, cfg, mesh)

    # sharded must reach the same optimum as single-device (and be no worse
    # against GT; absolute GT error carries the mono scale gauge)
    err1 = np.linalg.norm(
        np.asarray(poses_1)[:, :3, 3] - poses_gt[:, :3, 3], axis=1)
    err8 = np.linalg.norm(
        np.asarray(poses_8)[:, :3, 3] - poses_gt[:, :3, 3], axis=1)
    assert err8.max() < err1.max() + 5e-3, (err1.max(), err8.max())
    np.testing.assert_allclose(
        np.asarray(poses_8), np.asarray(poses_1), atol=5e-3)
    # sharded points (padded) must match the single-device solution
    L = pts_gt.shape[0]
    np.testing.assert_allclose(
        np.asarray(points_8)[:L], np.asarray(points_1), atol=2e-2)
    # cost decreased
    tr = np.asarray(trace)
    assert tr[-1] < 0.2 * tr[0]


def test_sharded_n1_identity_path():
    """The 1-device mesh runs the same program and matches 8-device."""
    rng = np.random.default_rng(4)
    prob, poses_gt, _ = make_problem(rng, P=4, L=32)
    cfg = BAConfig(iters=5)
    m1 = make_mesh(1)
    p1 = prepare_sharded_problem(prob, 1)
    poses_a, _, _ = sharded_bundle_adjust(p1, INTR, cfg, m1)
    m8 = make_mesh(8)
    p8 = prepare_sharded_problem(prob, 8)
    poses_b, _, _ = sharded_bundle_adjust(p8, INTR, cfg, m8)
    np.testing.assert_allclose(np.asarray(poses_a), np.asarray(poses_b),
                               atol=5e-3)
