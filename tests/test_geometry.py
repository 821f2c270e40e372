import numpy as np
import jax.numpy as jnp
import pytest

from jetracer_orbslam2_tpu.ops import geometry as geo


def random_rotation(rng):
    a = rng.randn(3)
    a = a / np.linalg.norm(a) * rng.uniform(0.1, 3.0)
    return np.asarray(geo.so3_exp(jnp.asarray(a, jnp.float32)))


def test_so3_exp_log_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(32, 3).astype(np.float32)
    w = w / np.maximum(np.linalg.norm(w, axis=-1, keepdims=True), 1e-9)
    w = w * rng.uniform(1e-4, 3.0, (32, 1)).astype(np.float32)
    R = geo.so3_exp(jnp.asarray(w))
    w2 = np.asarray(geo.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_so3_exp_is_rotation():
    rng = np.random.RandomState(1)
    w = rng.randn(8, 3).astype(np.float32)
    R = np.asarray(geo.so3_exp(jnp.asarray(w)))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99


def test_se3_exp_log_roundtrip():
    rng = np.random.RandomState(2)
    xi = rng.randn(16, 6).astype(np.float32) * 0.5
    T = geo.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(geo.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_se3_exp_zero_is_identity():
    T = np.asarray(geo.se3_exp(jnp.zeros(6, jnp.float32)))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-6)


def test_pose_inverse():
    rng = np.random.RandomState(3)
    xi = rng.randn(6).astype(np.float32)
    T = geo.se3_exp(jnp.asarray(xi))
    I = np.asarray(T @ geo.pose_inverse(T))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_project_deproject_roundtrip():
    rng = np.random.RandomState(4)
    intr = jnp.asarray([525.0, 525.0, 319.5, 239.5], jnp.float32)
    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.5, 5.0, 64)
    uv = geo.project(jnp.asarray(pts), intr)
    pts2 = np.asarray(geo.deproject(uv, jnp.asarray(pts[:, 2]), intr))
    np.testing.assert_allclose(pts2, pts, atol=1e-3)


def test_project_deproject_with_distortion():
    rng = np.random.RandomState(5)
    intr = jnp.asarray([435.0, 435.0, 367.0, 252.0], jnp.float32)
    dist = jnp.asarray([-0.28, 0.07, 1e-4, -2e-5, 0.0], jnp.float32)
    pts = rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.0, 4.0, 32)
    uv = geo.project(jnp.asarray(pts), intr, dist)
    pts2 = np.asarray(geo.deproject(uv, jnp.asarray(pts[:, 2]), intr, dist))
    np.testing.assert_allclose(pts2, pts, atol=1e-2)


def test_kabsch_recovers_rigid_transform():
    rng = np.random.RandomState(6)
    R = random_rotation(rng)
    t = rng.randn(3).astype(np.float32)
    src = rng.randn(50, 3).astype(np.float32)
    dst = src @ R.T + t
    T = np.asarray(geo.kabsch(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-4)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-4)


def test_kabsch_weighted_ignores_outliers():
    rng = np.random.RandomState(7)
    R = random_rotation(rng)
    t = rng.randn(3).astype(np.float32)
    src = rng.randn(60, 3).astype(np.float32)
    dst = src @ R.T + t
    dst[50:] += 100.0  # gross outliers
    w = np.ones(60, np.float32)
    w[50:] = 0.0
    T = np.asarray(geo.kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-4)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-4)


def test_kabsch_batched():
    rng = np.random.RandomState(8)
    Rs = np.stack([random_rotation(rng) for _ in range(4)])
    ts = rng.randn(4, 3).astype(np.float32)
    src = rng.randn(4, 20, 3).astype(np.float32)
    dst = np.einsum("bij,bnj->bni", Rs, src) + ts[:, None]
    T = np.asarray(geo.kabsch(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(T[:, :3, :3], Rs, atol=1e-4)
    np.testing.assert_allclose(T[:, :3, 3], ts, atol=1e-4)


def test_kabsch_degenerate_reflection_guard():
    # coplanar points that could invite a reflection solution
    rng = np.random.RandomState(9)
    src = rng.randn(30, 3).astype(np.float32)
    src[:, 2] = 0.0
    R = random_rotation(rng)
    dst = src @ R.T
    T = np.asarray(geo.kabsch(jnp.asarray(src), jnp.asarray(dst)))
    assert np.linalg.det(T[:3, :3]) > 0.99
