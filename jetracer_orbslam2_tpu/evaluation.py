"""Trajectory evaluation: ATE / RPE against ground truth.

The reference has no evaluation at all (SURVEY.md §4); these are the standard
TUM RGB-D benchmark metrics (Sturm et al.), implemented in jnp so they run on
device and batch over trajectories.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import jax

from jetracer_orbslam2_tpu.ops import geometry as geo

Array = jax.Array


class AteResult(NamedTuple):
    rmse: Array
    mean: Array
    median: Array
    max: Array
    T_align: Array  # (4, 4) similarity/rigid alignment est -> gt


def umeyama_alignment(src: Array, dst: Array, with_scale: bool = False):
    """Least-squares similarity transform aligning (N,3) src to dst.

    Returns (s, R, t) with dst ~= s * R @ src + t.
    """
    mu_s = jnp.mean(src, 0)
    mu_d = jnp.mean(dst, 0)
    s_c = src - mu_s
    d_c = dst - mu_d
    cov = d_c.T @ s_c / src.shape[0]
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 0.0]) + jnp.asarray([0.0, 0.0, 1.0]) * d)
    R = U @ D @ Vt
    if with_scale:
        var_s = jnp.mean(jnp.sum(s_c * s_c, -1))
        scale = jnp.sum(S * jnp.diagonal(D)) / jnp.maximum(var_s, 1e-12)
    else:
        scale = jnp.asarray(1.0, src.dtype)
    t = mu_d - scale * R @ mu_s
    return scale, R, t


def ate(est_poses: Array, gt_poses: Array, with_scale: bool = False) -> AteResult:
    """Absolute trajectory error after rigid (or Sim3) alignment.

    est_poses, gt_poses: (N, 4, 4) T_wc.
    """
    p_est = est_poses[:, :3, 3]
    p_gt = gt_poses[:, :3, 3]
    s, R, t = umeyama_alignment(p_est, p_gt, with_scale)
    p_aligned = s * p_est @ R.T + t
    err = jnp.linalg.norm(p_aligned - p_gt, axis=-1)
    T_align = geo.pose_from_rt(s * R, t)
    return AteResult(
        rmse=jnp.sqrt(jnp.mean(err ** 2)),
        mean=jnp.mean(err),
        median=jnp.median(err),
        max=jnp.max(err),
        T_align=T_align,
    )


def rpe(est_poses: Array, gt_poses: Array, delta: int = 1):
    """Relative pose error over a fixed frame delta.

    Returns (trans_rmse, rot_rmse_rad).
    """
    def rel(T):
        return geo.pose_inverse(T[:-delta]) @ T[delta:]

    e = geo.pose_inverse(rel(gt_poses)) @ rel(est_poses)
    trans = jnp.linalg.norm(e[:, :3, 3], axis=-1)
    cos_a = jnp.clip((jnp.trace(e[:, :3, :3], axis1=1, axis2=2) - 1) / 2, -1, 1)
    rot = jnp.arccos(cos_a)
    return jnp.sqrt(jnp.mean(trans ** 2)), jnp.sqrt(jnp.mean(rot ** 2))


def rpe_drift(est_poses: Array, gt_poses: Array, delta: int = 10):
    """Drift rate: relative-pose error normalized by distance traveled
    (the KITTI odometry convention — translational drift as a fraction of
    segment length, rotational drift in rad/m).

    ATE alone conflates local drift with whatever the loop closure later
    corrected; drift-per-meter is the metric that quantifies "mid-lap sag"
    independent of closures (VERDICT round-4 weak #7).  Returns
    (trans_drift_frac, rot_rad_per_m): sum of segment errors over sum of
    ground-truth segment lengths, a length-weighted average robust to
    near-zero-motion segments.
    """
    def rel(T):
        return geo.pose_inverse(T[:-delta]) @ T[delta:]

    rel_gt = rel(gt_poses)
    e = geo.pose_inverse(rel_gt) @ rel(est_poses)
    trans = jnp.linalg.norm(e[:, :3, 3], axis=-1)
    cos_a = jnp.clip((jnp.trace(e[:, :3, :3], axis1=1, axis2=2) - 1) / 2, -1, 1)
    rot = jnp.arccos(cos_a)
    seg = jnp.linalg.norm(rel_gt[:, :3, 3], axis=-1)
    total = jnp.maximum(jnp.sum(seg), 1e-9)
    return jnp.sum(trans) / total, jnp.sum(rot) / total


def rpe_drift_median(est_poses: Array, gt_poses: Array, delta: int = 10):
    """Median per-segment drift ratio — robust to the tail of segments
    that cross tracking dropouts (motion-model freerun then re-lock),
    which dominate the length-weighted mean of `rpe_drift` whenever
    tracked_frac < 1.  Report both: mean = includes every failure,
    median = the typical drift while tracking."""
    def rel(T):
        return geo.pose_inverse(T[:-delta]) @ T[delta:]

    rel_gt = rel(gt_poses)
    e = geo.pose_inverse(rel_gt) @ rel(est_poses)
    trans = jnp.linalg.norm(e[:, :3, 3], axis=-1)
    cos_a = jnp.clip((jnp.trace(e[:, :3, :3], axis1=1, axis2=2) - 1) / 2, -1, 1)
    rot = jnp.arccos(cos_a)
    seg = jnp.maximum(jnp.linalg.norm(rel_gt[:, :3, 3], axis=-1), 1e-9)
    return jnp.median(trans / seg), jnp.median(rot / seg)
