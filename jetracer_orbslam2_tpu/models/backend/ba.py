"""Bundle adjustment: Levenberg-Marquardt with Schur complement, TPU-first.

The reference declared SLAM intent (keyframe knobs at src/Context.h:62-65)
but shipped no bundle adjustment at all; its only pose math is a per-pair
Kabsch/ICP that is computed then discarded
(src/SlamGpuPipeline/buildStream.cpp:29-188,572-584).  This module is the
real backend, designed around the MXU rather than around sparse matrices:

  * Observations are a flat, fixed-capacity edge list (E edges), each
    contributing a 2-vector residual with analytic (2x6) pose and (2x3)
    point Jacobians — all built batched, no per-edge control flow.
  * Block-sparse Hessian assembly is `segment_sum` over edges (the TPU
    replacement for the CUDA atomicAdd idiom the reference uses everywhere,
    e.g. src/cuda/cuda-align.cu:337-344).
  * The Schur complement S = Hpp - W Hll^-1 W^T is formed as ONE dense
    matmul over the (P*6, L*3) stacked cross-term — exactly the shape the
    MXU wants — and solved with dense Cholesky.  For the capacities SLAM
    needs (P <= a few hundred poses) dense-S is both simpler and faster on
    TPU than any sparse CPU solver.
  * Landmark back-substitution is a batched 3x3 solve.

The same `build_normal_equations` is reused by `parallel/ba_sharded.py`,
which shards the edge list over a device mesh and `psum`s (S, b) — the
distributed-BA story (SURVEY.md §2.9, §7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jetracer_orbslam2_tpu.config import BAConfig
from jetracer_orbslam2_tpu.ops import geometry as geo
from jetracer_orbslam2_tpu.utils.precision import f32_estimation

Array = jax.Array


class BAProblem(NamedTuple):
    """A fixed-shape BA problem instance.

    poses:    (P, 4, 4) T_wc keyframe poses (world-from-camera).
    points:   (L, 3)    landmark world positions.
    obs_kf:   (E,) int32 pose index per observation.
    obs_lm:   (E,) int32 landmark index per observation.
    obs_uv:   (E, 2)    pixel measurements.
    obs_z:    (E,)      measured camera-frame depth (RGB-D / stereo), m.
    obs_z_valid: (E,) bool depth measurement validity.  Depth residuals
              anchor scale: reprojection-only BA over a short RGB-D window
              is near-degenerate (landmarks slide along rays) — the same
              reason ORB-SLAM2 uses a stereo/depth residual for RGB-D.
    obs_valid:(E,) bool.
    fixed:    (P,) bool gauge-fixed poses (at least one must be True).
    """

    poses: Array
    points: Array
    obs_kf: Array
    obs_lm: Array
    obs_uv: Array
    obs_z: Array
    obs_z_valid: Array
    obs_valid: Array
    fixed: Array

    @classmethod
    def without_depth(cls, poses, points, obs_kf, obs_lm, obs_uv,
                      obs_valid, fixed) -> "BAProblem":
        e = obs_kf.shape[0]
        return cls(poses=poses, points=points, obs_kf=obs_kf, obs_lm=obs_lm,
                   obs_uv=obs_uv, obs_z=jnp.zeros(e, jnp.float32),
                   obs_z_valid=jnp.zeros(e, bool), obs_valid=obs_valid,
                   fixed=fixed)


class BAStats(NamedTuple):
    cost: Array          # (iters+1,) robust cost trace (index 0 = initial)
    num_edges: Array     # () effective edge count


def _residuals_and_jacobians(
    poses_cw: Array, points: Array, obs_kf: Array, obs_lm: Array,
    obs_uv: Array, obs_z: Array, obs_z_valid: Array, intrinsics: Array,
):
    """Batched residual + analytic Jacobians for all E edges.

    Residual r = [project(T_cw X_w) - uv, wz * (z - z_meas)], with
    left-multiplicative se(3) increment on T_cw ordered (translation,
    rotation): delta_p = dt + dw x p.  The depth row (weight wz = fx / z,
    converting meters to pixel-like units — the ORB-SLAM2 stereo-residual
    scaling) is zeroed where obs_z_valid is False.
    Returns r (E,3), Jp (E,3,6), Jl (E,3,3), z (E,) camera depth.
    """
    fx, fy = intrinsics[0], intrinsics[1]
    T = poses_cw[obs_kf]                       # (E, 4, 4)
    X = points[obs_lm]                         # (E, 3)
    p = jnp.einsum("eij,ej->ei", T[:, :3, :3], X) + T[:, :3, 3]
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    zc = jnp.maximum(z, 1e-6)
    iz = 1.0 / zc
    u = fx * x * iz + intrinsics[2]
    v = fy * y * iz + intrinsics[3]
    wz = jnp.where(obs_z_valid, fx / jnp.maximum(obs_z, 0.1), 0.0)
    r = jnp.stack([u - obs_uv[:, 0], v - obs_uv[:, 1],
                   wz * (z - obs_z)], -1)      # (E, 3)

    # d(u,v,wz*z)/dp  (E, 3, 3)
    zero = jnp.zeros_like(iz)
    J_proj = jnp.stack([
        jnp.stack([fx * iz, zero, -fx * x * iz * iz], -1),
        jnp.stack([zero, fy * iz, -fy * y * iz * iz], -1),
        jnp.stack([zero, zero, wz], -1),
    ], 1)
    # dp/dxi = [I | -hat(p)]  (E, 3, 6)
    I3 = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), (p.shape[0], 3, 3))
    J_pt_pose = jnp.concatenate([I3, -geo.hat(p)], -1)
    Jp = jnp.einsum("eij,ejk->eik", J_proj, J_pt_pose)   # (E, 3, 6)
    Jl = jnp.einsum("eij,ejk->eik", J_proj, T[:, :3, :3])  # (E, 3, 3)
    return r, Jp, Jl, z


def _huber_weight(r: Array, delta: float) -> Array:
    """sqrt-weights for IRLS Huber: w = min(1, delta/|r|). (E,)"""
    n = jnp.linalg.norm(r, axis=-1)
    return jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(n, 1e-12)))


def robust_cost(r: Array, w_valid: Array, delta: float) -> Array:
    n = jnp.linalg.norm(r, axis=-1)
    quad = 0.5 * n * n
    lin = delta * (n - 0.5 * delta)
    return jnp.sum(jnp.where(n <= delta, quad, lin) * w_valid)


def build_normal_equations(
    poses_cw: Array, points: Array, obs_kf: Array, obs_lm: Array,
    obs_uv: Array, obs_z: Array, obs_z_valid: Array, w_valid: Array,
    intrinsics: Array, huber_delta: float,
):
    """Assemble the block normal equations for one LM iteration.

    Returns (Hpp (P,6,6), Hll (L,3,3), G (L,P,6,3) cross blocks,
    bp (P,6), bl (L,3), cost ()).  Pure segment-sums + einsums: this is the
    function `parallel/ba_sharded.py` runs under shard_map with the edge
    list sharded over devices and the outputs psum'd.
    """
    P = poses_cw.shape[0]
    L = points.shape[0]
    r, Jp, Jl, z = _residuals_and_jacobians(
        poses_cw, points, obs_kf, obs_lm, obs_uv, obs_z, obs_z_valid,
        intrinsics)
    w_valid = w_valid * (z > 1e-3)
    cost = robust_cost(r, w_valid, huber_delta)
    w = _huber_weight(r, huber_delta) * w_valid
    r = r * w[:, None]
    Jp = Jp * w[:, None, None]
    Jl = Jl * w[:, None, None]

    Hpp = jax.ops.segment_sum(
        jnp.einsum("eri,erj->eij", Jp, Jp), obs_kf, num_segments=P)
    Hll = jax.ops.segment_sum(
        jnp.einsum("eri,erj->eij", Jl, Jl), obs_lm, num_segments=L)
    bp = jax.ops.segment_sum(
        -jnp.einsum("eri,er->ei", Jp, r), obs_kf, num_segments=P)
    bl = jax.ops.segment_sum(
        -jnp.einsum("eri,er->ei", Jl, r), obs_lm, num_segments=L)
    # cross blocks W_e = Jp^T Jl scattered by (landmark, pose)
    W = jnp.einsum("eri,erj->eij", Jp, Jl)               # (E, 6, 3)
    flat_idx = obs_lm * P + obs_kf
    G = jax.ops.segment_sum(W, flat_idx, num_segments=L * P)
    G = G.reshape(L, P, 6, 3)
    return Hpp, Hll, G, bp, bl, cost


def _solve_schur(Hpp, Hll, G, bp, bl, lam, free):
    """Damped Schur solve.  Returns (dx_pose (P,6), dx_point (L,3))."""
    P = Hpp.shape[0]
    L = Hll.shape[0]
    eye3 = jnp.eye(3, dtype=Hll.dtype)
    eye6 = jnp.eye(6, dtype=Hpp.dtype)
    # LM damping (multiplicative on diagonal + absolute floor)
    Hll_d = Hll + (lam * jnp.maximum(
        jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hll)), 1e-6 * eye3))
    Hpp_d = Hpp + (lam * jnp.maximum(
        jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp)), 1e-6 * eye6))
    Hll_inv = jnp.linalg.inv(Hll_d)                       # (L, 3, 3) batched

    # S = Hpp_block_diag - G Hll^-1 G^T, assembled dense (P*6, P*6)
    Gh = jnp.einsum("lpik,lkm->lpim", G, Hll_inv)         # (L, P, 6, 3)
    G2 = jnp.transpose(G, (1, 2, 0, 3)).reshape(P * 6, L * 3)
    Gh2 = jnp.transpose(Gh, (1, 2, 0, 3)).reshape(P * 6, L * 3)
    S = -Gh2 @ G2.T                                       # MXU: one big matmul
    # add the (P,6,6) block-diagonal pose Hessian
    S = S.reshape(P, 6, P, 6)
    S = S.at[jnp.arange(P), :, jnp.arange(P), :].add(Hpp_d)
    S = S.reshape(P * 6, P * 6)
    # reduced RHS: bp - G Hll^-1 bl
    rhs = bp - jnp.einsum("lpim,lm->pi", Gh, bl)          # (P, 6)

    # gauge fixing: zero rows/cols of fixed poses, identity diagonal
    free6 = jnp.repeat(free.astype(S.dtype), 6)
    S = S * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
    rhs = rhs.reshape(-1) * free6

    c, low = jax.scipy.linalg.cho_factor(S)
    dxp = jax.scipy.linalg.cho_solve((c, low), rhs).reshape(P, 6)
    # back-substitute landmarks: dxl = Hll^-1 (bl - G^T dxp)
    Gt_dxp = jnp.einsum("lpim,pi->lm", G, dxp)            # (L, 3)
    dxl = jnp.einsum("lkm,lm->lk", Hll_inv, bl - Gt_dxp)
    return dxp, dxl


def _apply(poses_cw, points, dxp, dxl, lm_free):
    upd = jax.vmap(lambda T, xi: geo.se3_exp(xi) @ T)(poses_cw, dxp)
    return upd, points + dxl * lm_free[:, None]


@functools.partial(jax.jit, static_argnames=("cfg",))
@f32_estimation
def bundle_adjust(
    prob: BAProblem, intrinsics: Array, cfg: BAConfig,
) -> tuple[Array, Array, BAStats]:
    """Run `cfg.iters` LM iterations.  Returns (poses T_wc, points, stats).

    Fixed iteration count (TPU: one compiled graph, no host sync inside);
    rejected steps raise lambda and retry next iteration — the classic LM
    accept/reject expressed as a `lax.scan` carry.
    """
    poses_cw = jax.vmap(geo.pose_inverse)(prob.poses)
    w_valid = prob.obs_valid.astype(jnp.float32)
    # landmarks with no valid observation must not move
    L = prob.points.shape[0]
    lm_nobs = jax.ops.segment_sum(w_valid, prob.obs_lm, num_segments=L)
    lm_free = (lm_nobs >= 2.0).astype(jnp.float32)
    free = ~prob.fixed

    def nle(poses_cw, points):
        return build_normal_equations(
            poses_cw, points, prob.obs_kf, prob.obs_lm, prob.obs_uv,
            prob.obs_z, prob.obs_z_valid, w_valid, intrinsics,
            cfg.huber_delta)

    def step(carry, _):
        poses_cw, points, lam, cost_prev = carry
        Hpp, Hll, G, bp, bl, cost0 = nle(poses_cw, points)
        dxp, dxl = _solve_schur(Hpp, Hll, G, bp, bl, lam, free)
        new_poses, new_points = _apply(poses_cw, points, dxp, dxl, lm_free)
        _, _, _, _, _, cost1 = nle(new_poses, new_points)
        accept = cost1 < cost0
        poses_cw = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), new_poses, poses_cw)
        points = jnp.where(accept, new_points, points)
        lam = jnp.where(accept, lam * cfg.damping_down, lam * cfg.damping_up)
        lam = jnp.clip(lam, 1e-9, 1e6)
        cost = jnp.where(accept, cost1, cost0)
        return (poses_cw, points, lam, cost), cost

    _, _, _, _, _, cost_init = nle(poses_cw, prob.points)
    (poses_cw, points, _, _), trace = jax.lax.scan(
        step, (poses_cw, prob.points, jnp.float32(cfg.damping_init),
               cost_init), None, length=cfg.iters)
    poses_wc = jax.vmap(geo.pose_inverse)(poses_cw)
    stats = BAStats(
        cost=jnp.concatenate([cost_init[None], trace]),
        num_edges=jnp.sum(prob.obs_valid).astype(jnp.int32),
    )
    return poses_wc, points, stats
