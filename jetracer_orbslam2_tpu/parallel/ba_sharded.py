"""Distributed bundle adjustment: landmark blocks sharded over a mesh.

The scaling recipe (north star; SURVEY.md §2.9, §7.4):

  * Landmarks and their observation edges live on the device that owns the
    landmark block — edges are pre-grouped by landmark (`prepare_sharded_
    problem`), so Hll, bl, the cross-term G, and landmark back-substitution
    are entirely LOCAL (no communication).
  * Each device forms its partial reduced camera system
    S_part = -G Hll^-1 G^T and partial (Hpp, bp, cost); ONE `psum` over the
    `lm` axis reduces them (6P x 6P — small), and the dense Cholesky solve
    is replicated.  Communication volume per LM iteration is O(P^2),
    independent of landmark count — that is what makes scaling efficiency
    >= 0.8 achievable at large maps.
  * Expressed with `shard_map` over `jax.sharding.Mesh`; the n=1 mesh runs
    the identical program, so single-chip and pod builds share one code
    path.

The per-edge math is imported from models/backend/ba.py — the single-device
and distributed solvers cannot drift apart.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jetracer_orbslam2_tpu.config import BAConfig
from jetracer_orbslam2_tpu.models.backend import ba as ba_core
from jetracer_orbslam2_tpu.ops import geometry as geo

Array = jax.Array


class ShardedBAProblem(NamedTuple):
    """BA problem laid out for an n-device mesh.

    Landmark axis and edge axis are padded to multiples of n_devices, with
    edges grouped so edges of shard-local landmarks are contiguous.
    obs_lm holds SHARD-LOCAL landmark indices (0..L_local-1).
    """

    poses: Array       # (P, 4, 4) replicated
    points: Array      # (L_pad, 3) sharded on axis 0
    obs_kf: Array      # (E_pad,) int32 sharded
    obs_lm: Array      # (E_pad,) int32 LOCAL landmark index, sharded
    obs_uv: Array      # (E_pad, 2) sharded
    obs_z: Array       # (E_pad,) sharded depth measurements
    obs_z_valid: Array  # (E_pad,) bool sharded
    obs_valid: Array   # (E_pad,) bool sharded
    fixed: Array       # (P,) bool replicated
    lm_valid: Array    # (L_pad,) bool sharded (False for padding)


def prepare_sharded_problem(
    prob: ba_core.BAProblem, n_devices: int
) -> ShardedBAProblem:
    """Host-side layout: group edges by owning landmark shard, pad, relabel.

    Landmarks are block-distributed: device d owns [d*Lb, (d+1)*Lb).
    """
    L = prob.points.shape[0]
    Lb = -(-L // n_devices)           # landmarks per device
    L_pad = Lb * n_devices

    obs_lm = np.asarray(prob.obs_lm)
    obs_valid = np.asarray(prob.obs_valid)
    owner = obs_lm // Lb              # shard of each edge

    # per-shard edge lists, padded to the max count
    per_shard = [np.nonzero((owner == d) & obs_valid)[0] for d in range(n_devices)]
    Eb = max(1, max(len(s) for s in per_shard))
    obs_kf_s = np.zeros((n_devices, Eb), np.int32)
    obs_lm_s = np.zeros((n_devices, Eb), np.int32)
    obs_uv_s = np.zeros((n_devices, Eb, 2), np.float32)
    obs_z_s = np.zeros((n_devices, Eb), np.float32)
    obs_zok_s = np.zeros((n_devices, Eb), bool)
    obs_ok_s = np.zeros((n_devices, Eb), bool)
    kf_np = np.asarray(prob.obs_kf)
    uv_np = np.asarray(prob.obs_uv)
    z_np = np.asarray(prob.obs_z)
    zok_np = np.asarray(prob.obs_z_valid)
    for d, idx in enumerate(per_shard):
        n = len(idx)
        obs_kf_s[d, :n] = kf_np[idx]
        obs_lm_s[d, :n] = obs_lm[idx] - d * Lb   # local index
        obs_uv_s[d, :n] = uv_np[idx]
        obs_z_s[d, :n] = z_np[idx]
        obs_zok_s[d, :n] = zok_np[idx]
        obs_ok_s[d, :n] = True

    pts = np.zeros((L_pad, 3), np.float32)
    pts[:L] = np.asarray(prob.points)
    lm_valid = np.zeros(L_pad, bool)
    lm_valid[:L] = True

    return ShardedBAProblem(
        poses=prob.poses,
        points=jnp.asarray(pts),
        obs_kf=jnp.asarray(obs_kf_s.reshape(-1)),
        obs_lm=jnp.asarray(obs_lm_s.reshape(-1)),
        obs_uv=jnp.asarray(obs_uv_s.reshape(-1, 2)),
        obs_z=jnp.asarray(obs_z_s.reshape(-1)),
        obs_z_valid=jnp.asarray(obs_zok_s.reshape(-1)),
        obs_valid=jnp.asarray(obs_ok_s.reshape(-1)),
        fixed=prob.fixed,
        lm_valid=jnp.asarray(lm_valid),
    )


def _local_normal_eq(poses_cw, points_l, obs_kf, obs_lm_local, obs_uv,
                     obs_z, obs_z_valid, w_valid, intrinsics, huber_delta,
                     P_num):
    """Per-shard normal equations over LOCAL landmarks; partials for psum."""
    L_local = points_l.shape[0]
    r, Jp, Jl, z = ba_core._residuals_and_jacobians(
        poses_cw, points_l, obs_kf, obs_lm_local, obs_uv, obs_z,
        obs_z_valid, intrinsics)
    w_valid = w_valid * (z > 1e-3)
    cost = ba_core.robust_cost(r, w_valid, huber_delta)
    w = ba_core._huber_weight(r, huber_delta) * w_valid
    r = r * w[:, None]
    Jp = Jp * w[:, None, None]
    Jl = Jl * w[:, None, None]

    Hpp = jax.ops.segment_sum(
        jnp.einsum("eri,erj->eij", Jp, Jp), obs_kf, num_segments=P_num)
    Hll = jax.ops.segment_sum(
        jnp.einsum("eri,erj->eij", Jl, Jl), obs_lm_local, num_segments=L_local)
    bp = jax.ops.segment_sum(
        -jnp.einsum("eri,er->ei", Jp, r), obs_kf, num_segments=P_num)
    bl = jax.ops.segment_sum(
        -jnp.einsum("eri,er->ei", Jl, r), obs_lm_local, num_segments=L_local)
    W = jnp.einsum("eri,erj->eij", Jp, Jl)
    flat = obs_lm_local * P_num + obs_kf
    G = jax.ops.segment_sum(W, flat, num_segments=L_local * P_num)
    G = G.reshape(L_local, P_num, 6, 3)
    return Hpp, Hll, G, bp, bl, cost


def sharded_bundle_adjust(
    sprob: ShardedBAProblem,
    intrinsics: Array,
    cfg: BAConfig,
    mesh: Mesh,
    axis: str = "lm",
) -> tuple[Array, Array, Array]:
    """LM bundle adjustment over the mesh.

    Returns (poses T_wc replicated, points sharded, cost trace).
    """
    n = mesh.shape[axis]
    P_num = sprob.poses.shape[0]
    huber = cfg.huber_delta

    rep = P()
    shd = P(axis)

    def step_all(poses, points, obs_kf, obs_lm, obs_uv, obs_z, obs_z_valid,
                 obs_valid, fixed, lm_valid, intr):
        """Full LM run under shard_map.  Sharded args arrive as the local
        block; replicated args arrive whole."""
        poses_cw = jax.vmap(geo.pose_inverse)(poses)
        w_valid = obs_valid.astype(jnp.float32)
        L_local = points.shape[0]
        lm_nobs = jax.ops.segment_sum(w_valid, obs_lm, num_segments=L_local)
        lm_free = ((lm_nobs >= 2.0) & lm_valid).astype(jnp.float32)
        free = ~fixed

        def nle(poses_cw, points):
            Hpp_p, Hll, G, bp_p, bl, cost_p = _local_normal_eq(
                poses_cw, points, obs_kf, obs_lm, obs_uv, obs_z,
                obs_z_valid, w_valid, intr, huber, P_num)
            Hpp = jax.lax.psum(Hpp_p, axis)
            bp = jax.lax.psum(bp_p, axis)
            cost = jax.lax.psum(cost_p, axis)
            return Hpp, Hll, G, bp, bl, cost

        def cost_only(poses_cw, points):
            r, _, _, z = ba_core._residuals_and_jacobians(
                poses_cw, points, obs_kf, obs_lm, obs_uv, obs_z,
                obs_z_valid, intr)
            return jax.lax.psum(
                ba_core.robust_cost(r, w_valid * (z > 1e-3), huber), axis)

        def solve(Hpp, Hll, G, bp, bl, lam):
            eye3 = jnp.eye(3, dtype=Hll.dtype)
            eye6 = jnp.eye(6, dtype=Hpp.dtype)
            Hll_d = Hll + lam * jnp.maximum(
                jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hll)), 1e-6 * eye3)
            Hpp_d = Hpp + lam * jnp.maximum(
                jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp)), 1e-6 * eye6)
            Hll_inv = jnp.linalg.inv(Hll_d)
            Gh = jnp.einsum("lpik,lkm->lpim", G, Hll_inv)
            G2 = jnp.transpose(G, (1, 2, 0, 3)).reshape(P_num * 6, -1)
            Gh2 = jnp.transpose(Gh, (1, 2, 0, 3)).reshape(P_num * 6, -1)
            S_part = -Gh2 @ G2.T                    # local MXU matmul
            rhs_part = -jnp.einsum("lpim,lm->pi", Gh, bl)
            S = jax.lax.psum(S_part, axis)          # ONE O(P^2) collective
            rhs = bp + jax.lax.psum(rhs_part, axis)
            S = S.reshape(P_num, 6, P_num, 6)
            S = S.at[jnp.arange(P_num), :, jnp.arange(P_num), :].add(Hpp_d)
            S = S.reshape(P_num * 6, P_num * 6)
            free6 = jnp.repeat(free.astype(S.dtype), 6)
            S = S * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
            rhs = rhs.reshape(-1) * free6
            c, low = jax.scipy.linalg.cho_factor(S)
            dxp = jax.scipy.linalg.cho_solve((c, low), rhs).reshape(P_num, 6)
            Gt_dxp = jnp.einsum("lpim,pi->lm", G, dxp)
            dxl = jnp.einsum("lkm,lm->lk", Hll_inv, bl - Gt_dxp)
            return dxp, dxl

        def lm_step(carry, _):
            poses_cw, points, lam, _cost = carry
            Hpp, Hll, G, bp, bl, cost0 = nle(poses_cw, points)
            dxp, dxl = solve(Hpp, Hll, G, bp, bl, lam)
            new_poses = jax.vmap(lambda T, xi: geo.se3_exp(xi) @ T)(
                poses_cw, dxp)
            new_points = points + dxl * lm_free[:, None]
            cost1 = cost_only(new_poses, new_points)
            accept = cost1 < cost0
            poses_cw = jnp.where(accept, new_poses, poses_cw)
            points = jnp.where(accept, new_points, points)
            lam = jnp.where(accept, lam * cfg.damping_down,
                            lam * cfg.damping_up)
            lam = jnp.clip(lam, 1e-9, 1e6)
            return (poses_cw, points, lam, jnp.where(accept, cost1, cost0)), cost0

        cost_init = cost_only(poses_cw, points)
        (poses_cw, points, _, cost_final), trace = jax.lax.scan(
            lm_step, (poses_cw, points, jnp.float32(cfg.damping_init),
                      cost_init), None, length=cfg.iters)
        poses_out = jax.vmap(geo.pose_inverse)(poses_cw)
        return poses_out, points, jnp.concatenate([trace, cost_final[None]])

    smapped = jax.shard_map(
        step_all, mesh=mesh,
        in_specs=(rep, shd, shd, shd, shd, shd, shd, shd, rep, shd, rep),
        out_specs=(rep, shd, rep),
    )
    from jetracer_orbslam2_tpu.utils.precision import f32_estimation

    return jax.jit(f32_estimation(smapped))(
        sprob.poses, sprob.points, sprob.obs_kf, sprob.obs_lm,
        sprob.obs_uv, sprob.obs_z, sprob.obs_z_valid, sprob.obs_valid,
        sprob.fixed, sprob.lm_valid, intrinsics)
