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


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "cfg"))
def _sharded_lm_run(
    poses, points, obs_kf, obs_lm, obs_uv, obs_z, obs_z_valid,
    obs_valid, fixed, lm_valid, intrinsics, *, mesh: Mesh, axis: str,
    cfg: BAConfig,
) -> tuple[Array, Array, Array]:
    """The cached, jitted shard_map LM core (module-level so repeated live
    calls hit the jit cache instead of re-tracing a fresh closure).

    Sharded inputs are GLOBAL arrays of length n*Xb laid out so device d
    owns [d*Xb, (d+1)*Xb); obs_lm holds SHARD-LOCAL landmark indices.
    Returns (poses T_wc replicated, points sharded, cost trace).
    """
    P_num = poses.shape[0]
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
    with jax.default_matmul_precision("float32"):   # estimation path
        return smapped(
            poses, points, obs_kf, obs_lm, obs_uv, obs_z, obs_z_valid,
            obs_valid, fixed, lm_valid, intrinsics)


def sharded_bundle_adjust(
    sprob: ShardedBAProblem,
    intrinsics: Array,
    cfg: BAConfig,
    mesh: Mesh,
    axis: str = "lm",
) -> tuple[Array, Array, Array]:
    """LM bundle adjustment over the mesh on a host-prepared problem
    (prepare_sharded_problem).  Returns (poses T_wc replicated, points
    sharded, cost trace)."""
    return _sharded_lm_run(
        sprob.poses, sprob.points, sprob.obs_kf, sprob.obs_lm,
        sprob.obs_uv, sprob.obs_z, sprob.obs_z_valid, sprob.obs_valid,
        sprob.fixed, sprob.lm_valid, intrinsics,
        mesh=mesh, axis=axis, cfg=cfg)


# ---------------------------------------------------------------------------
# Live-map sharded BA: the jittable layout path used by models/slam.Slam
# when it owns a device mesh.  No host-side numpy in the loop — landmark
# round-robin assignment and per-shard edge grouping are argsort/segment_sum
# programs, so the whole windowed BA (layout + solve + scatter-back) is one
# compiled graph per mesh size.
# ---------------------------------------------------------------------------


def _interleave(x: Array, n: int) -> Array:
    """Round-robin redistribution: out[d*Lb + j] = x[j*n + d].

    Landmarks are allocated sequentially (map.insert_keyframe packs new ones
    at the tail), so BLOCK distribution would pile every live landmark onto
    shard 0 until the map fills.  Round-robin (owner = slot % n) keeps the
    shards balanced at every fill level."""
    L = x.shape[0]
    return x.reshape(L // n, n, *x.shape[1:]).swapaxes(0, 1).reshape(x.shape)


def _deinterleave(x: Array, n: int) -> Array:
    L = x.shape[0]
    return x.reshape(n, L // n, *x.shape[1:]).swapaxes(0, 1).reshape(x.shape)


@functools.partial(
    jax.jit, static_argnames=("window_size", "cfg", "mesh", "axis"))
def sharded_local_ba(
    m,                       # models.backend.map.MapState
    intrinsics: Array,
    window_size: int,
    cfg,                     # config.SystemConfig
    mesh: Mesh,
    axis: str = "lm",
):
    """Windowed BA over the newest keyframes, landmark-sharded on `mesh`.

    Drop-in equivalent of models/slam.local_ba — same window/gauge logic,
    same per-edge math (models/backend/ba.py) — with the landmark axis and
    its edges distributed across the mesh and the reduced camera system
    psum'd (one O(P^2) collective per LM iteration).  An n=1 mesh runs the
    identical program, so the single-chip and pod paths cannot drift apart.

    Returns (new MapState, n_dropped): edges beyond a shard's static
    capacity E/n are masked out; n_dropped reports how many (0 in practice —
    round-robin keeps shards balanced; the caller logs nonzero drops).
    """
    from jetracer_orbslam2_tpu.models.backend.ba import BAProblem  # noqa: F401 (docs)

    n = mesh.shape[axis]
    Kf = m.kf_valid.shape[0]
    L = m.lm_pos.shape[0]
    E = m.obs_valid.shape[0]
    if L % n or E % n:
        raise ValueError(
            f"map capacities must divide the mesh: L={L} E={E} n={n}")
    Lb, Eb = L // n, E // n

    # --- window + gauge (identical to models/slam.local_ba) ---
    W = window_size
    newest = m.num_kf - 1
    window = jnp.clip(newest - W + 1 + jnp.arange(W), 0, Kf - 1)
    eq = m.obs_kf[:, None] == window[None, :]
    in_win = jnp.any(eq, axis=1) & m.obs_valid
    local_kf = jnp.argmax(eq, axis=1).astype(jnp.int32)
    fixed = jnp.zeros(W, bool).at[0].set(True)
    fixed = fixed | (window == window[0])

    # --- round-robin landmark layout ---
    points = _interleave(m.lm_pos, n)
    lm_valid = _interleave(m.lm_valid, n)

    # --- group edges by owning shard (stable argsort; no host numpy) ---
    owner = jnp.where(in_win, m.obs_lm % n, n)          # n = discard bucket
    order = jnp.argsort(owner, stable=True)
    owner_s = owner[order]
    counts = jax.ops.segment_sum(
        jnp.ones_like(owner), owner, num_segments=n + 1)
    offs = jnp.concatenate([jnp.zeros(1, counts.dtype),
                            jnp.cumsum(counts)[:-1]])
    rank = jnp.arange(E) - offs[owner_s]
    keep = (owner_s < n) & (rank < Eb)
    dest = jnp.where(keep, owner_s * Eb + rank, E)      # E = drop slot

    def scatter(field):
        # dest == E for dropped/discarded edges; mode="drop" ignores them
        src = field[order]
        out = jnp.zeros((E,) + field.shape[1:], field.dtype)
        return out.at[dest].set(src, mode="drop")

    s_obs_kf = scatter(local_kf)
    s_obs_lm = scatter((m.obs_lm // n).astype(jnp.int32))   # shard-local idx
    s_obs_uv = scatter(m.obs_uv)
    s_obs_z = scatter(m.obs_z)
    s_obs_zok = scatter(m.obs_z > 0.0)
    s_obs_ok = scatter(in_win & True)
    n_dropped = (jnp.sum(in_win) - jnp.sum(s_obs_ok)).astype(jnp.int32)

    new_poses, new_points, _trace = _sharded_lm_run(
        m.kf_pose[window], points, s_obs_kf, s_obs_lm, s_obs_uv,
        s_obs_z, s_obs_zok, s_obs_ok, fixed, lm_valid, intrinsics,
        mesh=mesh, axis=axis, cfg=cfg.ba)

    kf_pose = m.kf_pose.at[window].set(new_poses)
    lm_pos = _deinterleave(new_points, n)
    lm_pos = jnp.where(m.lm_valid[:, None], lm_pos, m.lm_pos)
    return m._replace(kf_pose=kf_pose, lm_pos=lm_pos), n_dropped
