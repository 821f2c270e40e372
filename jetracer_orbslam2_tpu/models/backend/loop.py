"""Loop closure: retrieval -> geometric verification -> pose-graph correction.

Entirely new capability (the reference has no loop closure, no keyframes —
SURVEY.md §2, §7.1 item 10).  Pipeline:

  1. `retrieve`: batched cosine scores between the query keyframe's global
     descriptor (mean BRIEF bit vector, map.py:_global_descriptor) and all
     stored keyframes — a (1, 256) x (256, Kf) matvec, the BoW-free TPU
     retrieval prefilter.
  2. `verify`: full K x K Hamming matching between the two keyframes'
     descriptors (ops/match.py — the same kernel the tracker uses) and
     RANSAC-Kabsch on their camera-frame 3D points -> relative pose T_ab.
  3. `close`: build a pose-graph over keyframes (odometry chain edges +
     the loop edge), optimize (backend/pose_graph.py), then rigidly carry
     each landmark with its reference keyframe's correction.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jetracer_orbslam2_tpu.config import LoopClosureConfig, PoseGraphConfig
from jetracer_orbslam2_tpu.models.backend.map import MapState
from jetracer_orbslam2_tpu.models.backend.pose_graph import (
    PoseGraphProblem, optimize_pose_graph)
from jetracer_orbslam2_tpu.models import tracking
from jetracer_orbslam2_tpu.ops import geometry as geo
from jetracer_orbslam2_tpu.ops import match as match_ops

Array = jax.Array


class LoopCandidate(NamedTuple):
    kf_idx: Array     # () int32 best matching keyframe slot
    score: Array      # () float32 retrieval similarity in [0, 1]
    ok: Array         # () bool passes gap + similarity gates


class LoopResult(NamedTuple):
    T_ab: Array       # (4, 4) verified relative pose: query(a) <- match(b)
    num_inliers: Array
    ok: Array


@functools.partial(jax.jit, static_argnames=("min_kf_gap",))
def retrieve(
    m: MapState, query_slot: Array, min_sim: float, min_kf_gap: int = 30,
) -> LoopCandidate:
    """Best non-recent keyframe by global-descriptor cosine similarity."""
    q = m.kf_global_desc[query_slot]                     # (256,)
    sims = m.kf_global_desc @ q / (
        jnp.linalg.norm(m.kf_global_desc, axis=1) * jnp.linalg.norm(q) + 1e-9)
    slots = jnp.arange(m.kf_valid.shape[0])
    eligible = m.kf_valid & (slots < query_slot - min_kf_gap)
    sims = jnp.where(eligible, sims, -1.0)
    best = jnp.argmax(sims).astype(jnp.int32)
    return LoopCandidate(
        kf_idx=best,
        score=sims[best],
        ok=(sims[best] > min_sim) & jnp.any(eligible),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def verify(
    m: MapState, slot_a: Array, slot_b: Array, key: Array,
    cfg: LoopClosureConfig,
) -> LoopResult:
    """Descriptor-match keyframes a, b and RANSAC a rigid relative pose.

    Solves points_a ~= T_ab @ points_b over mutually-matched keypoints with
    valid depth (camera-frame 3D from each keyframe's own RGB-D
    backprojection).
    """
    desc_a = m.kf_desc[slot_a]
    desc_b = m.kf_desc[slot_b]
    has_a = m.kf_has_point[slot_a]
    has_b = m.kf_has_point[slot_b]
    res = match_ops.match(
        desc_a, desc_b, has_a, has_b,
        xy_a_pred=None, xy_b=None, window=0.0,
        max_hamming=80.0, mutual=True,
    )
    pts_a = m.kf_points[slot_a]
    pts_b = m.kf_points[slot_b][res.idx]
    w = (res.valid & has_b[res.idx]).astype(jnp.float32)
    rr = tracking.ransac_kabsch(
        pts_b, pts_a, w, key,
        iters=512, thresh=cfg.ransac_inlier_thresh,
        min_inliers=cfg.min_inliers,
    )
    return LoopResult(T_ab=rr.T, num_inliers=rr.num_inliers, ok=rr.ok)


@functools.partial(jax.jit, static_argnames=("pg_cfg",))
def close(
    m: MapState, slot_a: Array, slot_b: Array, T_ab: Array,
    pg_cfg: PoseGraphConfig, loop_weight: float = 4.0,
) -> MapState:
    """Apply a verified loop edge: pose-graph optimize + carry landmarks.

    Edges: odometry chain (k -> k+1 with the current relative pose as the
    measurement — drift lives in the loop edge discrepancy) + the loop edge
    b -> a measured T_ba = T_ab^-1 ... expressed as edge (a, b) with
    measurement T_ab so that residual pulls T_a^-1 T_b toward T_ab.
    """
    Kf = m.kf_valid.shape[0]
    poses0 = m.kf_pose

    # odometry chain edges (slot k -> k+1), valid where both KFs exist
    idx = jnp.arange(Kf - 1)
    chain_T = jnp.matmul(
        jax.vmap(geo.pose_inverse)(poses0[:-1]), poses0[1:])
    chain_w = (m.kf_valid[:-1] & m.kf_valid[1:]).astype(jnp.float32)

    edge_i = jnp.concatenate([idx, slot_a[None]])
    edge_j = jnp.concatenate([idx + 1, slot_b[None]])
    edge_T = jnp.concatenate([chain_T, T_ab[None]])
    edge_w = jnp.concatenate([chain_w, jnp.float32(loop_weight)[None]])

    fixed = jnp.zeros(Kf, bool).at[0].set(True)
    prob = PoseGraphProblem(
        poses=poses0, edge_i=edge_i, edge_j=edge_j,
        edge_T=edge_T, edge_weight=edge_w, fixed=fixed)
    new_poses, trace = optimize_pose_graph(prob, pg_cfg)
    new_poses = jnp.where(m.kf_valid[:, None, None], new_poses, poses0)

    # carry each landmark with its reference keyframe: X' = T_new T_old^-1 X
    corr = jnp.einsum(
        "kij,kjl->kil", new_poses, jax.vmap(geo.pose_inverse)(poses0))
    C = corr[m.lm_ref_kf]                                 # (L, 4, 4)
    new_lm = jnp.einsum("lij,lj->li", C[:, :3, :3], m.lm_pos) + C[:, :3, 3]
    new_lm = jnp.where(m.lm_valid[:, None], new_lm, m.lm_pos)
    return m._replace(kf_pose=new_poses, lm_pos=new_lm)
