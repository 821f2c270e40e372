"""Stereo front-end: keypoint depth from rectified left-right matching.

The reference is RGB-D only (depth camera); EuRoC/KITTI require stereo.
Generalization of its depth-association idea (SURVEY.md §7.1 item 3):
features are extracted in BOTH rectified images, matched with the same
batched Hamming kernel the tracker uses (ops/match.py) under an epipolar
gate — |v_l - v_r| small, disparity u_l - u_r in (0, max_disp] — and depth
follows as z = fx * baseline / disparity.  The result is a `Features` set
identical in shape to the RGB-D path, so tracking/mapping/BA are
source-agnostic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jetracer_orbslam2_tpu.config import FrontendConfig
from jetracer_orbslam2_tpu.models.frontend import (
    Features, extract_features)
from jetracer_orbslam2_tpu.ops import geometry as geo
from jetracer_orbslam2_tpu.ops import match as match_ops
from jetracer_orbslam2_tpu.ops import preprocess

Array = jax.Array


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_disparity", "epipolar_tol", "max_hamming",
    "min_depth", "max_depth"))
def frontend_stereo(
    left: Array,
    right: Array,
    intrinsics: Array,
    baseline: float | Array,
    cfg: FrontendConfig,
    max_disparity: float = 128.0,
    epipolar_tol: float = 2.0,
    max_hamming: int = 48,
    min_depth: float = 0.1,
    max_depth: float = 80.0,
) -> Features:
    """(H, W) left/right grayscale -> Features with stereo depth."""
    kp_l, ang_l, desc_l = extract_features(left.astype(jnp.float32), cfg)
    kp_r, ang_r, desc_r = extract_features(right.astype(jnp.float32), cfg)

    # epipolar-gated Hamming matching (rows align in rectified pairs)
    d = match_ops.hamming_matrix(desc_l, desc_r, cfg.descriptor_bits)
    dv = jnp.abs(kp_l.xy[:, None, 1] - kp_r.xy[None, :, 1])
    disp = kp_l.xy[:, None, 0] - kp_r.xy[None, :, 0]
    gate = (
        (~kp_l.valid[:, None]) | (~kp_r.valid[None, :])
        | (dv > epipolar_tol)
        | (disp <= 0.1) | (disp > max_disparity)
    )
    d = jnp.where(gate, 1e9, d)
    best_j = jnp.argmin(d, axis=1).astype(jnp.int32)
    best_d = jnp.min(d, axis=1)
    matched = (best_d <= max_hamming) & kp_l.valid

    disparity = kp_l.xy[:, 0] - kp_r.xy[best_j, 0]
    fx = intrinsics[0]
    z = fx * baseline / jnp.maximum(disparity, 1e-3)
    has_depth = matched & (z > min_depth) & (z < max_depth)

    pts = geo.deproject(kp_l.xy, z, intrinsics)
    return Features(
        xy=kp_l.xy,
        level=kp_l.level,
        score=kp_l.score,
        angle=ang_l,
        desc=desc_l,
        valid=kp_l.valid,
        points=jnp.where(has_depth[:, None], pts, 0.0),
        has_point=has_depth,
    )
