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
import numpy as np

from jetracer_orbslam2_tpu.config import FrontendConfig
from jetracer_orbslam2_tpu.models.frontend import (
    Features, extract_features)
from jetracer_orbslam2_tpu.ops import geometry as geo
from jetracer_orbslam2_tpu.ops import match as match_ops
from jetracer_orbslam2_tpu.ops import preprocess

Array = jax.Array


def _refine_disparity(
    left: Array, right: Array, xy_l: Array, disp0: Array, level: Array,
    patch_h: int = 5, patch_w: int = 9, search: int = 3, step: float = 0.25,
) -> Array:
    """Photometric subpixel disparity refinement (batched over keypoints).

    Descriptor matching quantizes disparity to the keypoint grid — a
    level-k keypoint's x is a multiple of 2^k, so its disparity error is
    up to 2^(k-1) px, which at EuRoC's 11 cm baseline means depth errors
    of tens of centimeters (sigma_z = z^2 * sigma_d / (fx*b)).  ORB-SLAM2
    fixes this the same way: a 1-D SAD search of the left patch along the
    right epipolar line with subpixel interpolation.

    For each keypoint: gather the (patch_h, patch_w) left patch and a
    (patch_h, patch_w + 2*search) right strip centered at the matched
    position, slide the window at `step`-px shifts via linear
    interpolation along the strip (pure arithmetic — one gather total),
    and take the SAD argmin.  Returns the refined (K,) disparity; border
    or out-of-range cases keep disp0.
    """
    H, W = left.shape
    K = xy_l.shape[0]
    ph2, pw2 = patch_h // 2, patch_w // 2
    xl = jnp.round(xy_l[:, 0]).astype(jnp.int32)
    yl = jnp.round(xy_l[:, 1]).astype(jnp.int32)
    xr = xl - jnp.round(disp0).astype(jnp.int32)

    dy = jnp.arange(-ph2, ph2 + 1)
    dxp = jnp.arange(-pw2, pw2 + 1)
    dxs = jnp.arange(-pw2 - search, pw2 + search + 1)
    rows = jnp.clip(yl[:, None] + dy[None, :], 0, H - 1)         # (K, ph)
    cols_l = jnp.clip(xl[:, None] + dxp[None, :], 0, W - 1)      # (K, pw)
    cols_r = jnp.clip(xr[:, None] + dxs[None, :], 0, W - 1)      # (K, pw+2s)
    patch_l = left[rows[:, :, None], cols_l[:, None, :]]         # (K,ph,pw)
    strip_r = right[rows[:, :, None], cols_r[:, None, :]]        # (K,ph,pw+2s)

    # candidate shifts s (right window moved right by s => disparity - s)
    shifts_np = np.arange(-search, search + 1e-6, step, dtype=np.float32)
    shifts = jnp.asarray(shifts_np)
    sads = []
    for s in shifts_np:
        k = int(np.floor(s)) + search
        frac = float(s - np.floor(s))
        win = ((1.0 - frac) * jax.lax.dynamic_slice_in_dim(strip_r, k, patch_w, 2)
               + frac * jax.lax.dynamic_slice_in_dim(
                   strip_r, min(k + 1, 2 * search), patch_w, 2))
        sads.append(jnp.sum(jnp.abs(patch_l - win), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)                                # (K, S)
    best = jnp.argmin(sad, axis=1)
    s_best = shifts[best]
    refined = jnp.round(disp0) - s_best
    # keep the refinement only when the window stayed inside the image, the
    # optimum is interior (not railed against the search bound), and the
    # correction is no larger than the keypoint's quantization bound
    # (level-k coordinates are multiples of 2^k, so the disparity can be
    # off by at most ~2^k px — a photometric optimum further away means the
    # SAD latched onto repeated texture, not onto this feature)
    inside = ((yl - ph2 >= 0) & (yl + ph2 < H)
              & (xl - pw2 >= 0) & (xl + pw2 < W)
              & (xr - pw2 - search >= 0) & (xr + pw2 + search < W))
    interior = jnp.abs(s_best) < (search - 0.5)
    bound = jnp.exp2(level.astype(jnp.float32)) * 0.75 + 0.25
    within = jnp.abs(s_best) <= bound
    return jnp.where(inside & interior & within, refined, disp0)


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
    disparity = _refine_disparity(
        left.astype(jnp.float32), right.astype(jnp.float32),
        kp_l.xy, disparity, kp_l.level)
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
