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


def _refine_right_x(
    left: Array, right: Array, xl: Array, yl: Array, xr0: Array, yr: Array,
    level: Array,
    patch_h: int = 5, patch_w: int = 9, search: int = 3, step: float = 0.25,
) -> tuple[Array, Array]:
    """Photometric subpixel correspondence refinement (batched, 1-D).

    Core of the disparity polish: for each keypoint, gather the
    (patch_h, patch_w) left patch at integer (xl, yl) and a
    (patch_h, patch_w + 2*search) right strip at (xr0, yr), slide the
    window at `step`-px shifts via linear interpolation along the strip
    (pure arithmetic — one gather total), and take the SAD argmin.

    Returns (xr0 + s_best, valid): the refined raw right x-coordinate and
    whether to trust it — the window stayed inside both images, the
    optimum is interior (not railed at the search bound), and the
    correction is within the keypoint's grid-quantization bound (a
    level-k coordinate is a multiple of 2^k; a photometric optimum
    further away means the SAD latched onto repeated texture).
    """
    H, W = left.shape
    ph2, pw2 = patch_h // 2, patch_w // 2

    dy = jnp.arange(-ph2, ph2 + 1)
    dxp = jnp.arange(-pw2, pw2 + 1)
    dxs = jnp.arange(-pw2 - search, pw2 + search + 1)
    rows_l = jnp.clip(yl[:, None] + dy[None, :], 0, H - 1)       # (K, ph)
    rows_r = jnp.clip(yr[:, None] + dy[None, :], 0, H - 1)
    cols_l = jnp.clip(xl[:, None] + dxp[None, :], 0, W - 1)      # (K, pw)
    cols_r = jnp.clip(xr0[:, None] + dxs[None, :], 0, W - 1)     # (K, pw+2s)
    patch_l = left[rows_l[:, :, None], cols_l[:, None, :]]       # (K,ph,pw)
    strip_r = right[rows_r[:, :, None], cols_r[:, None, :]]      # (K,ph,pw+2s)

    # candidate shifts s (right window moved right by s)
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
    inside = ((yl - ph2 >= 0) & (yl + ph2 < H)
              & (yr - ph2 >= 0) & (yr + ph2 < H)
              & (xl - pw2 >= 0) & (xl + pw2 < W)
              & (xr0 - pw2 - search >= 0) & (xr0 + pw2 + search < W))
    interior = jnp.abs(s_best) < (search - 0.5)
    bound = jnp.exp2(level.astype(jnp.float32)) * 0.75 + 0.25
    within = jnp.abs(s_best) <= bound
    return xr0.astype(jnp.float32) + s_best, inside & interior & within


def _refine_disparity(
    left: Array, right: Array, xy_l: Array, disp0: Array, level: Array,
) -> Array:
    """Rectified-path disparity refinement (ORB-SLAM2's 1-D SAD polish).

    Descriptor matching quantizes disparity to the keypoint grid — a
    level-k keypoint's x is a multiple of 2^k, so its disparity error is
    up to 2^(k-1) px, which at EuRoC's 11 cm baseline means depth errors
    of tens of centimeters (sigma_z = z^2 * sigma_d / (fx*b)).  Rows align
    in rectified pairs, so the right strip is gathered at the LEFT row.
    Returns the refined (K,) disparity; invalid cases keep disp0.
    """
    xl = jnp.round(xy_l[:, 0]).astype(jnp.int32)
    yl = jnp.round(xy_l[:, 1]).astype(jnp.int32)
    xr0 = xl - jnp.round(disp0).astype(jnp.int32)
    xr_ref, ok = _refine_right_x(left, right, xl, yl, xr0, yl, level)
    return jnp.where(ok, xl.astype(jnp.float32) - xr_ref, disp0)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "max_disparity", "epipolar_tol", "max_hamming",
    "min_depth", "max_depth", "dist_r", "rect_l", "rect_r"))
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
    dist_r: tuple | None = None,
    rect_l: tuple | None = None,
    rect_r: tuple | None = None,
    intrinsics_r: Array | None = None,
) -> Features:
    """(H, W) left/right grayscale -> Features with stereo depth.

    Non-pre-rectified rigs are handled at the KEYPOINT level — no image
    warping: `cfg.dist` / `dist_r` are the per-camera distortion coeffs
    and `rect_l` / `rect_r` are row-major (9,) rectifying rotations (from
    io/datasets.stereo_rectify_rotations, Bouguet's construction), applied
    to the keypoint COORDS after detection on the raw images.  The
    epipolar gate, disparity, and deprojection then run in the common
    rectified frame; the output Features.xy are rectified-left pixel
    coords with the LEFT camera's intrinsics.
    """
    kp_l, ang_l, desc_l = extract_features(left.astype(jnp.float32), cfg)
    kp_r, ang_r, desc_r = extract_features(right.astype(jnp.float32), cfg)

    dist_l = None if cfg.dist is None else jnp.asarray(cfg.dist, jnp.float32)
    d_r = None if dist_r is None else jnp.asarray(dist_r, jnp.float32)
    R_l = (None if rect_l is None
           else jnp.asarray(rect_l, jnp.float32).reshape(3, 3))
    R_r = (None if rect_r is None
           else jnp.asarray(rect_r, jnp.float32).reshape(3, 3))
    intr_r = intrinsics if intrinsics_r is None else intrinsics_r
    prerectified = (dist_l is None and d_r is None
                    and R_l is None and R_r is None)
    if prerectified:
        xy_l, xy_r = kp_l.xy, kp_r.xy
    else:
        xy_l = geo.undistort_pixels(
            kp_l.xy, intrinsics, dist_l, cfg.dist_model, R_l)
        xy_r = geo.undistort_pixels(
            kp_r.xy, intr_r, d_r, cfg.dist_model, R_r)

    # epipolar-gated Hamming matching (rows align in the rectified frame)
    d = match_ops.hamming_matrix(desc_l, desc_r, cfg.descriptor_bits)
    dv = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1])
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    gate = (
        (~kp_l.valid[:, None]) | (~kp_r.valid[None, :])
        | (dv > epipolar_tol)
        | (disp <= 0.1) | (disp > max_disparity)
    )
    d = jnp.where(gate, 1e9, d)
    best_j = jnp.argmin(d, axis=1).astype(jnp.int32)
    best_d = jnp.min(d, axis=1)
    matched = (best_d <= max_hamming) & kp_l.valid

    disparity = xy_l[:, 0] - xy_r[best_j, 0]
    if prerectified:
        disparity = _refine_disparity(
            left.astype(jnp.float32), right.astype(jnp.float32),
            kp_l.xy, disparity, kp_l.level)
    else:
        # photometric polish still runs on the RAW images (pixels never
        # resample): over the +-3 px search window the epipolar curve is
        # locally row-aligned, so the 1-D SAD search slides along the raw
        # right row through the matched keypoint, and the refined raw
        # point maps back through the keypoint-level rectification.
        xr_raw = jnp.round(kp_r.xy[best_j, 0]).astype(jnp.int32)
        yr_raw = jnp.round(kp_r.xy[best_j, 1]).astype(jnp.int32)
        xr_ref, ok = _refine_right_x(
            left.astype(jnp.float32), right.astype(jnp.float32),
            jnp.round(kp_l.xy[:, 0]).astype(jnp.int32),
            jnp.round(kp_l.xy[:, 1]).astype(jnp.int32),
            xr_raw, yr_raw,
            jnp.maximum(kp_l.level, kp_r.level[best_j]))
        ref_rect = geo.undistort_pixels(
            jnp.stack([xr_ref, kp_r.xy[best_j, 1]], -1),
            intr_r, d_r, cfg.dist_model, R_r)
        disparity = jnp.where(ok, xy_l[:, 0] - ref_rect[:, 0], disparity)
    fx = intrinsics[0]
    z = fx * baseline / jnp.maximum(disparity, 1e-3)
    has_depth = matched & (z > min_depth) & (z < max_depth)

    pts = geo.deproject(xy_l, z, intrinsics)
    return Features(
        xy=xy_l,
        level=kp_l.level,
        score=kp_l.score,
        angle=ang_l,
        desc=desc_l,
        valid=kp_l.valid,
        points=jnp.where(has_depth[:, None], pts, 0.0),
        has_point=has_depth,
    )
