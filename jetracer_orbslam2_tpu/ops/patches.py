"""Batched keypoint patch extraction.

The reference's per-keypoint ops (ORB orientation at src/cuda/orb.cu:77-142,
rotated BRIEF at src/cuda/orb.cu:17-75) each gather pixels around every
keypoint independently.  The TPU idiom (SURVEY.md §7.4) is to gather a fixed
square patch per keypoint ONCE, then express orientation and descriptors as
dense tensor ops on the (K, P, P) patch stack.

Keypoints live on different pyramid levels (different static image shapes),
so patches are gathered from every level for all K and blended by level mask
— num_levels dense gathers instead of data-dependent control flow.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from jetracer_orbslam2_tpu.ops.nms import Keypoints

Array = jax.Array


def extract_patches(levels: List[Array], kp: Keypoints, patch_size: int) -> Array:
    """(K, P, P) float32 patches centered on each keypoint (level-local).

    Centers are clamped to keep the window in bounds; the detector border
    (FrontendConfig.fast_border >= patch radius) makes clamping a no-op for
    valid keypoints.
    """
    r = patch_size // 2
    offs = jnp.arange(-r, r + 1, dtype=jnp.int32)
    out = None
    for lvl, img in enumerate(levels):
        h, w = img.shape
        yc = jnp.clip(kp.xy_level[:, 1], r, h - 1 - r)
        xc = jnp.clip(kp.xy_level[:, 0], r, w - 1 - r)
        ys = yc[:, None, None] + offs[None, :, None]
        xs = xc[:, None, None] + offs[None, None, :]
        patches = img[ys, xs]
        sel = (kp.level == lvl)[:, None, None]
        out = patches if out is None else jnp.where(sel, patches, out)
    return out
