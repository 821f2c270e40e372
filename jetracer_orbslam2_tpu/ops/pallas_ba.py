"""Fused BA normal-equations + Schur preparation as Pallas TPU kernels.

VERDICT round-4 item 4 / BASELINE.md round-4 closing paragraph: the XLA
dense-grid solver (models/backend/ba.py) materializes Jp (P,3,6,L),
Jl (P,3,3,L), G and Gh (P,6,3,L) in HBM every LM iteration — ~16 MB of
traffic at P=8, L=4096 against a ~0.7 MB information-theoretic floor
(obs + points + tiny outputs), which pins the iteration at ~50% of HBM
bandwidth and ~3.3x the 20 us roofline.  These kernels stream the landmark
axis through VMEM in tiles and never write a Jacobian to HBM:

  `fused_normal_schur` — per landmark tile: residuals, Jacobians, Huber
  weights, Hll assembly + LM damping + closed-form adjugate inversion,
  cross blocks G and Gh = G Hll^-1, and the two MXU contractions
  A = Jp2 Jp2^T (whose block diagonal is Hpp) and S = Gh2 G2^T — all in
  VMEM, accumulated across tiles into (48, 48) outputs.  Only Hll^-1
  (9, L) and bl (3, L) are written out, for the back-substitution.

  `fused_backsub` — recomputes the (weighted) Jacobians per tile (FLOPs
  are free; HBM is not) and returns dxl = Hll^-1 (bl - G^T dxp).

Plane layout: every quantity lives as a (P, Lt) f32 plane — P=8 poses sit
exactly in the VPU's 8 sublanes, the landmark tile in lanes — with the
small pose/row/col indices unrolled at trace time.  The MXU scratch
matrices use row index (i*8 + p) ("il layout") so each (P, Lt) plane
writes one contiguous (8, Lt) block; the host side un-interleaves the
(48, 48) results (see models/backend/ba.py:_solve_schur_fused).

Reference lineage: the reference has no BA at all (SURVEY.md §2.5 — its
pose solve is computed then discarded, buildStream.cpp:572-584); this is
north-star construction, tuned per the measured round-4 profile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

LANE_TILE = 1024         # landmarks per grid step (lanes)
_P = 8                   # poses per problem: the 8 VPU sublanes


def use_pallas_ba(num_poses: int, interpret: bool = False) -> bool:
    """Trace-time gate: the fused path needs the (P==8)-sublane layout and
    a real TPU backend (or explicit interpret mode for CPU tests)."""
    import os

    if os.environ.get("JETRACER_NO_PALLAS_BA"):
        return False
    return num_poses == _P and (interpret or jax.default_backend() == "tpu")


def _planes(poses_ref, points_ref, obs_ref, scal_ref):
    """Shared tile computation: weighted residual/Jacobian planes.

    Returns (r_w[3] (P,Lt), Jp_w[3][6] (P,Lt), Jl_w[3][3] (P,Lt)).
    Math identical to ba._dense_residuals_and_jacobians + _huber_weight:
    r = [u - u_m, v - v_m, wz (z - z_m)], left-mult se(3) (t, w) order.
    """
    fx = scal_ref[0, 0]
    fy = scal_ref[0, 1]
    cx = scal_ref[0, 2]
    cy = scal_ref[0, 3]
    huber = scal_ref[0, 5]

    R = [[poses_ref[:, 3 * k + j: 3 * k + j + 1] for j in range(3)]
         for k in range(3)]                         # R[k][j]: (P, 1)
    t = [poses_ref[:, 9 + k: 9 + k + 1] for k in range(3)]
    X = [points_ref[j: j + 1, :] for j in range(3)]  # (1, Lt)

    # camera-frame points (P, Lt)
    p = [R[k][0] * X[0] + R[k][1] * X[1] + R[k][2] * X[2] + t[k]
         for k in range(3)]
    x, y, z = p
    zc = jnp.maximum(z, 1e-6)
    iz = 1.0 / zc

    u_m = obs_ref[0]                                 # (P, Lt)
    v_m = obs_ref[1]
    z_m = obs_ref[2]
    zval = obs_ref[3]
    w_slot = obs_ref[4]

    u = fx * x * iz + cx
    v = fy * y * iz + cy
    wz = jnp.where(zval > 0.5, fx / jnp.maximum(z_m, 0.1), 0.0)
    r = [u - u_m, v - v_m, wz * (z - z_m)]

    w_valid = w_slot * (z > 1e-3)
    n = jnp.sqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2])
    wh = jnp.sqrt(jnp.minimum(1.0, huber / jnp.maximum(n, 1e-12))) * w_valid

    # J_proj rows (a, b, c)
    zero = jnp.zeros_like(iz)
    Jproj = [
        (fx * iz, zero, -fx * x * iz * iz),
        (zero, fy * iz, -fy * y * iz * iz),
        (zero, zero, wz),
    ]
    r_w, Jp_w, Jl_w = [], [], []
    for row in range(3):
        a, b, c = Jproj[row]
        aw, bw, cw = a * wh, b * wh, c * wh
        r_w.append(r[row] * wh)
        # Jp[r] = [a, b, c, c y - b z, a z - c x, b x - a y] (weighted)
        Jp_w.append([aw, bw, cw,
                     cw * y - bw * z, aw * z - cw * x, bw * x - aw * y])
        # Jl[r][j] = a R[0][j] + b R[1][j] + c R[2][j] (weighted)
        Jl_w.append([aw * R[0][j] + bw * R[1][j] + cw * R[2][j]
                     for j in range(3)])
    return r_w, Jp_w, Jl_w


def _assemble_kernel(scal_ref, poses_ref, points_ref, obs_ref, free_ref,
                     A_ref, S_ref, bp_ref, rhs_ref, hinv_ref, bl_ref,
                     jp2, g2, gh2):
    i = pl.program_id(0)
    Lt = points_ref.shape[-1]
    lam = scal_ref[0, 4]

    @pl.when(i == 0)
    def _():
        A_ref[:] = jnp.zeros_like(A_ref)
        S_ref[:] = jnp.zeros_like(S_ref)
        bp_ref[:] = jnp.zeros_like(bp_ref)
        rhs_ref[:] = jnp.zeros_like(rhs_ref)

    r_w, Jp_w, Jl_w = _planes(poses_ref, points_ref, obs_ref, scal_ref)

    # ---- pose blocks on the MXU: A = Jp2 Jp2^T (block diag = Hpp) ------
    for row in range(3):
        for ii in range(6):
            jp2[ii * _P:(ii + 1) * _P, row * Lt:(row + 1) * Lt] = (
                Jp_w[row][ii])
    A_ref[:] += jax.lax.dot_general(
        jp2[:], jp2[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # bp[p, i] = -sum_r <Jp_w[r][i], r_w[r]>  (lane reduction per plane)
    for ii in range(6):
        acc = jnp.zeros((_P, 1), jnp.float32)
        for row in range(3):
            acc = acc - jnp.sum(Jp_w[row][ii] * r_w[row], axis=1,
                                keepdims=True)
        bp_ref[:, ii: ii + 1] += acc

    # ---- landmark blocks: Hll, bl (sublane+row reductions to (1, Lt)) --
    hll = [[None] * 3 for _ in range(3)]
    for j in range(3):
        for k in range(j, 3):
            acc = jnp.zeros((1, Lt), jnp.float32)
            for row in range(3):
                acc = acc + jnp.sum(Jl_w[row][j] * Jl_w[row][k],
                                    axis=0, keepdims=True)
            hll[j][k] = acc
            hll[k][j] = acc
    bl = []
    for j in range(3):
        acc = jnp.zeros((1, Lt), jnp.float32)
        for row in range(3):
            acc = acc - jnp.sum(Jl_w[row][j] * r_w[row],
                                axis=0, keepdims=True)
        bl.append(acc)
        bl_ref[j: j + 1, :] = acc

    # ---- LM damping + empty-landmark identity + adjugate inverse -------
    freel = free_ref[0:1, :] > 0.0                   # (1, Lt)
    d = [jnp.where(freel,
                   hll[j][j] + lam * jnp.maximum(hll[j][j], 1e-6), 1.0)
         for j in range(3)]
    o = [[jnp.where(freel, hll[j][k], 0.0) for k in range(3)]
         for j in range(3)]
    a, b, c = d[0], o[0][1], o[0][2]
    e, f = d[1], o[1][2]
    ii9 = d[2]
    # symmetric 3x3 adjugate (matches ba.inv3x3_ll on a symmetric input)
    c11 = e * ii9 - f * f
    c12 = c * f - b * ii9
    c13 = b * f - c * e
    c22 = a * ii9 - c * c
    c23 = c * b - a * f
    c33 = a * e - b * b
    det = a * c11 + b * c12 + c * c13
    inv_det = 1.0 / det
    hinv = [[c11 * inv_det, c12 * inv_det, c13 * inv_det],
            [c12 * inv_det, c22 * inv_det, c23 * inv_det],
            [c13 * inv_det, c23 * inv_det, c33 * inv_det]]
    for j in range(3):
        for k in range(3):
            hinv_ref[3 * j + k: 3 * j + k + 1, :] = hinv[j][k]

    # ---- cross blocks G, Gh and the Schur MXU contraction --------------
    for ii in range(6):
        for j in range(3):
            gp = (Jp_w[0][ii] * Jl_w[0][j] + Jp_w[1][ii] * Jl_w[1][j]
                  + Jp_w[2][ii] * Jl_w[2][j])       # G[i][j] (P, Lt)
            g2[ii * _P:(ii + 1) * _P, j * Lt:(j + 1) * Lt] = gp
    for ii in range(6):
        acc = jnp.zeros((_P, 1), jnp.float32)
        for m in range(3):
            ghp = (g2[ii * _P:(ii + 1) * _P, 0 * Lt:1 * Lt] * hinv[0][m]
                   + g2[ii * _P:(ii + 1) * _P, 1 * Lt:2 * Lt] * hinv[1][m]
                   + g2[ii * _P:(ii + 1) * _P, 2 * Lt:3 * Lt] * hinv[2][m])
            gh2[ii * _P:(ii + 1) * _P, m * Lt:(m + 1) * Lt] = ghp
            acc = acc + jnp.sum(ghp * bl[m], axis=1, keepdims=True)
        rhs_ref[:, ii: ii + 1] += acc
    S_ref[:] += jax.lax.dot_general(
        gh2[:], g2[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _backsub_kernel(scal_ref, poses_ref, points_ref, obs_ref, free_ref,
                    hinv_ref, bl_ref, dxp_ref, dxl_ref):
    _, Jp_w, Jl_w = _planes(poses_ref, points_ref, obs_ref, scal_ref)
    Lt = points_ref.shape[-1]

    # u[r] = sum_i Jp_w[r][i] * dxp[p, i]  (P, Lt)
    u = []
    for row in range(3):
        acc = jnp.zeros((_P, Lt), jnp.float32)
        for ii in range(6):
            acc = acc + Jp_w[row][ii] * dxp_ref[:, ii: ii + 1]
        u.append(acc)
    # resid[j] = bl[j] - sum_{p,r} Jl_w[r][j] u[r]
    resid = []
    for j in range(3):
        acc = bl_ref[j: j + 1, :]
        for row in range(3):
            acc = acc - jnp.sum(Jl_w[row][j] * u[row],
                                axis=0, keepdims=True)
        resid.append(acc)
    freel = free_ref[0:1, :]
    for j in range(3):
        dxl = (hinv_ref[3 * j + 0: 3 * j + 1, :] * resid[0]
               + hinv_ref[3 * j + 1: 3 * j + 2, :] * resid[1]
               + hinv_ref[3 * j + 2: 3 * j + 3, :] * resid[2])
        dxl_ref[j: j + 1, :] = dxl * freel


def _common_specs(Lt):
    return [
        pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((_P, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, Lt), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((5, _P, Lt), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Lt), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_normal_schur(
    poses_flat: Array,   # (P, 12) [R row-major | t] of T_cw
    points: Array,       # (3, L) landmark-last world positions
    obs: Array,          # (5, P, L) [u, v, z, z_valid, w]
    lm_free: Array,      # (1, L) float32
    scalars: Array,      # (1, 8) [fx, fy, cx, cy, lam, huber, 0, 0]
    interpret: bool = False,
):
    """One fused pass over landmark tiles.  L must be a LANE_TILE multiple.

    Returns (A_il (48,48), S_il (48,48), bp (P,6), rhs_gh_bl (P,6),
    Hll_inv (9,L), bl (3,L)) — the il layout uses row (i*8+p); see module
    docstring.  Hpp = block diag of A_il; Schur S = Hpp_d - S_il.
    """
    L = points.shape[-1]
    Lt = min(LANE_TILE, L)
    assert L % Lt == 0, (L, Lt)
    grid = (L // Lt,)
    acc = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((48, 48), jnp.float32),   # A
        jax.ShapeDtypeStruct((48, 48), jnp.float32),   # S partial
        jax.ShapeDtypeStruct((_P, 6), jnp.float32),    # bp
        jax.ShapeDtypeStruct((_P, 6), jnp.float32),    # rhs (Gh bl)
        jax.ShapeDtypeStruct((9, L), jnp.float32),     # Hll_inv
        jax.ShapeDtypeStruct((3, L), jnp.float32),     # bl
    ]
    out_specs = [
        acc((48, 48)), acc((48, 48)), acc((_P, 6)), acc((_P, 6)),
        pl.BlockSpec((9, Lt), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, Lt), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _assemble_kernel,
        grid=grid,
        in_specs=_common_specs(Lt),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((48, 3 * Lt), jnp.float32),     # Jp2
            pltpu.VMEM((48, 3 * Lt), jnp.float32),     # G2
            pltpu.VMEM((48, 3 * Lt), jnp.float32),     # Gh2
        ],
        interpret=interpret,
    )(scalars, poses_flat, points, obs, lm_free)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_backsub(
    poses_flat: Array, points: Array, obs: Array, lm_free: Array,
    scalars: Array, hll_inv: Array, bl: Array, dxp: Array,
    interpret: bool = False,
) -> Array:
    """dxl (3, L) = lm_free * Hll^-1 (bl - G^T dxp), Jacobians recomputed
    per tile (dxp is (P, 6))."""
    L = points.shape[-1]
    Lt = min(LANE_TILE, L)
    grid = (L // Lt,)
    in_specs = _common_specs(Lt) + [
        pl.BlockSpec((9, Lt), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, Lt), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((_P, 6), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _backsub_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, Lt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, L), jnp.float32),
        interpret=interpret,
    )(scalars, poses_flat, points, obs, lm_free, hll_inv, bl, dxp)
