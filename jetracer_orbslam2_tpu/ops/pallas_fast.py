"""Fused FAST corner response + 3x3 local-max as ONE Pallas TPU kernel.

This is the flagship hand-written kernel of the front-end (SURVEY.md §2.4):
the reference implements FAST as a per-pixel CUDA kernel with a 64K-entry
contiguous-arc LUT and data-dependent early exits
(reference: src/cuda/fast.cu:150-287, LUT at fast.cu:11-39) followed by a
separate grid-NMS kernel (src/cuda/nms.cu:86-254).  The XLA formulation in
ops/fast.py materializes a (16, H, W) ring stack in HBM; this kernel keeps
the whole image resident in VMEM and accumulates the ring test into two
int32 *bitmasks* per pixel:

- an unrolled walk over the 16 Bresenham offsets (static circular rolls —
  static `tpu.rotate` works on lane-unaligned widths where
  `tpu.dynamic_rotate` does not) does one vector roll, one compare,
  `mask |= bit << i` and a masked score accumulate per offset, written
  into VMEM scratch refs so each iteration's temporaries die at the
  store and the working set stays ~6 (H, W) buffers;
- the "contiguous arc >= L" test becomes run-length doubling on the 16-bit
  masks via rotate-AND (`rot16`), i.e. O(log 16) elementwise int ops — the
  TPU-native replacement for the reference's 64K LUT gather;
- the 3x3 local-max suppression (the first half of grid NMS) is fused into
  the same pass as a separable row-max/col-max, so the response map crosses
  HBM exactly once.

Everything is VPU-bound elementwise work on (8, 128)-tiled f32/int32 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jetracer_orbslam2_tpu.ops.fast import RING_OFFSETS

Array = jax.Array

# Measured scoped-VMEM stack usage is ~52 B/pixel (the ~13-buffer live set);
# with the 64 MB vmem_limit below, 800k pixels (~42 MB) leaves headroom.
# Covers KITTI level 0 (1241x376); anything larger falls back to XLA.
_MAX_PALLAS_PIXELS = 800_000


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _rot16(m: Array, k) -> Array:
    """Rotate the low 16 bits of int32 lanes right by k (bit i <- bit i+k).

    Works for python-int or traced scalar k in [0, 16); callers never pass 0
    for traced k.
    """
    if isinstance(k, int):
        k = k % 16
        if k == 0:
            return m
    return ((m >> k) | (m << (16 - k))) & 0xFFFF


def _has_arc(mask: Array, length: int) -> Array:
    """Bit i of p[n] says: ring bits i..i+n-1 (circular) are all set.

    Run-length doubling on the packed mask — the whole contiguous-arc test
    is O(log 16) elementwise int32 ops, no LUT, no gather.
    """
    assert 1 <= length <= 16
    p = {1: mask}
    k = 1
    while k < 16:
        p[2 * k] = p[k] & _rot16(p[k], k)
        k *= 2
    run = None
    offset = 0
    for k in (16, 8, 4, 2, 1):
        if length & k:
            piece = _rot16(p[k], offset)
            run = piece if run is None else (run & piece)
            offset += k
    return run != 0


def _max3_axis(x: Array, axis: int) -> Array:
    """Circular 3-tap max along an axis (2 rolls; border handled by mask)."""
    n = x.shape[axis]
    return jnp.maximum(
        jnp.maximum(pltpu.roll(x, 1, axis), x), pltpu.roll(x, n - 1, axis)
    )


def _roll2(img: Array, dy: int, dx: int) -> Array:
    """Static circular shift so result[y, x] = img[y + dy, x + dx]."""
    h, w = img.shape
    out = img
    if dy % h:
        out = pltpu.roll(out, (-dy) % h, 0)
    if dx % w:
        out = pltpu.roll(out, (-dx) % w, 1)
    return out


def _fast_nms_kernel(
    thr_ref, img_ref, out_ref, mask_ref, bs_ref, ds_ref,
    *, arc_length: int, border: int, real_hw: tuple[int, int],
):
    img = img_ref[:]
    t = thr_ref[0, 0]
    h, w = img.shape          # hardware-aligned (padded) shape
    rh, rw = real_hw          # caller's image shape; rest is zero padding

    # Unrolled ring walk accumulating into VMEM *scratch refs*: each
    # iteration's roll/compare temporaries die at the store, so the live
    # set stays ~6 (H, W) buffers (an SSA-carried unroll keeps all 16
    # rolls alive on the scoped-VMEM stack and OOMs).  Bright bits live in
    # mask[0:16], dark bits in mask[16:32].
    mask_ref[:] = jnp.zeros((h, w), jnp.int32)
    bs_ref[:] = jnp.zeros((h, w), jnp.float32)
    ds_ref[:] = jnp.zeros((h, w), jnp.float32)
    for i, (dy, dx) in enumerate(RING_OFFSETS):
        d = _roll2(img, dy, dx) - img
        bright = d > t
        dark = d < -t
        bit = jnp.int32(1 << i)
        mask_ref[:] = (
            mask_ref[:]
            | jnp.where(bright, bit, 0)
            | jnp.where(dark, bit << 16, 0)
        )
        bs_ref[:] = bs_ref[:] + jnp.where(bright, d - t, 0.0)
        ds_ref[:] = ds_ref[:] + jnp.where(dark, -d - t, 0.0)

    mask = mask_ref[:]
    is_corner = _has_arc(mask & 0xFFFF, arc_length) | _has_arc(
        (mask >> 16) & 0xFFFF, arc_length
    )
    score = jnp.where(is_corner, jnp.maximum(bs_ref[:], ds_ref[:]), 0.0)

    # zero the keep-out border (plus any alignment padding) with slice
    # stores on the output ref (cheaper than two (H, W) iota buffers), then
    # read back for the NMS pass.  The zeroed band is >= ring radius wide,
    # so the circular rolls' wraparound only ever reads zeros here — which
    # keeps this bit-exact vs the unpadded XLA formulation.
    out_ref[:] = score
    out_ref[:border, :] = jnp.zeros((border, w), jnp.float32)
    out_ref[rh - border:, :] = jnp.zeros((h - rh + border, w), jnp.float32)
    out_ref[:, :border] = jnp.zeros((h, border), jnp.float32)
    out_ref[:, rw - border:] = jnp.zeros((h, w - rw + border), jnp.float32)
    score = out_ref[:]

    # fused 3x3 non-max suppression, separable (max9 incl. self >= max8):
    # ties kept, identical to ops/nms.local_max_3x3
    neigh = _max3_axis(_max3_axis(score, 1), 0)
    out_ref[:] = jnp.where(score >= neigh, score, 0.0)


@functools.partial(
    jax.jit, static_argnames=("arc_length", "border", "interpret")
)
def fast_nms_response(
    img: Array,
    threshold: float,
    arc_length: int = 12,
    border: int = 3,
    interpret: bool = False,
) -> Array:
    """(H, W) f32 grayscale -> (H, W) f32 NMS'd FAST response map.

    Bit-exact equivalent of
    `nms.local_max_3x3(fast.fast_score_map(img, threshold, arc_length, border))`
    in one VMEM-resident kernel pass.
    """
    h, w = img.shape
    # hardware-aligned padded shape: (8, 128) f32 tiles.  Vector rotates on
    # lane-unaligned widths mis-lower (observed at w=1241 on v5e), so the
    # kernel always sees an aligned field; the pad is zero, falls entirely
    # inside the zeroed keep-out band, and is cropped off below.
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)
    x = img.astype(jnp.float32)
    if (hp, wp) != (h, w):
        x = jnp.pad(x, ((0, hp - h), (0, wp - w)))
    thr = jnp.asarray(threshold, jnp.float32).reshape(1, 1)
    kernel = functools.partial(
        _fast_nms_kernel, arc_length=arc_length, border=border,
        real_hw=(h, w),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.int32),
            pltpu.VMEM((hp, wp), jnp.float32),
            pltpu.VMEM((hp, wp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the default 16 MB scoped-vmem stack undercounts Mosaic's
            # buffer reuse here; physical VMEM is far larger on v5e+
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(thr, x)
    return out[:h, :w] if (hp, wp) != (h, w) else out


def use_pallas(shape: tuple[int, int]) -> bool:
    """Trace-time dispatch: compiled Pallas path only on real TPU backends
    and only when the whole level fits the kernel's VMEM working set."""
    return (
        jax.default_backend() == "tpu"
        and shape[0] * shape[1] <= _MAX_PALLAS_PIXELS
    )
