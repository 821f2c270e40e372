"""Dev experiment: Pallas gather kernel for keypoint patch extraction.

Times the shipping one-hot-matmul extraction (ops/patches.extract_patches)
against a Pallas kernel that DMAs each (P, 128) window out of the packed
VMEM-resident pyramid canvas with dynamic-start slices (rows = sublane dim,
cols = lane dim).  Run: PYTHONPATH=. python scripts/experiment_pallas_patches.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, P = 1024, 37
H, W = 480, 640
LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def make_kernel(B, n_k, hc, wpad):
    def kernel(ys_ref, xs_ref, canvas_ref, out_ref):
        g = pl.program_id(0)

        def body(b, c):
            y0 = ys_ref[g * B + b]
            x0 = xs_ref[g * B + b]
            ya = pl.multiple_of((y0 // 8) * 8, 8)
            xa = pl.multiple_of((x0 // LANES) * LANES, LANES)
            win = canvas_ref[pl.ds(ya, 48), pl.ds(xa, 2 * LANES)]
            win = pltpu.roll(win, -(y0 - ya), 0)
            win = pltpu.roll(win, -(x0 - xa), 1)
            out_ref[b] = win[:P, :LANES]
            return c

        jax.lax.fori_loop(0, B, body, 0, unroll=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_k // B,),
        in_specs=[pl.BlockSpec((hc, wpad), lambda g, ys, xs: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, P, LANES), lambda g, ys, xs: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_k, P, LANES), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("B",))
def pallas_extract(canvas, ys, xs, B):
    hc, w0 = canvas.shape
    wpad = _round_up(w0 + 2 * LANES, LANES)
    hpad = _round_up(hc, 8) + 16
    cpad = jnp.pad(canvas, ((0, hpad - hc), (0, wpad - w0)))
    out = make_kernel(B, ys.shape[0], hpad, wpad)(ys, xs, cpad)
    return out[:, :, :P]


def bench(name, fn, n=100):
    @jax.jit
    def run():
        def body(i, c):
            out = fn(c)
            return c + jnp.sum(out) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    np.asarray(run())
    t0 = time.perf_counter()
    np.asarray(run())
    print(f"{name:32s} {(time.perf_counter() - t0) / n * 1e3:7.3f} ms",
          flush=True)


def main():
    from jetracer_orbslam2_tpu.config import FrontendConfig
    from jetracer_orbslam2_tpu.io.synthetic import generate_sequence
    from jetracer_orbslam2_tpu.ops import fast, nms, patches, preprocess

    cfg = FrontendConfig(height=H, width=W)
    seq = generate_sequence(n_frames=1, shape=(H, W))
    gray = jax.device_put(seq.gray[0])
    levels = preprocess.build_pyramid(preprocess.gaussian_blur_3x3(gray),
                                      cfg.num_levels)
    winners = [nms.grid_nms(fast.fast_score_map(
        im, cfg.fast_threshold, cfg.fast_arc_length, cfg.fast_border),
        cfg.cell_size) for im in levels]
    kp = nms.select_keypoints(winners, cfg.level_shapes, cfg.max_keypoints,
                              cfg.min_score, cfg.fast_border)

    canvas, offsets = patches.pack_levels(levels)
    r = P // 2
    lvl_off = jnp.asarray(offsets, jnp.int32)[kp.level]
    lvl_h = jnp.asarray([im.shape[0] for im in levels], jnp.int32)[kp.level]
    lvl_w = jnp.asarray([im.shape[1] for im in levels], jnp.int32)[kp.level]
    yc = jnp.clip(kp.xy_level[:, 1], r, lvl_h - 1 - r)
    xc = jnp.clip(kp.xy_level[:, 0], r, lvl_w - 1 - r)
    ys = yc + lvl_off - r
    xs = xc - r

    ref = patches.extract_patches(levels, kp, P)
    for B in (4, 8, 16, 32):
        got = pallas_extract(canvas, ys, xs, B)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        print(f"B={B}: exact match")
        bench(f"pallas extract B={B}",
              lambda c, B=B: pallas_extract(canvas + c, ys, xs, B))
    bench("onehot matmul (current)",
          lambda c: patches.extract_patches([lv + c for lv in levels], kp, P))


if __name__ == "__main__":
    main()
