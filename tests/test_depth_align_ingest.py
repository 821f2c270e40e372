"""Unregistered-depth ingest: the reference's production depth->color
alignment kernel (reference src/cuda/cuda-align.cu:366-399, run on every
frame) now executes inside our pipeline when a dataset declares an offset
depth camera (tum_tiny_unaligned/depth_calib.txt) — VERDICT round-3
item 7, closing coverage row 22's "no production caller"."""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from jetracer_orbslam2_tpu.io.datasets import open_dataset
from jetracer_orbslam2_tpu.io.synthetic import generate_sequence
from jetracer_orbslam2_tpu.ops import align

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tum_tiny_unaligned")


def test_loader_parses_depth_calib():
    ds = open_dataset(FIXTURE)
    assert ds.depth_intrinsics is not None and len(ds.depth_intrinsics) == 4
    # the fixture's depth lens differs from the color lens (6% fx)
    assert abs(ds.depth_intrinsics[0] / float(ds.intrinsics[0]) - 1.06) < 1e-3
    T = np.asarray(ds.T_color_depth).reshape(4, 4)
    assert abs(T[0, 3] - 0.025) < 1e-6          # 25 mm RGB<->depth offset
    np.testing.assert_allclose(T[3], [0, 0, 0, 1])


def test_align_recovers_registered_depth():
    """align_depth_to_color on the offset-camera render reproduces the
    color camera's true depth map; the raw map is centimeters off."""
    ds = open_dataset(FIXTURE)
    # ground truth: the registered twin is the same scene/trajectory
    seq = generate_sequence(n_frames=3, shape=(120, 160), seed=7,
                            step=0.03, yaw_rate=0.006)
    gt = np.asarray(seq.depth[2])
    raw = ds.frame(2).depth
    aligned = np.asarray(align.align_depth_to_color(
        jnp.asarray(raw),
        jnp.asarray(ds.depth_intrinsics, jnp.float32),
        jnp.asarray(ds.intrinsics),
        jnp.asarray(ds.T_color_depth, jnp.float32).reshape(4, 4),
        raw.shape))
    ok = aligned > 0
    assert ok.mean() > 0.8                       # dense coverage
    med_aligned = np.median(np.abs(aligned[ok] - gt[ok]))
    med_raw = np.median(np.abs(raw - gt))
    assert med_aligned < 1e-3, med_aligned       # < 1 mm
    assert med_raw > 20 * med_aligned, (med_raw, med_aligned)


def test_frontend_consumes_depth_calibration():
    """frontend_gray_depth with cfg.depth_intrinsics/T_color_depth
    backprojects keypoints through the ALIGNED depth: the 3D points match
    the registered twin's to millimeters."""
    from jetracer_orbslam2_tpu.config import FrontendConfig
    from jetracer_orbslam2_tpu.models.frontend import frontend_gray_depth

    ds = open_dataset(FIXTURE)
    seq = generate_sequence(n_frames=2, shape=(120, 160), seed=7,
                            step=0.03, yaw_rate=0.006)
    fr = ds.frame(1)
    cfg_al = FrontendConfig(
        height=120, width=160, num_levels=2, max_keypoints=128,
        depth_intrinsics=ds.depth_intrinsics,
        T_color_depth=ds.T_color_depth)
    f_al = frontend_gray_depth(jnp.asarray(fr.gray), jnp.asarray(fr.depth),
                               jnp.asarray(ds.intrinsics), cfg_al)
    cfg_reg = FrontendConfig(height=120, width=160, num_levels=2,
                             max_keypoints=128)
    f_reg = frontend_gray_depth(jnp.asarray(fr.gray), seq.depth[1],
                                jnp.asarray(ds.intrinsics), cfg_reg)
    both = np.asarray(f_al.has_point) & np.asarray(f_reg.has_point)
    assert both.sum() > 50
    d = np.linalg.norm(
        np.asarray(f_al.points)[both] - np.asarray(f_reg.points)[both],
        axis=-1)
    assert np.median(d) < 2e-3, np.median(d)


def test_cli_unaligned_fixture_end_to_end():
    snippet = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; from jetracer_orbslam2_tpu.run import main; "
        f"sys.exit(main(['--dataset', {FIXTURE!r}, '--levels', '2', "
        "'--max-keypoints', '128', '--json']))"
    )
    r = subprocess.run([sys.executable, "-c", snippet],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout.strip().splitlines()[-1])
    assert report["frames"] == 24
    assert report["tracked_frac"] > 0.9
    # same bar the registered tum_tiny meets in test_cli.py
    assert report["ate_rmse_m"] < 0.05, report
