"""Time slam_scan on the bench lap (the BENCH slam_scan_fps_240x180 config).

VERDICT round-4 weak #2: scan fps regressed 505 -> 459 between rounds 3
and 4; this script isolates the scan timing from the rest of bench.py so
regression attribution (world-check argsort, top-N verify, compaction
conds) can be measured change by change.

Usage: python scripts/profile_scan.py [--frames 126] [--reps 4]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=126)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--width", type=int, default=240)
    ap.add_argument("--topn", type=int, default=0,
                    help="override LoopClosureConfig.topn (regression "
                         "attribution: round-4 tripled the per-keyframe "
                         "loop verification)")
    ap.add_argument("--no-world-check", action="store_true",
                    help="disable the world-frame loop check "
                         "(world_min_inliers=0 + world_max_obs=8)")
    ap.add_argument("--no-map-polish", action="store_true",
                    help="disable the per-frame map reprojection polish "
                         "(TrackingConfig.map_polish_iters=0 — the "
                         "round-3 behavior)")
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp

    from jetracer_orbslam2_tpu.config import (
        FrontendConfig, LoopClosureConfig, SystemConfig, TrackingConfig)
    from jetracer_orbslam2_tpu.evaluation import ate
    from jetracer_orbslam2_tpu.io.synthetic import generate_lap_sequence
    from jetracer_orbslam2_tpu.models import slam_scan as ss

    sh, sw, lap_n = args.height, args.width, args.frames
    lcfg = LoopClosureConfig()
    if args.topn:
        lcfg = dataclasses.replace(lcfg, topn=args.topn)
    if args.no_world_check:
        lcfg = dataclasses.replace(lcfg, world_min_inliers=0, world_max_obs=8)
    tcfg = TrackingConfig(match_window=16.0)
    if args.no_map_polish:
        tcfg = dataclasses.replace(tcfg, map_polish_iters=0)
    scfg = SystemConfig(
        frontend=FrontendConfig(height=sh, width=sw, num_levels=3,
                                max_keypoints=512),
        tracking=tcfg,
        loop=lcfg)
    lap = generate_lap_sequence(n_frames=lap_n, shape=(sh, sw),
                                lap_frames=110)
    rng = np.random.RandomState(0)
    dep = np.asarray(lap.depth)
    noisy = jnp.asarray(
        dep * (1.0 + 0.02 * dep * rng.randn(*dep.shape).astype(np.float32)))

    def scan_run():
        st = ss.init_scan_state(lap.gray[0], noisy[0], lap.intrinsics, scfg)
        t0 = time.perf_counter()
        final, out = ss.slam_scan(st, lap.gray[1:], noisy[1:],
                                  lap.intrinsics, scfg)
        np.asarray(out.T_rel)
        return lap_n / (time.perf_counter() - t0), final, out

    t0 = time.perf_counter()
    scan_run()  # compile
    compile_s = time.perf_counter() - t0
    fpss = []
    for _ in range(args.reps):
        f, final, out = scan_run()
        fpss.append(round(f, 1))
    poses = np.concatenate([
        np.asarray(final.m.kf_pose)[:1], ss.compose_trajectory(final, out)])
    r = ate(jnp.asarray(poses), lap.poses)
    print(json.dumps({
        "scan_fps": max(fpss), "all_reps": fpss,
        "compile_s": round(compile_s, 1),
        "ate_cm": round(float(r.rmse) * 100.0, 2),
        "loops": int(final.num_loops),
        "keyframes": int(final.m.num_kf),
    }))


if __name__ == "__main__":
    main()
