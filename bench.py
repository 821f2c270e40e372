"""Headline benchmark: RGB-D tracking throughput, frames/s on one chip.

The reference's design rate is 848x480 @ 60 fps on a Jetson GPU
(reference src/Context.h:16-18, src/RealSense/RealSenseD400.cpp:166-170) —
no measured numbers were ever published (BASELINE.md), so 60 fps (the
camera's rate, the ceiling the pipeline was built to) is the baseline we
compare against at the same 480-row resolution class.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from jetracer_orbslam2_tpu.config import FrontendConfig, TrackingConfig
    from jetracer_orbslam2_tpu.io.synthetic import generate_sequence
    from jetracer_orbslam2_tpu.models.odometry import init_state, odometry_scan
    from jetracer_orbslam2_tpu.evaluation import (
        ate, rpe_drift, rpe_drift_median)

    H, W = 480, 640
    N = 120
    seq = generate_sequence(n_frames=N, shape=(H, W))
    fcfg = FrontendConfig(height=H, width=W)
    tcfg = TrackingConfig()
    intr = seq.intrinsics

    gray = jax.device_put(seq.gray)
    depth = jax.device_put(seq.depth)

    # warm up / compile.  NOTE: timing must go through a host fetch —
    # block_until_ready has been observed returning early on tunneled
    # backends, producing absurd fps numbers.
    state0 = init_state(gray[0], depth[0], intr, fcfg, tcfg)
    _, poses_d, ok = odometry_scan(state0, gray[1:], depth[1:], intr, fcfg, tcfg)
    np.asarray(poses_d)

    # timed: whole-sequence scan on device (dataset-replay throughput);
    # best of 3 to shed tunnel jitter, fetch (7 KB) inside the timed region
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, poses_d, ok = odometry_scan(
            state0, gray[1:], depth[1:], intr, fcfg, tcfg)
        np.asarray(poses_d)
        dts.append(time.perf_counter() - t0)
    fps = (N - 1) / min(dts)

    # sanity: the benchmark only counts if tracking actually works
    poses = np.concatenate([np.eye(4)[None], np.asarray(poses_d)])
    r = ate(jnp.asarray(poses), seq.poses[:N])
    rmse_cm = float(r.rmse) * 100.0
    if not np.isfinite(rmse_cm) or rmse_cm > 10.0:
        print(json.dumps({
            "metric": "tracking_fps_640x480",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"tracking diverged: ATE {rmse_cm:.1f} cm",
        }))
        sys.exit(1)

    # BA kernel speed (BASELINE.md targets table: "BA ms/iter"): the
    # windowed-BA config (8 poses, 4096 landmarks, depth-anchored LM with
    # Schur complement) on a 1-device mesh — the same sharded program the
    # live system dispatches per keyframe.  iters=50 amortizes the fixed
    # per-call cost (~1 tunnel roundtrip); the iters=10 number is also
    # reported for continuity with rounds 1-2.
    from jetracer_orbslam2_tpu.config import BAConfig
    from jetracer_orbslam2_tpu.parallel.bench_ba import (
        make_synthetic_ba, time_sharded_ba)

    ba_prob, ba_intr = make_synthetic_ba(n_poses=8, n_landmarks=4096,
                                         obs_per_lm=6)
    ba10 = time_sharded_ba(ba_prob, ba_intr, 1, BAConfig(iters=10), reps=3)
    ba50 = time_sharded_ba(ba_prob, ba_intr, 1, BAConfig(iters=50), reps=3)

    # full SLAM-system throughput (VERDICT round-2 item 2): host-scheduled
    # loop with keyframe inserts, windowed BA, loop closure and the
    # one-packed-fetch-per-frame scheduler, on a noisy synthetic lap.
    # Cold run compiles; the warm second run is the honest number.
    from jetracer_orbslam2_tpu.config import (
        FrontendConfig, SystemConfig, TrackingConfig)
    from jetracer_orbslam2_tpu.io.synthetic import generate_lap_sequence
    from jetracer_orbslam2_tpu.models.slam import Slam

    # NOTE on configs (VERDICT round-4 weak #7): this gated lap stays at
    # 240x180 with 2%·z^2 depth noise for continuity with the rounds-2-4
    # metric series (same seeds, same gates); the long-sequence benchmark
    # (scripts/bench_long.py) runs the production-resolution counterpart —
    # 640x480, 1,200 frames, 1%·z^2 (the D435i's ~1% of z^2 spec).  Both
    # are published in BASELINE.md; the difference is deliberate: this one
    # is the tight regression gate, that one is the realism benchmark.
    sh, sw = 180, 240
    lap_n = 126
    scfg = SystemConfig(
        frontend=FrontendConfig(height=sh, width=sw, num_levels=3,
                                max_keypoints=512),
        tracking=TrackingConfig(match_window=16.0))
    lap = generate_lap_sequence(n_frames=lap_n, shape=(sh, sw),
                                lap_frames=110)
    rng = np.random.RandomState(0)
    dep = np.asarray(lap.depth)
    noisy = jnp.asarray(
        dep * (1.0 + 0.02 * dep * rng.randn(*dep.shape).astype(np.float32)))

    def slam_run():
        slam = Slam(scfg, lap.intrinsics)
        t0 = time.perf_counter()
        for i in range(lap_n):
            slam.process_frame(lap.gray[i], noisy[i])
        return lap_n / (time.perf_counter() - t0), slam

    slam_run()                                    # compile all graphs
    slam_fps, slam_obj = max(                     # best of 2 (tunnel jitter)
        (slam_run() for _ in range(2)), key=lambda t: t[0])
    slam_out = slam_obj.result()
    slam_ate_cm = float(ate(
        jnp.asarray(slam_out.poses), lap.poses).rmse) * 100.0

    # slam_scan: the SAME full system compiled as one lax.scan over the
    # sequence — zero host round trips (models/slam_scan.py); this is the
    # dataset-replay SLAM throughput per chip.
    from jetracer_orbslam2_tpu.models import slam_scan as ss

    def scan_run():
        st = ss.init_scan_state(lap.gray[0], noisy[0], lap.intrinsics, scfg)
        t0 = time.perf_counter()
        final, out = ss.slam_scan(st, lap.gray[1:], noisy[1:],
                                  lap.intrinsics, scfg)
        trel = np.asarray(out.T_rel)              # one fetch = completion
        return lap_n / (time.perf_counter() - t0), final, out

    scan_run()                                    # compile
    best = 0.0
    for _ in range(3):
        f, scan_final, scan_out = scan_run()
        best = max(best, f)

    # chunked online mode: one host sync per 8-frame chunk (the
    # micro-batched latency-hiding the reference used worker threads for)
    def chunked_run():
        ch = ss.ChunkedSlam(scfg, lap.intrinsics, chunk_size=8)
        t0 = time.perf_counter()
        for i in range(lap_n):
            ch.process_frame(lap.gray[i], noisy[i])
        ch.flush()
        return lap_n / (time.perf_counter() - t0)

    chunked_run()                                 # compile (padded flush)
    chunk_fps = max(chunked_run() for _ in range(2))
    scan_poses = np.concatenate([
        np.asarray(scan_final.m.kf_pose)[:1],
        ss.compose_trajectory(scan_final, scan_out)])
    scan_ate_cm = float(ate(
        jnp.asarray(scan_poses), lap.poses).rmse) * 100.0

    # full-SLAM quality gate (VERDICT round-3 item 3): the benchmark only
    # counts if the whole system — loop closure included — holds its
    # accuracy on the noisy lap.  Gate = round-4's measured 24.8 cm + ~8%
    # margin (VERDICT round-4 weak #3: the old 30 cm gate was 21% above
    # the measured value, letting a 10-15% quality regression ship).
    if not np.isfinite(scan_ate_cm) or scan_ate_cm > 27.0:
        print(json.dumps({
            "metric": "tracking_fps_640x480",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"full-SLAM diverged: scan ATE {scan_ate_cm:.1f} cm",
        }))
        sys.exit(1)

    # drift rate (RPE per meter, KITTI convention) for the scan lap —
    # quantifies local drift independent of the loop-closure correction.
    # delta chosen so segments are ~1 m of travel (the lap moves ~6.9 cm
    # per frame): shorter segments measure per-frame jitter, not drift.
    scan_drift, scan_rot_drift = rpe_drift(
        jnp.asarray(scan_poses), lap.poses, delta=15)
    scan_drift_med, _ = rpe_drift_median(
        jnp.asarray(scan_poses), lap.poses, delta=15)
    scan_drift_pct = float(scan_drift) * 100.0
    scan_rot_deg_m = float(np.degrees(scan_rot_drift))

    # STEREO slam_scan: the BASELINE target config (EuRoC-geometry stereo,
    # >= real-time fps/chip) as one on-device scan — depth from in-scan
    # epipolar matching + subpixel SAD (VERDICT round-4 missing #1: this
    # config had never been measured; stereo previously ran only through
    # the per-frame-sync host loop at ~24 fps on the tunnel).  Two
    # workloads through ONE compiled program (identical cfg + frame
    # count): an open ARC (clean odometric accuracy) and a LAP (revisits,
    # the close-texture-poor-wall segments that starve single-threshold
    # FAST — the adaptive two-threshold detector keeps tracking there).
    from jetracer_orbslam2_tpu.config import StereoConfig
    from jetracer_orbslam2_tpu.io.synthetic import (
        generate_stereo_lap_sequence, generate_stereo_sequence)

    sn = 120
    sseq = generate_stereo_sequence(n_frames=sn, shape=(H, W))
    lseq = generate_stereo_lap_sequence(n_frames=sn, shape=(H, W),
                                        lap_frames=105)
    st_cfg = SystemConfig(
        frontend=FrontendConfig(height=H, width=W, fast_min_threshold=7.0),
        tracking=TrackingConfig(max_depth=80.0),
        stereo=StereoConfig(baseline=float(sseq.baseline)))

    def stereo_run(seq):
        left = jax.device_put(seq.left)
        right = jax.device_put(seq.right)
        st = ss.init_scan_state(left[0], right[0], seq.intrinsics, st_cfg)
        t0 = time.perf_counter()
        final, out = ss.slam_scan(st, left[1:], right[1:],
                                  seq.intrinsics, st_cfg)
        np.asarray(out.T_rel)                 # fetch = completion
        return sn / (time.perf_counter() - t0), final, out

    def stereo_eval(seq, reps):
        best = 0.0
        for _ in range(reps):
            f, final, out = stereo_run(seq)
            best = max(best, f)
        poses = np.concatenate([
            np.asarray(final.m.kf_pose)[:1],
            ss.compose_trajectory(final, out)])
        a = float(ate(jnp.asarray(poses), seq.poses).rmse) * 100.0
        trk = float(np.asarray(out.tracked).mean())
        return best, a, trk, poses, final

    stereo_run(sseq)                          # compile (shared program)
    stereo_fps, stereo_ate_cm, s_trk, s_poses, _ = stereo_eval(sseq, 3)
    lap_fps, lap_ate_cm, lap_trk, _, lap_final = stereo_eval(lseq, 2)
    # ~1 m segments (the stereo arc moves ~2 cm per frame)
    s_drift, _s_rot = rpe_drift(jnp.asarray(s_poses), sseq.poses, delta=50)
    # gates: measured 11.5 cm (arc) / 15.4 cm (lap, tracked 1.00, loop
    # fires) + ~30% margin.  The lap revisits texture-poor near-wall
    # views — the adaptive detector is what keeps it tracking (43.7 cm /
    # tracked 0.76 single-threshold, BASELINE.md round 5).
    if (not np.isfinite(stereo_ate_cm) or stereo_ate_cm > 15.0
            or not np.isfinite(lap_ate_cm) or lap_ate_cm > 21.0
            or lap_trk < 0.95):
        print(json.dumps({
            "metric": "tracking_fps_640x480",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": (f"stereo diverged: arc ATE {stereo_ate_cm:.1f} cm, "
                      f"lap ATE {lap_ate_cm:.1f} cm tracked {lap_trk:.2f}"),
        }))
        sys.exit(1)

    baseline_fps = 60.0   # reference camera/pipeline design rate
    print(json.dumps({
        "metric": "tracking_fps_640x480",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
        "ate_rmse_cm": round(rmse_cm, 2),
        "ba_ms_per_iter_4096lm": round(ba10["ms_per_iter"], 3),
        "ba_ms_per_iter_4096lm_amortized": round(ba50["ms_per_iter"], 3),
        "slam_fps_240x180": round(slam_fps, 2),
        "slam_loops": slam_out.num_loops,
        "slam_ate_cm": round(slam_ate_cm, 1),
        "slam_scan_fps_240x180": round(best, 2),
        "slam_scan_loops": int(scan_final.num_loops),
        "slam_scan_ate_cm": round(scan_ate_cm, 1),
        "slam_scan_drift_pct": round(scan_drift_pct, 2),
        "slam_scan_drift_median_pct": round(float(scan_drift_med) * 100, 2),
        "slam_scan_rot_drift_deg_per_m": round(scan_rot_deg_m, 3),
        "slam_chunked8_fps_240x180": round(chunk_fps, 2),
        "stereo_scan_fps_640x480": round(stereo_fps, 2),
        "stereo_scan_ate_cm": round(stereo_ate_cm, 1),
        "stereo_scan_drift_pct": round(float(s_drift) * 100.0, 2),
        "stereo_lap_fps_640x480": round(lap_fps, 2),
        "stereo_lap_ate_cm": round(lap_ate_cm, 1),
        "stereo_lap_tracked": round(lap_trk, 3),
        "stereo_lap_loops": int(lap_final.num_loops),
    }))


if __name__ == "__main__":
    main()
