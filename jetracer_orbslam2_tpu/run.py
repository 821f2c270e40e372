"""CLI entry: run SLAM or odometry on a dataset directory.

    python -m jetracer_orbslam2_tpu.run --dataset /path/to/tum_seq
    python -m jetracer_orbslam2_tpu.run --dataset /path/to/euroc/mav0 --mode slam
    python -m jetracer_orbslam2_tpu.run --synthetic 100 --mode odometry

Replaces the reference's `main()` process bring-up (src/main.cpp:19-53):
config -> dataset -> pipeline -> per-frame processing -> report, with
clean ctrl-C shutdown (the reference's SIGINT path, main.cpp:26-30).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def build_argparser():
    p = argparse.ArgumentParser(description="TPU-native SLAM runner")
    p.add_argument("--dataset", help="TUM / EuRoC mav0 / KITTI sequence dir")
    p.add_argument("--synthetic", type=int, default=0,
                   help="run on N synthetic frames instead of a dataset")
    p.add_argument("--mode", choices=("odometry", "slam"), default="slam")
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--checkpoint", help="directory to save the final map")
    p.add_argument("--resume", help="checkpoint directory to start from")
    p.add_argument("--max-keypoints", type=int, default=1024)
    p.add_argument("--levels", type=int, default=4)
    p.add_argument("--json", action="store_true",
                   help="print one JSON result line (for tooling)")
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jetracer_orbslam2_tpu.config import (
        FrontendConfig, MapConfig, SystemConfig)
    from jetracer_orbslam2_tpu.evaluation import ate
    from jetracer_orbslam2_tpu.models.slam import Slam
    from jetracer_orbslam2_tpu.models.stereo import frontend_stereo
    from jetracer_orbslam2_tpu.runtime.pipeline import FramePipeline

    if args.synthetic:
        from jetracer_orbslam2_tpu.io.synthetic import generate_sequence

        n = args.synthetic
        seq = generate_sequence(n_frames=n, shape=(480, 640))
        h, w = 480, 640
        intr = seq.intrinsics
        baseline = 0.0
        gt = np.asarray(seq.poses)

        def frames():
            for i in range(n):
                yield (np.asarray(seq.gray[i]), np.asarray(seq.depth[i]),
                       None, None)
    elif args.dataset:
        from jetracer_orbslam2_tpu.io.datasets import open_dataset

        ds = open_dataset(args.dataset)
        n = len(ds) if not args.max_frames else min(len(ds), args.max_frames)
        f0 = ds.frame(0)
        h, w = f0.gray.shape
        intr = ds.intrinsics
        baseline = ds.baseline
        gt = ds.groundtruth[:n] if ds.groundtruth is not None else None
        # per-frame IMU packets when the dataset ships an IMU (EuRoC imu0)
        imu_pk = getattr(ds, "imu_packets", lambda: None)()

        def frames():
            for i in range(n):
                fr = ds.frame(i)
                pk = None
                if imu_pk is not None:
                    g, gts, a, gok, aok = imu_pk
                    pk = (g[i], gts[i], a[i], gok[i], aok[i])
                yield (fr.gray, fr.depth, fr.right, pk)
    else:
        print("need --dataset or --synthetic", file=sys.stderr)
        return 2

    cfg = SystemConfig(
        frontend=FrontendConfig(
            height=h, width=w, num_levels=args.levels,
            max_keypoints=args.max_keypoints))
    slam = Slam(cfg, intr)
    if args.resume:
        from jetracer_orbslam2_tpu.runtime.checkpoint import load_checkpoint

        slam.m, _ = load_checkpoint(args.resume)

    is_stereo = baseline > 0.0
    t_cfg = cfg.tracking

    def stereo_feats(gray, right):
        return frontend_stereo(
            jnp.asarray(gray), jnp.asarray(right), jnp.asarray(intr),
            float(baseline), cfg.frontend,
            max_depth=t_cfg.max_depth if t_cfg.max_depth > 8 else 80.0)

    pipe = FramePipeline(frames(), capacity=8, num_workers=2)
    t0 = time.perf_counter()
    count = 0
    try:
        for gray, depth, right, imu_pkt in pipe:
            if is_stereo:
                feats = stereo_feats(gray, right)
                slam.process_features(feats, imu_packet=imu_pkt)
            else:
                slam.process_frame(jnp.asarray(gray), jnp.asarray(depth),
                                   imu_packet=imu_pkt)
            count += 1
            if count % 50 == 0:
                print(f"[{count}/{n}] kf={int(slam.m.num_kf)} "
                      f"lm={int(slam.m.num_lm)}", file=sys.stderr)
    except KeyboardInterrupt:
        print("interrupted — reporting partial run", file=sys.stderr)
    wall = time.perf_counter() - t0

    out = slam.result()
    report = {
        "frames": count,
        "fps": round(count / wall, 2),
        "keyframes": out.num_keyframes,
        "landmarks": out.num_landmarks,
        "loops": out.num_loops,
        "relocs": out.num_relocs,
        "tracked_frac": float(np.mean(out.tracked)),
        "attitude_rad": [round(float(x), 4) for x in slam.attitude],
    }
    if gt is not None and count > 1:
        r = ate(jnp.asarray(out.poses[:count]), jnp.asarray(gt[:count]))
        report["ate_rmse_m"] = round(float(r.rmse), 4)
    if args.checkpoint:
        from jetracer_orbslam2_tpu.runtime.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint, slam.m,
                        extra={"frames": count})
        report["checkpoint"] = args.checkpoint
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
