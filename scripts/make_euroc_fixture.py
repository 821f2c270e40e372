"""Generate the committed EuRoC-layout test fixture
(tests/fixtures/euroc_tiny/mav0): real 8-bit stereo PNGs under
cam0/ + cam1/ with data.csv nanosecond indexes, imu0/data.csv at 200 Hz,
state_groundtruth_estimate0/data.csv, and cam0/sensor.yaml intrinsics — so
`run.py --dataset` exercises the stereo front-end, the KITTI/EuRoC csv
parsers, and the IMU-packet plumbing from real on-disk files (round-2
VERDICT missing item 4).  Deterministic.

    PYTHONPATH=. python scripts/make_euroc_fixture.py
"""

from __future__ import annotations

import os

import numpy as np


def main(out="tests/fixtures/euroc_tiny/mav0", n=20, h=120, w=160,
         fps=20.0, imu_rate=200.0, dist_l=None, dist_r=None,
         right_rot=None) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from jetracer_orbslam2_tpu.io.synthetic import generate_stereo_sequence
    from jetracer_orbslam2_tpu.ops import geometry as geo

    baseline = 0.110074                       # EuRoC cam0-cam1 baseline
    seq = generate_stereo_sequence(
        n_frames=n, shape=(h, w), seed=11, step=0.035, yaw_rate=0.01,
        baseline=baseline, dist_l=dist_l, dist_r=dist_r,
        right_rotation=right_rot)

    t0_ns = 1_403_636_579_763_555_584         # EuRoC MH01-style epoch ns
    frame_ns = (t0_ns + (np.arange(n) / fps * 1e9)).astype(np.int64)

    for cam, imgs in (("cam0", seq.left), ("cam1", seq.right)):
        os.makedirs(os.path.join(out, cam, "data"), exist_ok=True)
        lines = ["#timestamp [ns],filename"]
        for i in range(n):
            name = f"{frame_ns[i]}.png"
            arr = np.asarray(imgs[i]).clip(0, 255).astype(np.uint8)
            Image.fromarray(arr, mode="L").save(
                os.path.join(out, cam, "data", name), optimize=True)
            lines.append(f"{frame_ns[i]},{name}")
        with open(os.path.join(out, cam, "data.csv"), "w") as f:
            f.write("\n".join(lines) + "\n")

    intr = np.asarray(seq.intrinsics)
    if dist_l is None and dist_r is None and right_rot is None:
        # pre-rectified fixture: the minimal yaml (baseline shorthand)
        with open(os.path.join(out, "cam0", "sensor.yaml"), "w") as f:
            f.write("sensor_type: camera\ncamera_model: pinhole\n"
                    f"intrinsics: [{intr[0]:.4f}, {intr[1]:.4f}, "
                    f"{intr[2]:.4f}, {intr[3]:.4f}]\n"
                    f"baseline: {baseline}\n"
                    f"resolution: [{w}, {h}]\n")
    else:
        # REAL EuRoC distribution format: per-camera T_BS (body = cam0
        # frame here) + radial-tangential distortion_coefficients —
        # exercises the loader's extrinsics/distortion parsing and the
        # keypoint-level rectification end to end
        shift = np.eye(4)
        shift[0, 3] = baseline
        if right_rot is not None:
            shift[:3, :3] = np.asarray(
                geo.so3_exp(jnp.asarray(right_rot, jnp.float32)))
        T_BS = {"cam0": np.eye(4), "cam1": shift}
        dists = {"cam0": dist_l or (0.0,) * 4, "cam1": dist_r or (0.0,) * 4}
        for cam in ("cam0", "cam1"):
            rows = ",\n         ".join(
                ", ".join(f"{x:.9f}" for x in T_BS[cam][r]) for r in range(4))
            d = dists[cam][:4]
            with open(os.path.join(out, cam, "sensor.yaml"), "w") as f:
                f.write(
                    "sensor_type: camera\n"
                    "T_BS:\n  cols: 4\n  rows: 4\n"
                    f"  data: [{rows}]\n"
                    "camera_model: pinhole\n"
                    f"intrinsics: [{intr[0]:.4f}, {intr[1]:.4f}, "
                    f"{intr[2]:.4f}, {intr[3]:.4f}]\n"
                    "distortion_model: radial-tangential\n"
                    f"distortion_coefficients: [{d[0]}, {d[1]}, {d[2]}, "
                    f"{d[3]}]\n"
                    f"resolution: [{w}, {h}]\n")

    # --- groundtruth: ts[ns], p(3), q(w,x,y,z) ---------------------------
    os.makedirs(os.path.join(out, "state_groundtruth_estimate0"),
                exist_ok=True)
    P = np.asarray(seq.poses)
    lines = ["#timestamp,p_x,p_y,p_z,q_w,q_x,q_y,q_z"]
    for i in range(n):
        R, t = P[i, :3, :3], P[i, :3, 3]
        qw = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
        qx = (R[2, 1] - R[1, 2]) / (4 * qw)
        qy = (R[0, 2] - R[2, 0]) / (4 * qw)
        qz = (R[1, 0] - R[0, 1]) / (4 * qw)
        lines.append(f"{frame_ns[i]},{t[0]:.6f},{t[1]:.6f},{t[2]:.6f},"
                     f"{qw:.6f},{qx:.6f},{qy:.6f},{qz:.6f}")
    with open(os.path.join(out, "state_groundtruth_estimate0", "data.csv"),
              "w") as f:
        f.write("\n".join(lines) + "\n")

    # --- imu0: 200 Hz constant-twist gyro + gravity-direction accel ------
    # (the quantities the complementary filter consumes; reference streams
    # the same live, src/RealSense/RealSenseD400.cpp:114-150)
    os.makedirs(os.path.join(out, "imu0"), exist_ok=True)
    g = 9.81
    rel = np.einsum("nij,njk->nik", P[:-1, :3, :3].transpose(0, 2, 1),
                    P[1:, :3, :3])
    omega = np.asarray(jax.vmap(geo.so3_log)(jnp.asarray(rel))) * fps
    lines = ["#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z"]
    S = int(imu_rate / fps)
    for i in range(n - 1):
        for s in range(S):
            ts = frame_ns[i] + int(s / imu_rate * 1e9)
            a = P[i, :3, :3].T @ np.asarray([0.0, g, 0.0])
            lines.append(
                f"{ts},{omega[i,0]:.6f},{omega[i,1]:.6f},{omega[i,2]:.6f},"
                f"{a[0]:.6f},{a[1]:.6f},{a[2]:.6f}")
    with open(os.path.join(out, "imu0", "data.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")

    total = sum(os.path.getsize(os.path.join(dp, fn))
                for dp, _, fns in os.walk(out) for fn in fns)
    print(f"wrote {n} stereo frames + IMU to {out} ({total/1024:.0f} KiB)")


if __name__ == "__main__":
    import sys

    if "--dist" in sys.argv:
        # the non-pre-rectified twin of euroc_tiny: same trajectory/scene,
        # distorted lenses + a tilted right camera (VERDICT round-3 item 1)
        main(out="tests/fixtures/euroc_tiny_dist/mav0", n=16, h=240, w=320,
             dist_l=(-0.25, 0.06, 5e-4, 5e-4),
             dist_r=(-0.22, 0.05, -4e-4, 3e-4),
             right_rot=(0.008, -0.015, 0.004))
    else:
        main()
