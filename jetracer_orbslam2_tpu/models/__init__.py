"""Model layer: the jitted per-frame pipelines built from `ops/`.

- frontend: image -> fixed-K ORB features (+3D backprojection)
- tracking: frame-to-frame RANSAC-Kabsch odometry, ICP
- imu:      complementary attitude filter
- stereo:   stereo depth association (epipolar Hamming matching)
- backend:  keyframe map, local BA, pose graph, loop closure
- system:   the full SLAM system orchestrating all of the above
"""

from jetracer_orbslam2_tpu.models import frontend, imu, tracking  # noqa: F401
