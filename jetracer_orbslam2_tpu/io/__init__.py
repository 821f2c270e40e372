"""Dataset IO (L0): loaders and synthetic data.

The reference ingests live RealSense frames (src/RealSense/RealSenseD400.cpp)
and can dump raw frames (SaveRawData.cpp).  Here:

- synthetic: analytic ray-cast RGB-D sequences with exact ground truth
- tum:       TUM RGB-D format loader (rgb/depth PNG + groundtruth.txt)
- euroc:     EuRoC MAV stereo format loader
- kitti:     KITTI odometry format loader
- loader:    host-side prefetching frame pipeline (native C++ decode path)
"""

from jetracer_orbslam2_tpu.io import synthetic  # noqa: F401
