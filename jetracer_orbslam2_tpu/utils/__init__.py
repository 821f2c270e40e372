"""Host utilities: logging, timers, metrics."""

from jetracer_orbslam2_tpu.utils.timing import Timer, StageTimers  # noqa: F401
