"""Pipeline models: tracker, local mapper, SLAM system orchestration.

The 'flagship model' of this framework is the stereo-inertial SLAM engine:
frame in -> pose out, with background map refinement. Replaces the
reference's 3-thread architecture (src/system/slam_system.rs) with host
orchestration of jitted device programs (SURVEY.md §7.1 item 6).
"""
from orbslam3_tpu.models.slam import SlamSystem, SlamConfig  # noqa: F401
