"""Stereo ORB front-end: detection, description, stereo matching, frames.

Replaces /root/reference/src/tracking/frame/ (stereo.rs, camera.rs) with
jitted fixed-shape XLA programs built on orbslam3_tpu.ops.
"""
from orbslam3_tpu.frontend.camera import Camera  # noqa: F401
from orbslam3_tpu.frontend.orb import Features, detect_orb  # noqa: F401
from orbslam3_tpu.frontend.stereo import StereoFrame, process_stereo  # noqa: F401
