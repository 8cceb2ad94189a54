"""Fixed-capacity structure-of-arrays SLAM map (SURVEY.md §7.1 item 1).

Replaces the reference's pointer/HashMap world
(/root/reference/src/atlas/map/{map.rs,keyframe.rs,map_point.rs}) with
preallocated device arrays + validity masks: insertion appends rows, culling
flips masks, covisibility is an incrementally-maintained (K, K) weight
matrix updated by scatters. Every mutation is a jitted donate-friendly
function MapState -> MapState.
"""
from orbslam3_tpu.map.slam_map import MapCapacity, MapState  # noqa: F401
