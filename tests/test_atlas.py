"""Atlas multi-map test (driver config #4): a sensor blackout forces
tracking loss; the system must archive the map, start a new one, and keep
tracking. Mirrors reference policy (tracker.rs:549-581, atlas.rs:52-95).
"""
import numpy as np
import pytest

from orbslam3_tpu.frontend.orb import OrbConfig
from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
from orbslam3_tpu.map.slam_map import MapCapacity, count_map_keyframes
from orbslam3_tpu.models.slam import SlamConfig, SlamSystem
from orbslam3_tpu.models.tracker import TrackConfig


@pytest.mark.slow
def test_blackout_creates_new_map():
    cfg = SyntheticConfig(
        width=384, height=256, fx=240.0, fy=240.0, n_landmarks=600,
        duration=6.0, cam_hz=10.0, pos_amp=(1.2, 0.8, 0.3),
    )
    world = SyntheticWorld(cfg)
    slam_cfg = SlamConfig(
        orb=OrbConfig(n_features=384, n_levels=4),
        cap=MapCapacity(max_kf=96, n_feat=384, max_mp=8192, max_obs=8),
        track=TrackConfig(p_local=2048),
        ba_points=1024,
        use_imu=False,
        kf_max_frames=2,
        lost_timeout=0.3,
        min_kfs_keep_map=5,
    )
    slam = SlamSystem(world.cam, slam_cfg)

    times = world.frame_times()
    blank = np.full((cfg.height, cfg.width), 127.0, np.float32)
    blackout = (2.0, 3.0)  # 1 s of featureless frames
    for t in times:
        if blackout[0] <= t < blackout[1]:
            left = right = blank
        else:
            left, right = world.render_frame(t)
        slam.process_frame(left, right, np.zeros((0, 3)), np.zeros((0, 3)),
                           np.zeros(0), float(t))

    assert slam.n_maps_created >= 2, "blackout did not trigger a new map"
    # old map archived (its keyframes still valid), new map active + tracking
    maps = np.asarray(slam.map.kf_map_id)[np.asarray(slam.map.kf_valid)]
    assert len(set(maps.tolist())) >= 2
    n_active = int(count_map_keyframes(slam.map, slam.map.active_map))
    assert n_active >= 3
    # tracking recovered after the blackout
    post = [r for r in slam.trajectory if r.t > blackout[1] + 0.5]
    ok_frac = sum(r.state == "Ok" for r in post) / max(len(post), 1)
    assert ok_frac > 0.8, ok_frac
