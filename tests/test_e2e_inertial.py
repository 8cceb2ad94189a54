"""End-to-end stereo-inertial SLAM on a synthetic sequence (driver config #2):
IMU initialization must trigger, recover the world gravity direction, and
tracking must stay Ok with ATE comparable to stereo-only.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.eval.metrics import ate_rmse
from orbslam3_tpu.frontend.orb import OrbConfig
from orbslam3_tpu.geometry import quat
from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
from orbslam3_tpu.map.slam_map import MapCapacity
from orbslam3_tpu.models.slam import SlamConfig, SlamSystem
from orbslam3_tpu.models.tracker import TrackConfig


@pytest.mark.slow
def test_stereo_inertial_slam():
    cfg = SyntheticConfig(
        width=384, height=256, fx=240.0, fy=240.0, n_landmarks=600,
        duration=4.0, cam_hz=10.0, pos_amp=(1.2, 0.8, 0.3),
        gyro_bias=(0.003, -0.002, 0.004),
        accel_bias=(0.03, 0.02, -0.04),
    )
    world = SyntheticWorld(cfg)
    slam_cfg = SlamConfig(
        orb=OrbConfig(n_features=384, n_levels=4),
        cap=MapCapacity(max_kf=64, n_feat=384, max_mp=8192, max_obs=8),
        track=TrackConfig(p_local=2048),
        ba_points=1024,
        use_imu=True,
        kf_max_frames=2,
        imu_init_kfs=8,
    )
    slam = SlamSystem(world.cam, slam_cfg)

    times = world.frame_times()
    for i, t in enumerate(times):
        left, right = world.render_frame(t)
        # IMU window = samples between the PREVIOUS frame and this one
        t_prev = times[i - 1] if i > 0 else t
        g, a, d = world.imu_window(t_prev, t)
        slam.process_frame(left, right, g, a, d, float(t))

    assert slam.imu_initialized, "IMU initialization never triggered"

    # gravity direction: SLAM world = first body frame, so true gravity in
    # SLAM world is R_wb(0)^T * (0,0,-9.81)
    q0, _ = world.gt_pose(0.0)
    g_true = np.asarray(quat.rotate(quat.conj(jnp.asarray(q0)), jnp.asarray([0.0, 0, -9.81])))
    g_est = np.asarray(slam.gravity_w)
    cos = g_true @ g_est / (np.linalg.norm(g_true) * np.linalg.norm(g_est))
    ang_deg = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    assert ang_deg < 5.0, f"gravity direction error {ang_deg:.1f} deg"

    # gyro bias recovered to its observability limit (~0.01 rad/s from
    # ~1.5 s of visually-noisy keyframe poses)
    np.testing.assert_allclose(
        np.asarray(slam.bg), np.asarray(cfg.gyro_bias), atol=1.5e-2
    )

    states = [r.state for r in slam.trajectory]
    ok_frac = sum(s == "Ok" for s in states) / len(states)
    assert ok_frac > 0.9

    ts, ps, qs = slam.trajectory_arrays()
    gt_p, _ = world.gt_trajectory()
    ate = ate_rmse(ps, gt_p[: len(ps)])
    assert ate < 0.06, f"ATE {ate:.3f} m"
