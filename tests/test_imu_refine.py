"""Time-phased IMU-init refinement (reference: inertial_init_optim.rs:12-14
re-runs bias/gravity refinement as the map matures; VERDICT r1 missing #8 —
gravity direction was never re-estimated after the first init)."""
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.frontend.orb import OrbConfig
from orbslam3_tpu.geometry import quat
from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
from orbslam3_tpu.map.slam_map import MapCapacity
from orbslam3_tpu.models.fused import FusedSlam
from orbslam3_tpu.models.slam import SlamConfig
from orbslam3_tpu.models.tracker import TrackConfig


@pytest.mark.slow
def test_imu_refinement_phases_fire_and_hold_gravity():
    cfg = SyntheticConfig(
        width=384, height=256, fx=240.0, fy=240.0, n_landmarks=600,
        duration=7.0, cam_hz=10.0, pos_amp=(1.2, 0.8, 0.3),
        gyro_bias=(0.004, -0.003, 0.002),
        accel_bias=(0.04, -0.03, 0.02),
    )
    world = SyntheticWorld(cfg)
    slam_cfg = SlamConfig(
        orb=OrbConfig(n_features=384, n_levels=4),
        cap=MapCapacity(max_kf=96, n_feat=384, max_mp=8192, max_obs=8),
        track=TrackConfig(p_local=2048),
        ba_points=1024,
        use_imu=True,
        kf_max_frames=2,
        imu_init_kfs=6,
        imu_init_min_time=0.8,
    )
    slam = FusedSlam(world.cam, slam_cfg, service_every=4)
    times = world.frame_times()
    for i, t in enumerate(times):
        left, right = world.render_frame(t)
        t_prev = times[i - 1] if i > 0 else t
        g, a, d = world.imu_window(t_prev, t)
        slam.process_frame(left, right, g, a, d, float(t))
    slam.flush()

    assert slam.imu_initialized
    # the 5-second refinement phase must have run (init ~1.3 s, run 7 s)
    assert getattr(slam, "imu_refines", 0) >= 1, (
        f"phase={slam._imu_phase}, init_t={slam._imu_init_time}"
    )

    # gravity still accurate after refinement
    q0, _ = world.gt_pose(0.0)
    g_true = np.asarray(
        quat.rotate(quat.conj(jnp.asarray(q0)), jnp.asarray([0.0, 0, -9.81]))
    )
    g_est = np.asarray(slam.ts.gravity_w)
    cos = g_true @ g_est / (np.linalg.norm(g_true) * np.linalg.norm(g_est))
    assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 3.0

    # refined gyro bias close to truth
    np.testing.assert_allclose(
        np.asarray(slam.ts.bg), np.asarray(cfg.gyro_bias), atol=1.2e-2
    )
