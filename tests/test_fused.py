"""Fused on-device SLAM step: end-to-end parity with the host-orchestrated
system on the synthetic world (CPU), single dispatch per frame."""
import numpy as np
import pytest

from orbslam3_tpu.eval.metrics import ate_rmse
from orbslam3_tpu.frontend.orb import OrbConfig
from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
from orbslam3_tpu.map.slam_map import MapCapacity
from orbslam3_tpu.models.fused import MODE_OK, FusedSlam
from orbslam3_tpu.models.slam import SlamConfig
from orbslam3_tpu.models.tracker import TrackConfig


@pytest.mark.slow
@pytest.mark.parametrize("chunk,imu_noise", [(1, False), (4, False), (1, True)])
def test_fused_stereo_inertial(chunk, imu_noise):
    cfg = SyntheticConfig(
        width=384, height=256, fx=240.0, fy=240.0, n_landmarks=600,
        duration=4.0, cam_hz=10.0, pos_amp=(1.2, 0.8, 0.3),
        gyro_bias=(0.003, -0.002, 0.004),
        accel_bias=(0.03, 0.02, -0.04) if imu_noise else (0.0, 0.0, 0.0),
        imu_noise=imu_noise,
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
    slam = FusedSlam(world.cam, slam_cfg, service_every=4, chunk=chunk)

    times = world.frame_times()
    for i, t in enumerate(times):
        left, right = world.render_frame(t)
        t_prev = times[i - 1] if i > 0 else t
        g, a, d = world.imu_window(t_prev, t)
        slam.process_frame(left, right, g, a, d, float(t))
    slam.flush()

    modes = slam.modes()
    ok_frac = (modes == MODE_OK).mean()
    assert ok_frac > 0.9, f"Ok fraction {ok_frac}, modes {modes[:20]}"
    assert slam.imu_initialized

    ts, ps, qs = slam.trajectory_arrays()
    gt_p, _ = world.gt_trajectory()
    ate = ate_rmse(ps, gt_p[: len(ps)])
    limit = 0.08 if imu_noise else 0.06
    assert ate < limit, f"ATE {ate:.3f} m"


@pytest.mark.slow
def test_keyframe_capacity_guard():
    """When the keyframe array fills up, insertion stops gracefully instead
    of scattering out of bounds while counters advance."""
    cfg = SyntheticConfig(
        width=384, height=256, fx=240.0, fy=240.0, n_landmarks=400,
        duration=2.0, cam_hz=10.0,
    )
    world = SyntheticWorld(cfg)
    slam_cfg = SlamConfig(
        orb=OrbConfig(n_features=256, n_levels=3),
        cap=MapCapacity(max_kf=4, n_feat=256, max_mp=2048, max_obs=8),
        track=TrackConfig(p_local=1024),
        ba_points=512,
        use_imu=False,
        kf_max_frames=1,  # force a keyframe every frame
    )
    slam = FusedSlam(world.cam, slam_cfg)
    times = world.frame_times()
    for t in times:
        left, right = world.render_frame(t)
        slam.process_frame(left, right, np.zeros((0, 3)), np.zeros((0, 3)),
                           np.zeros(0), float(t))
    slam.flush()
    assert int(slam.map.n_kf) <= 4
    # tracking keeps running against the frozen map
    modes = slam.modes()
    assert (modes[-5:] != 0).all()


def test_retarget_gravity_only_on_merge():
    """A same-map loop correction keeps the map's world frame (anchor
    fixed), so the tracker's gravity estimate must NOT ride the correction
    delta; a cross-map merge re-expresses the whole frame and rotates it."""
    import jax.numpy as jnp

    from orbslam3_tpu.geometry import quat
    from orbslam3_tpu.models.fused import TrackState, _retarget_tracker

    ts = TrackState.initial()._replace(
        q=quat.from_axis_angle(jnp.asarray([0.0, 0.0, 0.3])),
        p=jnp.asarray([1.0, 2.0, 0.5]),
        v=jnp.asarray([0.2, 0.0, -0.1]),
        gravity_w=jnp.asarray([0.05, -0.02, -9.79]),
    )
    q_old = quat.from_axis_angle(jnp.asarray([0.0, 0.0, 0.25]))
    p_old = jnp.asarray([0.9, 1.9, 0.45])
    q_new = quat.from_axis_angle(jnp.asarray([0.0, 0.0, 0.10]))
    p_new = jnp.asarray([0.5, 1.7, 0.40])

    same_map = _retarget_tracker(ts, q_old, p_old, q_new, p_new,
                                 rotate_gravity=False)
    merged = _retarget_tracker(ts, q_old, p_old, q_new, p_new,
                               rotate_gravity=True)
    # pose/velocity ride the delta in both cases
    assert not np.allclose(np.asarray(same_map.p), np.asarray(ts.p))
    np.testing.assert_allclose(
        np.asarray(same_map.p), np.asarray(merged.p), atol=1e-6)
    # gravity: unchanged for same-map, rotated by the delta for merges
    np.testing.assert_allclose(
        np.asarray(same_map.gravity_w), np.asarray(ts.gravity_w), atol=1e-7)
    qd = quat.normalize(quat.mul(q_new, quat.conj(q_old)))
    np.testing.assert_allclose(
        np.asarray(merged.gravity_w),
        np.asarray(quat.rotate(qd, ts.gravity_w)), atol=1e-6)
