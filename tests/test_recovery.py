"""Recovery parity (VERDICT r1 missing #3/#4): the fused tracker must ride
out brief occlusions the way the reference does — reference-keyframe
fallback matching (tracker.rs:992), keyframe insertion on IMU
dead-reckoning while RecentlyLost (mInsertKFsLost, tracker.rs:232-268) —
and a static start must trigger the bad_imu map reset instead of a
poisoned gravity/bias initialization (imu_init.rs:194-233).
"""
import numpy as np
import pytest

from orbslam3_tpu.frontend.orb import OrbConfig
from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
from orbslam3_tpu.map.slam_map import MapCapacity
from orbslam3_tpu.models.fused import FusedSlam
from orbslam3_tpu.models.slam import SlamConfig, SlamSystem
from orbslam3_tpu.models.tracker import TrackConfig


@pytest.mark.slow
def test_blackout_bridged_with_imu_keyframes():
    """With IMU initialized, a 0.7 s blackout shorter than lost_timeout
    must be bridged — keyframes keep coming on dead-reckoning, the map is
    NOT reset or replaced, and tracking re-acquires on the SAME map."""
    cfg = SyntheticConfig(
        width=384, height=256, fx=240.0, fy=240.0, n_landmarks=600,
        duration=5.0, cam_hz=10.0, pos_amp=(1.2, 0.8, 0.3),
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
        lost_timeout=1.5,
    )
    slam = FusedSlam(world.cam, slam_cfg, service_every=4)

    times = world.frame_times()
    blank = np.full((cfg.height, cfg.width), 127.0, np.float32)
    blackout = (3.0, 3.7)
    for i, t in enumerate(times):
        if blackout[0] <= t < blackout[1]:
            left = right = blank
        else:
            left, right = world.render_frame(t)
        t_prev = times[i - 1] if i > 0 else t
        g, a, d = world.imu_window(t_prev, t)
        slam.process_frame(left, right, g, a, d, float(t))
    slam.flush()

    assert slam.imu_initialized, "IMU never initialized before blackout"
    # the map survived: no new map was created
    assert int(slam.map.next_map_id) == 1, "blackout reset/archived the map"

    ts_, outs, _ = slam._flat_outs()
    ts_ = np.asarray(ts_)
    modes = np.array([int(o.mode) for o in outs])
    kf_flags = np.array([bool(o.is_kf) for o in outs])
    in_blackout = (ts_ >= blackout[0]) & (ts_ < blackout[1])
    post = ts_ > blackout[1] + 0.4

    # dead-reckoning keyframes were inserted during the blackout
    assert kf_flags[in_blackout].sum() >= 1, "no keyframes while RecentlyLost"
    # and tracking re-acquired on the same map afterwards
    ok_frac = (modes[post] == 1).mean()
    assert ok_frac > 0.8, f"post-blackout ok fraction {ok_frac:.2f}"
    # trajectory error stays bounded through the occlusion
    from orbslam3_tpu.eval.metrics import ate_rmse

    ps = np.stack([np.asarray(o.p) for o in outs])
    gt_p, _ = world.gt_trajectory()
    ate = ate_rmse(ps, gt_p[: len(ps)])
    assert ate < 0.12, f"ATE {ate:.3f} m through blackout"


@pytest.mark.slow
def test_poisoned_motion_model_recovers_via_ransac():
    """Deliberately corrupt the tracker's pose + motion model mid-run
    (simulating violent unmodeled motion). The prior-seeded GN alone can't
    converge from a 30-degree / 1 m wrong seed; the batched 3D-3D RANSAC on
    the fallback matches must re-acquire within a few frames (VERDICT r2
    missing #3 — the reference survives this via solve_pnp_ransac)."""
    import jax.numpy as jnp

    from orbslam3_tpu.geometry import quat
    from orbslam3_tpu.models.fused import MODE_OK

    cfg = SyntheticConfig(
        width=384, height=256, fx=240.0, fy=240.0, n_landmarks=600,
        duration=5.0, cam_hz=10.0, pos_amp=(1.2, 0.8, 0.3),
    )
    world = SyntheticWorld(cfg)
    slam_cfg = SlamConfig(
        orb=OrbConfig(n_features=384, n_levels=4),
        cap=MapCapacity(max_kf=64, n_feat=384, max_mp=8192, max_obs=8),
        track=TrackConfig(p_local=2048),
        ba_points=1024,
        use_imu=False,  # motion model is the only prior -> poisoning hurts
        kf_max_frames=2,
        lost_timeout=2.0,
    )
    slam = FusedSlam(world.cam, slam_cfg, service_every=4)
    times = world.frame_times()
    poison_t = 3.0
    poisoned = False
    for i, t in enumerate(times):
        if not poisoned and t >= poison_t:
            slam.flush()  # materialize ts before mutating it
            dq = quat.from_axis_angle(jnp.asarray([0.0, 0.5, 0.2]))  # ~31 deg
            slam.ts = slam.ts._replace(
                q=quat.normalize(quat.mul(slam.ts.q, dq)),
                p=slam.ts.p + jnp.asarray([0.8, -0.6, 0.4]),
                motion_dq=quat.from_axis_angle(jnp.asarray([0.2, -0.1, 0.3])),
                motion_dp=jnp.asarray([0.5, 0.5, -0.3]),
            )
            poisoned = True
        left, right = world.render_frame(t)
        slam.process_frame(left, right, np.zeros((0, 3)), np.zeros((0, 3)),
                           np.zeros(0), float(t))
    slam.flush()

    ts_, outs, _ = slam._flat_outs()
    ts_ = np.asarray(ts_)
    modes = np.array([int(o.mode) for o in outs])
    # recovered within 0.5 s of the poisoning and stays Ok
    post = ts_ >= poison_t + 0.5
    ok_frac = (modes[post] == MODE_OK).mean()
    assert ok_frac > 0.9, f"post-poison ok fraction {ok_frac:.2f}"
    # the recovered trajectory re-anchors to the map (not a parallel
    # drifted copy): end-segment ATE stays small
    from orbslam3_tpu.eval.metrics import ate_rmse

    ps = np.stack([np.asarray(o.p) for o in outs])
    gt_p, _ = world.gt_trajectory()
    tail = ts_ >= poison_t + 0.5
    ate = ate_rmse(ps[tail], gt_p[: len(ps)][tail])
    assert ate < 0.12, f"post-recovery ATE {ate:.3f} m"


@pytest.mark.slow
def test_static_start_triggers_bad_imu_reset():
    """A motionless camera: IMU init must never run (gravity/bias
    unobservable) and after bad_imu_timeout the map resets."""
    cfg = SyntheticConfig(
        width=256, height=192, fx=160.0, fy=160.0, n_landmarks=400,
        duration=13.0, cam_hz=4.0,
        pos_amp=(0.0, 0.0, 0.0), yaw_amp=0.0, rp_amp=0.0,
    )
    world = SyntheticWorld(cfg)
    slam_cfg = SlamConfig(
        orb=OrbConfig(n_features=256, n_levels=3),
        cap=MapCapacity(max_kf=64, n_feat=256, max_mp=4096, max_obs=8),
        track=TrackConfig(p_local=1024),
        ba_points=512,
        use_imu=True,
        kf_max_frames=2,
        imu_init_kfs=6,
        bad_imu_timeout=8.0,
    )
    slam = FusedSlam(world.cam, slam_cfg, service_every=4)
    times = world.frame_times()
    for i, t in enumerate(times):
        left, right = world.render_frame(t)
        t_prev = times[i - 1] if i > 0 else t
        g, a, d = world.imu_window(t_prev, t)
        slam.process_frame(left, right, g, a, d, float(t))
    slam.flush()

    assert not slam.imu_initialized, "static start must not initialize IMU"
    assert getattr(slam, "bad_imu_resets", 0) >= 1, "bad_imu reset never fired"
