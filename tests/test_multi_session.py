"""Multi-session data parallelism: D sessions sharded one-per-device over
the 8-device CPU mesh must (a) track, (b) match the single-session pipeline
exactly on identical inputs, (c) keep sessions independent."""
import numpy as np
import pytest

from orbslam3_tpu.frontend.orb import OrbConfig
from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
from orbslam3_tpu.map.slam_map import MapCapacity
from orbslam3_tpu.models.fused import FusedSlam
from orbslam3_tpu.models.slam import SlamConfig
from orbslam3_tpu.models.tracker import TrackConfig


def _world(seed: int):
    cfg = SyntheticConfig(
        width=384, height=256, fx=240.0, fy=240.0, n_landmarks=500,
        duration=2.4, cam_hz=10.0, seed=seed,
        pos_amp=(1.0, 0.7, 0.3),
    )
    return SyntheticWorld(cfg)


def _slam_cfg():
    return SlamConfig(
        orb=OrbConfig(n_features=256, n_levels=4),
        cap=MapCapacity(max_kf=16, n_feat=256, max_mp=2048, max_obs=8),
        track=TrackConfig(p_local=1024),
        ba_points=512,
        use_imu=False,
        kf_max_frames=3,
    )


@pytest.mark.slow
def test_multi_session_matches_single_and_isolates():
    from orbslam3_tpu.parallel.multi_session import MultiSessionSlam

    D = 8
    chunk = 4
    worlds = [_world(seed=11 + (s % 2)) for s in range(D)]  # two scenes
    slam_cfg = _slam_cfg()
    ms = MultiSessionSlam(worlds[0].cam, slam_cfg, n_sessions=D, chunk=chunk)

    times = worlds[0].frame_times()
    frames = [
        [w.render_frame(t) for t in times] for w in worlds[:2]
    ]  # render each distinct scene once
    for i, t in enumerate(times):
        for s in range(D):
            left, right = frames[s % 2][i]
            t_next = times[i + 1] if i + 1 < len(times) else t + 0.1
            g, a, d = worlds[s].imu_window(t, t_next)
            ms.process_frame(s, left, right, g, a, d, float(t))
    ms.flush()

    # single-session reference: FusedSlam with the same chunking on the
    # same frames must produce the same trajectory (same program, same
    # inputs — the mesh only distributes it)
    single = FusedSlam(worlds[0].cam, slam_cfg, chunk=chunk, service_every=10**9)
    for i, t in enumerate(times):
        left, right = frames[0][i]
        t_next = times[i + 1] if i + 1 < len(times) else t + 0.1
        g, a, d = worlds[0].imu_window(t, t_next)
        single.process_frame(left, right, g, a, d, float(t))
    single.flush()

    t0, p0, q0 = ms.trajectory_arrays(0)
    # corrected=False: compare the raw tracked stream (multi-session export
    # is raw; the corrected recomposition is per-session host work)
    ts1, p1, q1 = single.trajectory_arrays(corrected=False)
    n = min(len(p0), len(p1))
    assert n >= len(times) - chunk
    np.testing.assert_allclose(p0[:n], p1[:n], atol=1e-4)

    # sessions of the SAME scene agree; different scenes differ
    _, p2, _ = ms.trajectory_arrays(2)  # scene 0 again
    _, p1s, _ = ms.trajectory_arrays(1)  # scene 1
    np.testing.assert_allclose(p0[:n], p2[:n], atol=1e-4)
    assert np.abs(p0[:n] - p1s[:n]).max() > 1e-3

    # per-session unstack yields a usable MapState
    st0, ts0 = ms.session_state(0)
    assert int(st0.n_kf) >= 2
    assert int(st0.n_mp) > 100

    # all sessions actually tracked (not lost): keyframes in every map
    for s in range(D):
        st_s, _ = ms.session_state(s)
        assert int(st_s.n_kf) >= 2, s
