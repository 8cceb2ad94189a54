"""Checkpoint/export tests: save+load roundtrip, TUM/PLY writers."""
import numpy as np

from orbslam3_tpu.map.checkpoint import load_map, save_map
from orbslam3_tpu.map.slam_map import MapCapacity, empty_map, insert_keyframe
from orbslam3_tpu.models.fused import TrackState
from orbslam3_tpu.viz.export import save_map_ply, save_trajectory_tum
from tests.test_map import make_kf_inputs, CAP


def test_map_checkpoint_roundtrip(tmp_path):
    st = empty_map(CAP)
    st, _ = insert_keyframe(st, **make_kf_inputs(), new_mp_budget=16)
    ts = TrackState.initial()
    p = str(tmp_path / "map.npz")
    save_map(p, st, ts)
    st2, ts2 = load_map(p, with_track_state=True)
    assert int(st2.n_kf) == 1
    np.testing.assert_array_equal(np.asarray(st2.mp_valid), np.asarray(st.mp_valid))
    np.testing.assert_allclose(np.asarray(st2.mp_pos), np.asarray(st.mp_pos))
    np.testing.assert_allclose(
        np.asarray(st2.kf_preint.cov), np.asarray(st.kf_preint.cov)
    )
    np.testing.assert_allclose(np.asarray(ts2.q), np.asarray(ts.q))


def test_exports(tmp_path):
    st = empty_map(CAP)
    st, _ = insert_keyframe(st, **make_kf_inputs(), new_mp_budget=16)
    ply = tmp_path / "map.ply"
    save_map_ply(str(ply), st)
    text = ply.read_text()
    assert "element vertex 17" in text  # 16 points + 1 keyframe

    tum = tmp_path / "traj.txt"
    ts = np.arange(3.0)
    ps = np.zeros((3, 3))
    qs = np.tile([1.0, 0, 0, 0], (3, 1))
    save_trajectory_tum(str(tum), ts, ps, qs)
    lines = tum.read_text().strip().splitlines()
    assert len(lines) == 3
    assert len(lines[0].split()) == 8


def test_html_view_export(tmp_path):
    """Offline HTML viewer: valid standalone file embedding the map."""
    from orbslam3_tpu.map.slam_map import empty_map, insert_keyframe
    from orbslam3_tpu.viz.html_view import save_html_view
    from tests.test_map import CAP, make_kf_inputs
    import numpy as np

    st = empty_map(CAP)
    st, _ = insert_keyframe(st, **make_kf_inputs(), new_mp_budget=16)
    traj = np.cumsum(np.ones((30, 3)) * 0.01, axis=0)
    p = tmp_path / "view.html"
    save_html_view(str(p), map_state=st, traj=traj, gt=traj + 0.01)
    html = p.read_text()
    assert html.startswith("<!DOCTYPE html>")
    assert '"points":' in html and '"traj":' in html
    assert html.count("<script>") == 1  # self-contained, no external deps
    assert "http" not in html.split("<script>")[1]  # no CDN fetches


def test_resume_from_checkpoint(tmp_path):
    """FusedSlam.from_state: save a live run mid-sequence, resume in a new
    system, and keep tracking — the resumed half must track as well as the
    uninterrupted run."""
    import pytest

    pytest.importorskip("jax")
    import jax

    from orbslam3_tpu.frontend.orb import OrbConfig
    from orbslam3_tpu.io.synthetic import SyntheticConfig, SyntheticWorld
    from orbslam3_tpu.models.fused import FusedSlam
    from orbslam3_tpu.models.slam import SlamConfig
    from orbslam3_tpu.models.tracker import TrackConfig

    cfg = SyntheticConfig(
        width=384, height=256, fx=240.0, fy=240.0, n_landmarks=500,
        duration=3.0, cam_hz=10.0, pos_amp=(1.0, 0.7, 0.3),
    )
    world = SyntheticWorld(cfg)
    slam_cfg = SlamConfig(
        orb=OrbConfig(n_features=256, n_levels=4),
        cap=MapCapacity(max_kf=16, n_feat=256, max_mp=2048, max_obs=8),
        track=TrackConfig(p_local=1024),
        ba_points=512, use_imu=False, kf_max_frames=3,
    )
    slam = FusedSlam(world.cam, slam_cfg, service_every=10**9)
    times = world.frame_times()
    half = len(times) // 2
    for i, t in enumerate(times[:half]):
        left, right = world.render_frame(t)
        t_next = times[i + 1] if i + 1 < len(times) else t + 0.1
        g, a, d = world.imu_window(t, t_next)
        slam.process_frame(left, right, g, a, d, float(t))
    slam.flush()
    kf_before = int(slam.map.n_kf)
    assert kf_before >= 2

    p = str(tmp_path / "ckpt.npz")
    save_map(p, slam.map, slam.ts)
    st, ts = load_map(p, with_track_state=True)

    resumed = FusedSlam.from_state(world.cam, slam_cfg, st, ts,
                                   service_every=10**9)
    # _last_t resyncs from keyframe times (non-KF frames leave no trace in
    # the checkpoint), so it lags the last tracked frame by < kf_max_frames
    assert times[0] < resumed._last_t <= float(times[half - 1])
    n_ok = 0
    for i in range(half, len(times)):
        t = times[i]
        left, right = world.render_frame(t)
        t_next = times[i + 1] if i + 1 < len(times) else t + 0.1
        g, a, d = world.imu_window(t, t_next)
        resumed.process_frame(left, right, g, a, d, float(t))
    resumed.flush()
    jax.block_until_ready(resumed.ts.q)
    assert int(resumed.map.n_kf) > kf_before, "no keyframes after resume"

    # ground truth for resume correctness is the UNINTERRUPTED system: feed
    # the original instance the same second half — the resumed one must
    # land on the same state (the checkpoint roundtrip is exact float32)
    for i in range(half, len(times)):
        t = times[i]
        left, right = world.render_frame(t)
        t_next = times[i + 1] if i + 1 < len(times) else t + 0.1
        g, a, d = world.imu_window(t, t_next)
        slam.process_frame(left, right, g, a, d, float(t))
    slam.flush()
    jax.block_until_ready(slam.ts.q)
    np.testing.assert_allclose(
        np.asarray(resumed.ts.p), np.asarray(slam.ts.p), atol=1e-4
    )
    assert int(resumed.map.n_kf) == int(slam.map.n_kf)


def test_live_viewer_serves_and_updates():
    """Live viewer (reference analog: the Rerun stream): the embedded HTTP
    server serves the polling page and /state.json reflects each publish."""
    import json
    import urllib.request

    import numpy as np

    from orbslam3_tpu.map.slam_map import empty_map, insert_keyframe
    from orbslam3_tpu.viz.live import LiveViewer
    from tests.test_map import CAP, make_kf_inputs

    viewer = LiveViewer(min_interval_s=0.0)
    try:
        def get(path):
            with urllib.request.urlopen(viewer.url + path, timeout=10) as r:
                return r.read().decode()

        page = get("/")
        assert "state.json" in page and "POLL_MS" in page

        empty = json.loads(get("/state.json"))
        assert empty["points"] == [] and empty["traj"] == []

        st = empty_map(CAP)
        st, _ = insert_keyframe(st, **make_kf_inputs(), new_mp_budget=16)
        traj = np.cumsum(np.ones((30, 3)) * 0.01, axis=0)
        assert viewer.publish(st, traj, traj + 0.01)

        state = json.loads(get("/state.json"))
        assert len(state["traj"]) == 30
        assert len(state["points"]) > 0 and len(state["kf"]) == 1

        # throttling: immediate re-publish below the interval is skipped
        viewer._min_interval = 60.0
        assert not viewer.publish(st, traj)
    finally:
        viewer.close()
