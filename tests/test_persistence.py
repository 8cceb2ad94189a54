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
