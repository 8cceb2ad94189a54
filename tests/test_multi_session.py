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
    short_stop = len(times) - 3  # session 7's stream ends early: the
    # ragged tail exercises the valid-mask padding slots (the short
    # session's state must NOT advance on padding — no duplicate frames)
    for i, t in enumerate(times):
        for s in range(D):
            if s == 7 and i >= short_stop:
                continue
            left, right = frames[s % 2][i]
            t_next = times[i + 1] if i + 1 < len(times) else t + 0.1
            g, a, d = worlds[s].imu_window(t, t_next)
            ms.process_frame(s, left, right, g, a, d, float(t))
    ms.finalize()

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

    # the short session's trajectory is trimmed to its true frame count
    t7, p7, _ = ms.trajectory_arrays(7)
    assert len(p7) == short_stop


@pytest.mark.slow
def test_merge_session_maps_welds_overlap():
    """Two sessions that mapped the same wall from different world origins
    are concatenated and folded into ONE map by cross-map loop closing;
    non-overlap would leave them as separate atlas maps."""
    import jax.numpy as jnp

    from orbslam3_tpu.frontend.camera import Camera
    from orbslam3_tpu.geometry import quat
    from orbslam3_tpu.imu.preintegration import PreintState
    from orbslam3_tpu.loop import vocab as vb
    from orbslam3_tpu.loop.closer import LoopConfig
    from orbslam3_tpu.map.slam_map import empty_map, insert_keyframe
    from orbslam3_tpu.parallel.multi_session import merge_session_maps

    rng = np.random.default_rng(5)
    cam = Camera.create(240.0, 240.0, 192.0, 128.0, 0.11, 384, 256)
    cap = MapCapacity(max_kf=16, n_feat=128, max_mp=2048, max_obs=8)
    L = 96
    lm = np.stack(
        [rng.uniform(-3, 3, L), rng.uniform(-2, 2, L), np.full(L, 6.0)], -1
    ).astype(np.float32)
    lm_desc = rng.integers(0, 256, (L, 32)).astype(np.uint8)

    def make_kf(p_est, matched_ids, p_render):
        xc = lm - p_render
        z = xc[:, 2]
        uv = np.stack([240 * xc[:, 0] / z + 192, 240 * xc[:, 1] / z + 128], -1)
        n = cap.n_feat
        mm_ = np.full(n, -1, np.int32)
        if matched_ids is not None:
            mm_[:L] = matched_ids
        return dict(
            time=jnp.float32(0.0), q_wb=quat.identity(), p_w=jnp.asarray(p_est),
            vel=jnp.zeros(3), bias_g=jnp.zeros(3), bias_a=jnp.zeros(3),
            uv=jnp.zeros((n, 2)).at[:L].set(jnp.asarray(uv.astype(np.float32))),
            u_right=jnp.full((n,), -1.0),
            depth=jnp.full((n,), -1.0).at[:L].set(jnp.asarray(z)),
            octave=jnp.zeros((n,), jnp.int32),
            desc=jnp.zeros((n, 32), jnp.uint8).at[:L].set(jnp.asarray(lm_desc)),
            points_body=jnp.zeros((n, 3)).at[:L].set(jnp.asarray(xc)),
            feat_valid=jnp.zeros((n,), bool).at[:L].set(True),
            matched_mp=jnp.asarray(mm_),
            preint=PreintState.identity(),
        )

    def build_session(origin_err, n_kf):
        st = empty_map(cap)
        poses = [np.array([x, 0, 0], np.float32)
                 for x in np.linspace(-1, 1, n_kf)]
        st, _ = insert_keyframe(
            st, **make_kf(poses[0] + origin_err, None, poses[0]),
            prev_kf=jnp.int32(-1), new_mp_budget=128,
        )
        ids = np.arange(L, dtype=np.int32)
        for k, p in enumerate(poses[1:]):
            st, _ = insert_keyframe(
                st, **make_kf(p + origin_err, ids, p),
                prev_kf=jnp.int32(k), new_mp_budget=0,
            )
        return st, poses

    offset = np.array([0.5, 0.0, 0.3], np.float32)
    st_a, poses = build_session(np.zeros(3, np.float32), 5)
    st_b, poses_b = build_session(offset, 4)

    corpus = np.concatenate(
        [lm_desc, rng.integers(0, 256, (2000, 32)).astype(np.uint8)]
    )
    voc = vb.train_vocabulary(corpus, k=6, levels=3)
    merged, closer = merge_session_maps(
        [st_a, st_b], voc, cam,
        LoopConfig(bow_min_score_gate=False, recent_gap=2, consistency_needed=2,
                   covis_edge_weight_min=10, run_global_ba=False),
    )
    assert closer.stats.corrected >= 1, closer.stats
    maps = np.asarray(merged.kf_map_id)[np.asarray(merged.kf_valid)]
    assert len(set(maps.tolist())) == 1, set(maps.tolist())
    # session B's keyframes (rows 5..8) pulled onto their true poses
    for kid, p_true in zip(range(5, 9), poses_b):
        err = np.linalg.norm(np.asarray(merged.kf_p[kid]) - p_true)
        assert err < 0.1, (kid, np.asarray(merged.kf_p[kid]), p_true, err)
