"""Two-view DLT triangulation tests: exact recovery + gating."""
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.frontend.camera import Camera
from orbslam3_tpu.geometry import quat
from orbslam3_tpu.imu.preintegration import PreintState
from orbslam3_tpu.map.slam_map import MapCapacity, empty_map, insert_keyframe
from orbslam3_tpu.map.triangulation import _dlt, _projection_matrix, triangulate_with_neighbor

RNG = np.random.default_rng(51)
CAM = Camera.create(240.0, 240.0, 192.0, 128.0, 0.11, 384, 256)
CAP = MapCapacity(max_kf=8, n_feat=64, max_mp=512, max_obs=8)


def test_dlt_exact():
    q1 = quat.identity()
    p1 = jnp.zeros(3)
    q2 = quat.from_axis_angle(jnp.asarray([0.0, 0.05, 0.0]))
    p2 = jnp.asarray([0.5, 0.0, 0.0])
    X = jnp.asarray([1.0, -0.5, 6.0])
    P1 = _projection_matrix(CAM, q1, p1)
    P2 = _projection_matrix(CAM, q2, p2)
    xc1 = quat.rotate(quat.conj(q1), X - p1)
    xc2 = quat.rotate(quat.conj(q2), X - p2)
    uv1 = CAM.project(xc1)
    uv2 = CAM.project(xc2)
    X_hat = _dlt(P1, P2, uv1, uv2)
    np.testing.assert_allclose(np.asarray(X_hat), np.asarray(X), atol=1e-3)


def test_triangulate_creates_mono_points():
    """Two keyframes with mono-only features of the same landmarks must gain
    triangulated map points."""
    st = empty_map(CAP)
    L = 40
    lm = np.stack(
        [RNG.uniform(-2, 2, L), RNG.uniform(-1.5, 1.5, L), RNG.uniform(4, 9, L)], -1
    ).astype(np.float32)
    desc = RNG.integers(0, 256, (L, 32)).astype(np.uint8)

    def kf_inputs(q, p_w):
        xc = np.asarray(quat.rotate(quat.conj(q)[None], jnp.asarray(lm - p_w)))
        z = xc[:, 2]
        uv = np.stack([240 * xc[:, 0] / z + 192, 240 * xc[:, 1] / z + 128], -1)
        n = CAP.n_feat
        return dict(
            time=jnp.float32(0.0), q_wb=q, p_w=jnp.asarray(p_w),
            vel=jnp.zeros(3), bias_g=jnp.zeros(3), bias_a=jnp.zeros(3),
            uv=jnp.zeros((n, 2)).at[:L].set(jnp.asarray(uv.astype(np.float32))),
            u_right=jnp.full((n,), -1.0),
            depth=jnp.full((n,), -1.0),  # NO stereo depth -> mono
            octave=jnp.zeros((n,), jnp.int32),
            desc=jnp.zeros((n, 32), jnp.uint8).at[:L].set(jnp.asarray(desc)),
            points_body=jnp.zeros((n, 3)),
            feat_valid=jnp.zeros((n,), bool).at[:L].set(True),
            matched_mp=jnp.full((n,), -1, jnp.int32),
            preint=PreintState.identity(),
        )

    q0 = quat.identity()
    st, _ = insert_keyframe(st, **kf_inputs(q0, np.zeros(3, np.float32)),
                            prev_kf=jnp.int32(-1), new_mp_budget=0)
    st, k1 = insert_keyframe(st, **kf_inputs(q0, np.array([0.6, 0, 0], np.float32)),
                             prev_kf=jnp.int32(0), new_mp_budget=0)
    assert int(st.n_mp) == 0  # nothing from stereo
    st = st._replace(covis=st.covis.at[0, 1].set(5).at[1, 0].set(5))

    st2, n_new = triangulate_with_neighbor(st, jnp.int32(1), CAM, max_new=64)
    n_new = int(n_new)
    assert n_new > L // 2, f"only {n_new} triangulated"
    # positions match the true landmarks
    mp = np.asarray(st2.mp_pos)[np.asarray(st2.mp_valid)]
    d = np.linalg.norm(mp[:, None] - lm[None], axis=-1).min(1)
    assert np.median(d) < 0.05, np.median(d)
    # both keyframes observe the new points
    obs = np.asarray(st2.mp_obs_n)[np.asarray(st2.mp_valid)]
    assert (obs == 2).all()


def test_multi_neighbor_beats_single():
    """Features unmatchable with the BEST covisible neighbor (zero
    baseline) must still triangulate via a farther neighbor — the
    multi-neighbor merge (reference: triangulation.rs:313-336 uses 10
    neighbors; VERDICT r1 missing #6)."""
    from tests.test_triangulation import test_triangulate_creates_mono_points  # noqa

    st = empty_map(CAP)
    L = 40
    lm = np.stack(
        [RNG.uniform(-2, 2, L), RNG.uniform(-1.5, 1.5, L), RNG.uniform(4, 9, L)], -1
    ).astype(np.float32)
    desc = RNG.integers(0, 256, (L, 32)).astype(np.uint8)

    def kf_inputs(q, p_w):
        xc = np.asarray(quat.rotate(quat.conj(q)[None], jnp.asarray(lm - p_w)))
        z = xc[:, 2]
        uv = np.stack([240 * xc[:, 0] / z + 192, 240 * xc[:, 1] / z + 128], -1)
        n = CAP.n_feat
        return dict(
            time=jnp.float32(0.0), q_wb=q, p_w=jnp.asarray(p_w),
            vel=jnp.zeros(3), bias_g=jnp.zeros(3), bias_a=jnp.zeros(3),
            uv=jnp.zeros((n, 2)).at[:L].set(jnp.asarray(uv.astype(np.float32))),
            u_right=jnp.full((n,), -1.0),
            depth=jnp.full((n,), -1.0),
            octave=jnp.zeros((n,), jnp.int32),
            desc=jnp.zeros((n, 32), jnp.uint8).at[:L].set(jnp.asarray(desc)),
            points_body=jnp.zeros((n, 3)),
            feat_valid=jnp.zeros((n,), bool).at[:L].set(True),
            matched_mp=jnp.full((n,), -1, jnp.int32),
            preint=PreintState.identity(),
        )

    q0 = quat.identity()
    # kf0: GOOD baseline neighbor; kf1: ZERO baseline (same spot as query)
    st, _ = insert_keyframe(st, **kf_inputs(q0, np.zeros(3, np.float32)),
                            prev_kf=jnp.int32(-1), new_mp_budget=0)
    st, _ = insert_keyframe(st, **kf_inputs(q0, np.array([0.6, 0.0, 0.0], np.float32)),
                            prev_kf=jnp.int32(0), new_mp_budget=0)
    st, k2 = insert_keyframe(st, **kf_inputs(q0, np.array([0.6, 0.0, 0.0], np.float32)),
                             prev_kf=jnp.int32(1), new_mp_budget=0)
    # covisibility: kf1 (useless, zero baseline) is the STRONGEST neighbor
    st = st._replace(
        covis=st.covis.at[2, 1].set(20).at[1, 2].set(20).at[2, 0].set(5).at[0, 2].set(5)
    )

    # single-neighbor: picks kf1, baseline 0 -> nothing
    _, n1 = triangulate_with_neighbor(st, jnp.int32(2), CAM, max_new=64,
                                      n_neighbors=1)
    assert int(n1) == 0
    # multi-neighbor: falls through to kf0, full coverage
    st4, n4 = triangulate_with_neighbor(st, jnp.int32(2), CAM, max_new=64,
                                        n_neighbors=4)
    assert int(n4) > L // 2, f"only {int(n4)} with 4 neighbors"


def test_temporal_chain_survives_covis_collapse():
    """When covisibility weights point at stale far-away keyframes (fast
    rotation collapses covisibility), the temporal kf_prev chain must keep
    triangulation alive (reference: triangulation.rs:313-336 adds the
    temporal chain in inertial mode; VERDICT r3 missing #3)."""
    st = empty_map(CAP)
    L = 40
    lm = np.stack(
        [RNG.uniform(-2, 2, L), RNG.uniform(-1.5, 1.5, L), RNG.uniform(4, 9, L)], -1
    ).astype(np.float32)
    desc = RNG.integers(0, 256, (L, 32)).astype(np.uint8)

    def kf_inputs(q, p_w, see=True):
        xc = np.asarray(quat.rotate(quat.conj(q)[None], jnp.asarray(lm - p_w)))
        z = xc[:, 2]
        uv = np.stack([240 * xc[:, 0] / z + 192, 240 * xc[:, 1] / z + 128], -1)
        n = CAP.n_feat
        return dict(
            time=jnp.float32(0.0), q_wb=q, p_w=jnp.asarray(p_w),
            vel=jnp.zeros(3), bias_g=jnp.zeros(3), bias_a=jnp.zeros(3),
            uv=jnp.zeros((n, 2)).at[:L].set(jnp.asarray(uv.astype(np.float32))),
            u_right=jnp.full((n,), -1.0),
            depth=jnp.full((n,), -1.0),
            octave=jnp.zeros((n,), jnp.int32),
            desc=jnp.zeros((n, 32), jnp.uint8).at[:L].set(jnp.asarray(desc)),
            points_body=jnp.zeros((n, 3)),
            feat_valid=jnp.zeros((n,), bool).at[:L].set(True and see),
            matched_mp=jnp.full((n,), -1, jnp.int32),
            preint=PreintState.identity(),
        )

    q0 = quat.identity()
    # kf0/kf1: stale keyframes looking AWAY (no features of these landmarks)
    st, _ = insert_keyframe(st, **kf_inputs(q0, np.zeros(3, np.float32), see=False),
                            prev_kf=jnp.int32(-1), new_mp_budget=0)
    st, _ = insert_keyframe(st, **kf_inputs(q0, np.zeros(3, np.float32), see=False),
                            prev_kf=jnp.int32(0), new_mp_budget=0)
    # kf2: previous keyframe, good baseline, sees the landmarks
    st, _ = insert_keyframe(st, **kf_inputs(q0, np.array([0.6, 0, 0], np.float32)),
                            prev_kf=jnp.int32(1), new_mp_budget=0)
    # kf3: the query
    st, _ = insert_keyframe(st, **kf_inputs(q0, np.zeros(3, np.float32)),
                            prev_kf=jnp.int32(2), new_mp_budget=0)
    # covisibility collapse: kf3's covis edges point ONLY at the stale
    # keyframes kf0/kf1 (weight 30); kf2 shares no covis weight at all
    st = st._replace(
        covis=st.covis.at[3, 0].set(30).at[0, 3].set(30)
        .at[3, 1].set(20).at[1, 3].set(20)
    )

    # covis-only neighbor selection never sees kf2 -> nothing triangulates
    _, n0 = triangulate_with_neighbor(st, jnp.int32(3), CAM, max_new=64,
                                      n_neighbors=2, n_temporal=0)
    assert int(n0) == 0, f"covis-only unexpectedly triangulated {int(n0)}"
    # temporal chain reaches kf2 (the prev keyframe) -> full coverage
    _, n1 = triangulate_with_neighbor(st, jnp.int32(3), CAM, max_new=64,
                                      n_neighbors=2, n_temporal=1)
    assert int(n1) > L // 2, f"only {int(n1)} with temporal chain"
