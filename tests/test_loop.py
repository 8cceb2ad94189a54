"""Loop-closing stack tests: vocabulary, Sim3 RANSAC, pose graph, and the
full detect->verify->correct path on a constructed drifted map."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.frontend.camera import Camera
from orbslam3_tpu.geometry import quat
from orbslam3_tpu.geometry.sim3 import Sim3
from orbslam3_tpu.imu.preintegration import PreintState
from orbslam3_tpu.loop import vocab as vb
from orbslam3_tpu.loop.closer import LoopCloser, LoopConfig
from orbslam3_tpu.loop.sim3 import horn_weighted, sim3_ransac
from orbslam3_tpu.map.slam_map import MapCapacity, empty_map, insert_keyframe
from orbslam3_tpu.optim.pose_graph import PoseGraphProblem, solve_pose_graph

RNG = np.random.default_rng(21)
CAM = Camera.create(240.0, 240.0, 192.0, 128.0, 0.11, 384, 256)


class TestVocabulary:
    def test_quantize_deterministic_and_consistent(self):
        corpus = RNG.integers(0, 256, (2000, 32)).astype(np.uint8)
        voc = vb.train_vocabulary(corpus, k=5, levels=3)
        q = jnp.asarray(corpus[:64])
        l1 = vb.quantize(voc, q, jnp.ones(64, bool))
        l2 = vb.quantize(voc, q, jnp.ones(64, bool))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        assert int(l1.max()) < voc.n_leaves

    def test_scores_separate_same_vs_different(self):
        corpus = RNG.integers(0, 256, (3000, 32)).astype(np.uint8)
        voc = vb.train_vocabulary(corpus, k=6, levels=3)
        a = jnp.asarray(corpus[:256])
        b = jnp.asarray(corpus[256:512])
        ones = jnp.ones(256, bool)
        va, _ = vb.transform(voc, a, ones)
        vb_, _ = vb.transform(voc, b, ones)
        s_self = float(vb.score_l1(va, va))
        s_cross = float(vb.score_l1(va, vb_))
        assert s_self > 0.99
        assert s_cross < 0.6 * s_self

    def test_bow_vector_normalized(self):
        corpus = RNG.integers(0, 256, (1000, 32)).astype(np.uint8)
        voc = vb.train_vocabulary(corpus, k=5, levels=2)
        v, _ = vb.transform(voc, jnp.asarray(corpus[:100]), jnp.ones(100, bool))
        assert abs(float(jnp.sum(jnp.abs(v))) - 1.0) < 1e-5


class TestSim3Ransac:
    def test_recovers_known_transform_with_outliers(self):
        N = 120
        pa = RNG.uniform(-5, 5, (N, 3)).astype(np.float32)
        S_true = Sim3(
            quat.from_axis_angle(jnp.asarray([0.1, 0.3, -0.2])),
            jnp.asarray([0.5, -1.0, 0.3]),
            jnp.ones(()),
        )
        pb = np.array(S_true.apply(jnp.asarray(pa)))
        pb += RNG.normal(0, 0.01, pb.shape)
        out = RNG.choice(N, 30, replace=False)
        pb[out] += RNG.uniform(1, 3, (30, 3))
        S, inl, n = sim3_ransac(
            jnp.asarray(pa), jnp.asarray(pb), jnp.ones(N, bool),
            jax.random.PRNGKey(0), inlier_thr=0.1,
        )
        assert int(n) > 70
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(S_true.t), atol=0.02)
        dq = quat.mul(quat.conj(S.q), S_true.q)
        assert float(jnp.linalg.norm(quat.to_axis_angle(dq))) < 0.02

    def test_horn_exact(self):
        pa = jnp.asarray(RNG.uniform(-2, 2, (20, 3)), jnp.float32)
        S_true = Sim3(
            quat.from_axis_angle(jnp.asarray([0.2, -0.1, 0.4])),
            jnp.asarray([1.0, 2.0, -0.5]),
            jnp.ones(()),
        )
        pb = S_true.apply(pa)
        S = horn_weighted(pa, pb, jnp.ones(20))
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(S_true.t), atol=1e-4)


class TestPoseGraph:
    def test_loop_edge_redistributes_drift(self):
        """Chain 0..9 with accumulated drift; loop edge ties node 9 to node 0
        with the TRUE relative pose; optimization must pull node 9 home."""
        K = 10
        # true poses: nodes on a circle back to start
        true_p = np.stack(
            [np.cos(np.linspace(0, 2 * np.pi, K)), np.sin(np.linspace(0, 2 * np.pi, K)),
             np.zeros(K)], -1
        ).astype(np.float32)
        qs = np.tile(np.array([1.0, 0, 0, 0], np.float32), (K, 1))
        # drifted estimate: grows linearly, node9 off by 0.5
        drift = np.linspace(0, 0.5, K).astype(np.float32)
        est_p = true_p + np.stack([drift, np.zeros(K), np.zeros(K)], -1)

        nodes = Sim3(jnp.asarray(qs), jnp.asarray(est_p), jnp.ones(K))
        # temporal edges measured from TRUE relative motion
        e_i = jnp.arange(K - 1, dtype=jnp.int32)
        e_j = e_i + 1

        def meas(i, j):
            return Sim3(
                jnp.asarray([1.0, 0, 0, 0]), jnp.asarray(true_p[j] - true_p[i]), jnp.ones(())
            )

        metas = [meas(i, i + 1) for i in range(K - 1)]
        metas.append(
            Sim3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray(true_p[0] - true_p[K - 1]), jnp.ones(()))
        )
        e_meas = jax.tree.map(lambda *xs: jnp.stack(xs), *metas)
        e_i = jnp.concatenate([e_i, jnp.asarray([K - 1], jnp.int32)])
        e_j = jnp.concatenate([e_j, jnp.asarray([0], jnp.int32)])

        prob = PoseGraphProblem(
            nodes=nodes,
            node_valid=jnp.ones(K, bool),
            node_fixed=jnp.zeros(K, bool).at[0].set(True),
            e_i=e_i,
            e_j=e_j,
            e_meas=e_meas,
            e_weight=jnp.ones(K).at[K - 1].set(100.0),
            e_valid=jnp.ones(K, bool),
        )
        out, costs = solve_pose_graph(prob, iters=15)
        err = np.linalg.norm(np.asarray(out.t) - true_p, axis=-1)
        assert err.max() < 0.02, err


def build_revisit_map(drift=np.array([0.4, 0.0, 0.2], np.float32),
                      max_kf=16):
    """Two passes over the same landmark wall; pass 2 poses are drifted.
    Returns (MapState, lm_desc, true poses, drifted ids)."""
    cap = MapCapacity(max_kf=max_kf, n_feat=128, max_mp=2048, max_obs=8)
    st = empty_map(cap)
    L = 96
    lm = np.stack(
        [RNG.uniform(-3, 3, L), RNG.uniform(-2, 2, L), np.full(L, 6.0)], -1
    ).astype(np.float32)
    lm_desc = RNG.integers(0, 256, (L, 32)).astype(np.uint8)

    def make_kf(p_est, matched_ids, p_render=None):
        # p_render = where the camera TRULY is (observations reflect real
        # geometry); p_est = where the SLAM estimate thinks it is.
        p_w = p_est
        xc = lm - (p_render if p_render is not None else p_est)
        z = xc[:, 2]
        uv = np.stack(
            [240 * xc[:, 0] / z + 192, 240 * xc[:, 1] / z + 128], -1
        ).astype(np.float32)
        n = cap.n_feat
        uv_full = np.zeros((n, 2), np.float32)
        uv_full[:L] = uv
        depth = np.full(n, -1.0, np.float32)
        depth[:L] = z
        pts = np.zeros((n, 3), np.float32)
        pts[:L] = xc
        desc = np.zeros((n, 32), np.uint8)
        desc[:L] = lm_desc
        fv = np.zeros(n, bool)
        fv[:L] = True
        mm_ = np.full(n, -1, np.int32)
        if matched_ids is not None:
            mm_[:L] = matched_ids
        return dict(
            time=jnp.float32(0.0), q_wb=quat.identity(), p_w=jnp.asarray(p_w),
            vel=jnp.zeros(3), bias_g=jnp.zeros(3), bias_a=jnp.zeros(3),
            uv=jnp.asarray(uv_full), u_right=jnp.full((n,), -1.0),
            depth=jnp.asarray(depth), octave=jnp.zeros((n,), jnp.int32),
            desc=jnp.asarray(desc), points_body=jnp.asarray(pts),
            feat_valid=jnp.asarray(fv), matched_mp=jnp.asarray(mm_),
            preint=PreintState.identity(), prev_kf=jnp.int32(-1),
        )

    # pass 1: kf 0..4 along x, creating the landmarks at kf0
    poses1 = [np.array([x, 0, 0], np.float32) for x in np.linspace(-1, 1, 5)]
    inputs = make_kf(poses1[0], None)
    st, _ = insert_keyframe(st, **inputs, new_mp_budget=128)
    for p in poses1[1:]:
        st, _ = insert_keyframe(
            st, **make_kf(p, np.arange(L, dtype=np.int32)), new_mp_budget=0
        )
    # pass 2: kf 5..9 revisiting the same wall; the camera is truly at
    # poses1 but the estimate has drifted to poses2 -> duplicate landmarks
    # are created at drifted world positions (odometry drift, no reloc)
    poses2 = [p + drift for p in poses1]
    st, _ = insert_keyframe(
        st, **make_kf(poses2[0], None, p_render=poses1[0]), new_mp_budget=128
    )
    drift_ids = []
    second_ids = np.asarray(range(L, 2 * L), dtype=np.int32)
    for p_est, p_true in zip(poses2[1:], poses1[1:]):
        st, kid = insert_keyframe(
            st, **make_kf(p_est, second_ids, p_render=p_true), new_mp_budget=0
        )
        drift_ids.append(int(kid))
    # fix temporal chain
    st = st._replace(kf_prev=jnp.asarray(
        [-1, 0, 1, 2, 3, 4, 5, 6, 7, 8] + [-1] * (max_kf - 10), jnp.int32))
    return st, lm_desc, poses1, poses2


@pytest.mark.slow
def test_loop_closure_end_to_end():
    st, lm_desc, poses1, poses2 = build_revisit_map()
    # seed world velocities: after the correction the BODY-frame velocity
    # of every corrected node must be preserved (v_w' = R_new R_old^T v_w;
    # the reference's corrector skips velocities — corrector.rs:383-533)
    v_seed = np.tile(np.array([0.3, -0.1, 0.2], np.float32), (10, 1))
    st = st._replace(kf_v=st.kf_v.at[:10].set(jnp.asarray(v_seed)))
    q_before = np.asarray(st.kf_q)[:10].copy()
    corpus = np.concatenate([lm_desc, RNG.integers(0, 256, (2000, 32)).astype(np.uint8)])
    voc = vb.train_vocabulary(corpus, k=6, levels=3)
    closer = LoopCloser(voc, LoopConfig(bow_min_score_gate=False, recent_gap=4, consistency_needed=2,
                                        covis_edge_weight_min=10))
    # feed pass-1 keyframes (no loops expected), then pass-2
    corrected = False
    for k in range(int(st.n_kf)):
        st, c = closer.on_keyframe(st, k, CAM)
        corrected = corrected or c
    st, c = closer.drain(st, CAM)  # resolve in-flight packet + verify
    corrected = corrected or c
    assert closer.stats.candidates_checked > 0, "no loop candidates found"
    assert corrected, f"loop never corrected: {closer.stats}"
    # body-frame velocity invariant under the pose-graph correction
    q_after = np.asarray(st.kf_q)[:10]
    v_after = np.asarray(st.kf_v)[:10]
    for k in range(10):
        vb_old = np.asarray(quat.rotate(quat.conj(jnp.asarray(q_before[k])),
                                        jnp.asarray(v_seed[k])))
        vb_new = np.asarray(quat.rotate(quat.conj(jnp.asarray(q_after[k])),
                                        jnp.asarray(v_after[k])))
        np.testing.assert_allclose(vb_new, vb_old, atol=1e-3)
    # pass-2 keyframe positions pulled back toward truth
    for i, kid in enumerate(range(5, 10)):
        est = np.asarray(st.kf_p[kid])
        err_before = np.linalg.norm(poses2[i] - poses1[i])
        err_after = np.linalg.norm(est - poses1[i])
        assert err_after < 0.5 * err_before, (kid, est, poses1[i], err_after, err_before)


@pytest.mark.slow
def test_cross_map_merge():
    """After a tracking loss, a second map observing the same wall (with a
    shifted world origin) must be folded back into the first map by the
    cross-map loop path (map merging — absent from the reference)."""
    from orbslam3_tpu.map.slam_map import create_new_map

    offset = np.array([0.5, 0.0, 0.3], np.float32)  # new map's origin error
    cap = MapCapacity(max_kf=16, n_feat=128, max_mp=2048, max_obs=8)
    st = empty_map(cap)
    L = 96
    lm = np.stack(
        [RNG.uniform(-3, 3, L), RNG.uniform(-2, 2, L), np.full(L, 6.0)], -1
    ).astype(np.float32)
    lm_desc = RNG.integers(0, 256, (L, 32)).astype(np.uint8)

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

    # map 0: 5 keyframes along x at true poses
    poses1 = [np.array([x, 0, 0], np.float32) for x in np.linspace(-1, 1, 5)]
    st, _ = insert_keyframe(st, **make_kf(poses1[0], None, poses1[0]),
                            prev_kf=jnp.int32(-1), new_mp_budget=128)
    for p in poses1[1:]:
        st, _ = insert_keyframe(
            st, **make_kf(p, np.arange(L, dtype=np.int32), p),
            prev_kf=jnp.int32(0), new_mp_budget=0,
        )
    # tracking lost -> new map; re-init believes it is at poses1+offset
    st = create_new_map(st)
    second_ids = np.asarray(range(L, 2 * L), dtype=np.int32)
    st, _ = insert_keyframe(
        st, **make_kf(poses1[0] + offset, None, poses1[0]),
        prev_kf=jnp.int32(-1), new_mp_budget=128,
    )
    for p_true in poses1[1:3]:
        st, _ = insert_keyframe(
            st, **make_kf(p_true + offset, second_ids, p_true),
            prev_kf=jnp.int32(5), new_mp_budget=0,
        )

    corpus = np.concatenate([lm_desc, RNG.integers(0, 256, (2000, 32)).astype(np.uint8)])
    voc = vb.train_vocabulary(corpus, k=6, levels=3)
    closer = LoopCloser(voc, LoopConfig(bow_min_score_gate=False, recent_gap=2, consistency_needed=2,
                                        covis_edge_weight_min=10, run_global_ba=False))
    merged = False
    for k in range(int(st.n_kf)):
        st, c = closer.on_keyframe(st, k, CAM)
        merged = merged or c
    st, c = closer.drain(st, CAM)  # resolve in-flight packet + verify
    merged = merged or c

    assert merged, closer.stats
    # everything back in one map
    maps = np.asarray(st.kf_map_id)[np.asarray(st.kf_valid)]
    assert set(maps.tolist()) == {0}
    assert int(st.active_map) == 0
    # merged keyframes pulled onto their true positions
    for kid, p_true in zip(range(5, 8), poses1[:3]):
        err = np.linalg.norm(np.asarray(st.kf_p[kid]) - p_true)
        assert err < 0.1, (kid, np.asarray(st.kf_p[kid]), p_true, err)


def test_dbow2_text_loader(tmp_path):
    """Load a miniature DBoW2-format vocabulary (ORBvoc.txt layout: header
    'k L s1 s2', then 'parent is_leaf 32-bytes weight' per node) and check
    quantization agrees with the tree structure."""
    k, L = 2, 2
    rng = np.random.default_rng(7)
    # build a tiny known tree: root(0) -> n1, n2 -> 4 leaves
    descs = rng.integers(0, 256, (6, 32)).astype(np.uint8)
    lines = [f"{k} {L} 0 0"]
    # nodes 1,2 are children of 0; leaves 3,4 under 1; 5,6 under 2
    parents = [0, 0, 1, 1, 2, 2]
    weights = [0.0, 0.0, 0.5, 0.7, 0.9, 1.1]
    for i, (p, wgt) in enumerate(zip(parents, weights)):
        d = " ".join(str(int(x)) for x in descs[i])
        is_leaf = 1 if i >= 2 else 0
        lines.append(f"{p} {is_leaf} {d} {wgt}")
    path = tmp_path / "voc.txt"
    path.write_text("\n".join(lines) + "\n")

    voc = vb.load_dbow2_text(str(path))
    assert voc.k == 2 and voc.levels == 2
    assert voc.n_leaves == 4
    # a descriptor identical to a leaf's center must quantize into the
    # subtree of its parent
    q = vb.quantize(voc, jnp.asarray(descs[2:3]), jnp.ones(1, bool))
    leaf = int(q[0])
    assert 0 <= leaf < 4
    # idf weights got carried over (leaf order may permute within parents)
    np.testing.assert_allclose(
        sorted(np.asarray(voc.idf).tolist()), [0.5, 0.7, 0.9, 1.1], atol=1e-6
    )


class TestScaleEstimation:
    def test_horn_with_scale(self):
        """fix_scale=False recovers a non-unit similarity scale (the mono
        loop-closing case; stereo uses fix_scale=True)."""
        pa = jnp.asarray(RNG.uniform(-2, 2, (40, 3)), jnp.float32)
        S_true = Sim3(
            quat.from_axis_angle(jnp.asarray([0.2, -0.1, 0.3])),
            jnp.asarray([0.5, -0.3, 1.0]),
            jnp.asarray(1.35),
        )
        pb = S_true.apply(pa)
        S = horn_weighted(pa, pb, jnp.ones(40), fix_scale=False)
        assert abs(float(S.s) - 1.35) < 0.01
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(S_true.t), atol=0.02)

    def test_pose_graph_free_scale(self):
        """fix_scale=False lets nodes absorb scale drift through sigma."""
        K = 6
        p = np.stack([np.linspace(0, 2.0, K), np.zeros(K), np.zeros(K)], -1).astype(np.float32)
        qs = np.tile(np.array([1.0, 0, 0, 0], np.float32), (K, 1))
        nodes = Sim3(jnp.asarray(qs), jnp.asarray(p), jnp.ones(K))
        # measurements say consecutive steps are 1.2x longer than estimated
        step = np.array([0.4 * 1.2, 0, 0], np.float32)
        e_i = jnp.arange(K - 1, dtype=jnp.int32)
        e_j = e_i + 1
        metas = [Sim3(jnp.asarray([1.0, 0, 0, 0]), jnp.asarray(step), jnp.ones(()))] * (K - 1)
        e_meas = jax.tree.map(lambda *xs: jnp.stack(xs), *metas)
        prob = PoseGraphProblem(
            nodes=nodes, node_valid=jnp.ones(K, bool),
            node_fixed=jnp.zeros(K, bool).at[0].set(True),
            e_i=e_i, e_j=e_j, e_meas=e_meas,
            e_weight=jnp.ones(K - 1), e_valid=jnp.ones(K - 1, bool),
        )
        out, _ = solve_pose_graph(prob, iters=15, fix_scale=False)
        # final node pulled out to ~2.4 (5 steps x 0.48)
        assert abs(float(out.t[-1, 0]) - 2.4) < 0.05, np.asarray(out.t)


@pytest.mark.slow
def test_loop_edges_accumulate_and_remap():
    """Past corrections stay in the essential graph (reference keeps loop
    edges forever, pose_graph.rs:113-197): after the e2e correction the
    edge is stored, survives a second _correct call (fixed solve shape),
    and follows compaction remaps / is dropped when an endpoint is culled."""
    st, lm_desc, poses1, poses2 = build_revisit_map()
    corpus = np.concatenate(
        [lm_desc, RNG.integers(0, 256, (2000, 32)).astype(np.uint8)]
    )
    voc = vb.train_vocabulary(corpus, k=6, levels=3)
    closer = LoopCloser(voc, LoopConfig(bow_min_score_gate=False, recent_gap=4, consistency_needed=2,
                                        covis_edge_weight_min=10))
    for k in range(int(st.n_kf)):
        st, _ = closer.on_keyframe(st, k, CAM)
    st, _ = closer.drain(st, CAM)  # resolve in-flight packet + verify
    assert closer.stats.corrected >= 1
    assert len(closer._loop_edges) == closer.stats.corrected
    i0, j0 = closer._loop_edges[0][:2]
    assert 0 <= i0 < j0 < int(st.n_kf)

    # a later correction re-solves WITH the stored edge (and records its own)
    n_before = len(closer._loop_edges)
    st2 = closer._correct(st, j0, i0, Sim3.identity(), CAM)
    assert len(closer._loop_edges) == n_before + 1
    assert np.isfinite(np.asarray(st2.kf_p)).all()

    # compaction remap: shifting remaps endpoints; culling an endpoint
    # drops the edge
    K = st.kf_valid.shape[0]
    km = (K - 1) - np.arange(K)  # in-bounds permutation of every row
    closer.remap_rows(km)
    assert closer._loop_edges[0][0] == K - 1 - i0
    assert closer._loop_edges[0][1] == K - 1 - j0
    km2 = np.arange(K)
    km2[K - 1 - i0] = -1  # cull the first edge's candidate endpoint
    expect = sum(
        1 for (i, j, *_) in closer._loop_edges
        if i != K - 1 - i0 and j != K - 1 - i0
    )
    closer.remap_rows(km2)
    assert len(closer._loop_edges) == expect
    assert all(
        K - 1 - i0 not in (i, j) for (i, j, *_) in closer._loop_edges
    )


@pytest.mark.slow
def test_detection_odd_capacity():
    """Loop detection must accept map capacities that are not multiples of
    the internal Hamming chunk (16): the padded row scan recomputes the
    tail row and slices it off. Regression for the K%16 reshape crash."""
    st, lm_desc, poses1, poses2 = build_revisit_map(max_kf=24)
    corpus = np.concatenate(
        [lm_desc, RNG.integers(0, 256, (2000, 32)).astype(np.uint8)]
    )
    voc = vb.train_vocabulary(corpus, k=6, levels=3)
    # consistency_needed high: exercise detection only (no correction)
    closer = LoopCloser(voc, LoopConfig(bow_min_score_gate=False, recent_gap=4, consistency_needed=99))
    for k in range(int(st.n_kf)):
        st, c = closer.on_keyframe(st, k, CAM)
        assert not c
    st, _ = closer.drain(st, CAM)
    assert closer.stats.candidates_checked > 0


def test_bow_min_score_gate():
    """The detection packet carries DBoW2 scores + the reference's
    min-covisible-score threshold; with the gate enabled a candidate
    scoring below it is pruned before the consistency/verify stages."""
    cap = MapCapacity(max_kf=16, n_feat=64, max_mp=256, max_obs=4)
    st = empty_map(cap)
    corpus = RNG.integers(0, 256, (512, 32)).astype(np.uint8)
    voc = vb.train_vocabulary(corpus, k=5, levels=2)

    def fake_packet(bow_score, min_covis):
        cfg = LoopConfig()
        nc = cfg.n_candidates
        arr = np.zeros(3 * nc + 2, np.float32)
        arr[0] = 5.0                 # candidate keyframe id
        arr[nc] = 100.0              # mutual-match count (passes the floor)
        arr[1:nc] = -1.0
        arr[nc + 1:2 * nc] = -1.0
        arr[2 * nc] = 64.0           # n_valid features
        arr[2 * nc + 1] = bow_score  # candidate BoW score
        arr[3 * nc + 1] = min_covis  # min covisible score
        group = np.zeros((nc, cap.max_kf), bool)
        return arr, group

    # gate ON, candidate below the covisible floor -> pruned (the stats
    # counter never increments)
    closer = LoopCloser(voc, LoopConfig(bow_min_score_gate=True))
    closer._pending = (8, *fake_packet(bow_score=0.2, min_covis=0.5))
    st, c = closer.drain(st, CAM)
    assert not c and closer.stats.candidates_checked == 0

    # gate ON but no covisible keyframes yet (min_covis = inf) -> gate
    # disabled, candidate reaches the consistency stage
    closer2 = LoopCloser(voc, LoopConfig(bow_min_score_gate=True))
    closer2._pending = (8, *fake_packet(bow_score=0.2, min_covis=np.inf))
    st, c = closer2.drain(st, CAM)
    assert closer2.stats.candidates_checked == 1

    # gate OFF (fiducial-world setting; production default is ON since
    # round 4): the same low-scoring candidate is examined
    closer3 = LoopCloser(voc, LoopConfig(bow_min_score_gate=False))
    closer3._pending = (8, *fake_packet(bow_score=0.2, min_covis=0.5))
    st, c = closer3.drain(st, CAM)
    assert closer3.stats.candidates_checked == 1

    # gate ON but RELOC mode: the gate is bypassed (the query is a dead-
    # reckoned lost keyframe whose covisibles are an unreliable score
    # reference; ORB-SLAM3's relocalization search has no covisible gate)
    closer4 = LoopCloser(voc, LoopConfig(bow_min_score_gate=True))
    closer4._ensure_storage(st)
    pkt = fake_packet(bow_score=0.2, min_covis=0.5)
    st, c = closer4._process_packet(st, 8, *pkt, CAM, reloc=True)
    assert closer4.stats.candidates_checked == 1


@pytest.mark.slow
def test_warmup_compiles_all_programs():
    """LoopCloser.warmup must drive every device program with the CURRENT
    signatures (BoW-only, every detection row bucket, verify, correction).
    Regression: a signature change to _bow_program slipped past the suite
    because only FusedSlam(warmup=True) — never the tests — called it."""
    st, lm_desc, *_ = build_revisit_map()
    corpus = np.concatenate(
        [lm_desc, RNG.integers(0, 256, (2000, 32)).astype(np.uint8)]
    )
    voc = vb.train_vocabulary(corpus, k=6, levels=3)
    closer = LoopCloser(voc, LoopConfig(bow_min_score_gate=False, recent_gap=4))
    closer.warmup(st, CAM)
    # warmup must leave no pending work and an intact (device-resident)
    # BoW table usable by a subsequent real keyframe service
    assert closer.pending_kf is None
    st2, c = closer.on_keyframe(st, 0, CAM)
    assert not c
    assert int(jnp.sum(closer.bow_ids[0] >= 0)) > 0


@pytest.mark.slow
def test_verify_round_tag_defers_same_round():
    """A verify dispatched during service round R must stay in flight when
    _apply_verify runs later in the SAME round (blocking mid-round bubbles
    the device pipeline — measured 30 -> 16 fps on the revisit bench), and
    must resolve in round R+1 or at a sync drain."""
    st, lm_desc, poses1, poses2 = build_revisit_map()
    corpus = np.concatenate(
        [lm_desc, RNG.integers(0, 256, (2000, 32)).astype(np.uint8)]
    )
    voc = vb.train_vocabulary(corpus, k=6, levels=3)
    closer = LoopCloser(voc, LoopConfig(bow_min_score_gate=False, recent_gap=4, consistency_needed=2,
                                        covis_edge_weight_min=10))
    corrected_round = None
    n_kf = int(st.n_kf)
    for k in range(n_kf):
        # one keyframe per round here; tag rounds so deferral is active
        st, c = closer.on_keyframe(st, k, CAM, round_id=k)
        if c:
            corrected_round = k
        if closer._verify_pending is not None:
            # dispatched this round -> applying with the SAME round id
            # must be a no-op that keeps it pending
            st2, c2 = closer._apply_verify(st, CAM,
                                           round_id=closer._verify_pending[0])
            assert not c2 and closer._verify_pending is not None
            st = st2
    st, c = closer.drain(st, CAM)
    assert closer.stats.corrected >= 1, closer.stats
    # the correction must never have landed in the round that dispatched it
    if corrected_round is not None:
        assert corrected_round > 0
