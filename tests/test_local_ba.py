"""Schur-complement local BA tests: synthetic multi-view convergence."""
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.frontend.camera import Camera
from orbslam3_tpu.geometry import quat
from orbslam3_tpu.optim.local_ba import BAProblem, solve_local_ba

RNG = np.random.default_rng(5)
CAM = Camera.create(458.0, 458.0, 376.0, 240.0, 0.11)


def make_ba_scene(C=6, P=200, N=64, noise_px=0.3):
    """Cameras on a line looking forward (+z), landmarks in front."""
    p_gt = np.stack([np.linspace(0, 2.0, C), np.zeros(C), np.zeros(C)], -1).astype(np.float32)
    q_gt = np.tile(np.array([1.0, 0, 0, 0], np.float32), (C, 1))
    Xw = np.stack(
        [RNG.uniform(-4, 6, P), RNG.uniform(-3, 3, P), RNG.uniform(4, 14, P)], -1
    ).astype(np.float32)

    obs_uv = np.zeros((C, N, 2), np.float32)
    obs_ur = np.full((C, N), -1.0, np.float32)
    obs_pt = np.full((C, N), -1, np.int32)
    obs_oct = np.zeros((C, N), np.int32)
    for c in range(C):
        picks = RNG.choice(P, N, replace=False)
        xc = Xw[picks] - p_gt[c]
        z = xc[:, 2]
        u = 458.0 * xc[:, 0] / z + 376.0
        v = 458.0 * xc[:, 1] / z + 240.0
        ok = (z > 0.5) & (u > 0) & (u < 752) & (v > 0) & (v < 480)
        obs_uv[c, :, 0] = u + RNG.normal(0, noise_px, N)
        obs_uv[c, :, 1] = v + RNG.normal(0, noise_px, N)
        obs_ur[c] = obs_uv[c, :, 0] - float(CAM.bf) / z + RNG.normal(0, noise_px, N)
        obs_pt[c] = np.where(ok, picks, -1)
    return q_gt, p_gt, Xw, obs_uv, obs_ur, obs_oct, obs_pt


class TestLocalBA:
    def test_converges_from_perturbation(self):
        C, P, N = 6, 200, 64
        q_gt, p_gt, Xw_gt, obs_uv, obs_ur, obs_oct, obs_pt = make_ba_scene(C, P, N)

        # perturb all but the anchor camera + all points
        q0 = q_gt.copy()
        p0 = p_gt + RNG.normal(0, 0.05, (C, 3)).astype(np.float32)
        p0[0] = p_gt[0]
        for c in range(1, C):
            dq = quat.from_axis_angle(jnp.asarray(RNG.normal(0, 0.01, 3), jnp.float32))
            q0[c] = np.asarray(quat.mul(jnp.asarray(q_gt[c]), dq))
        Xw0 = Xw_gt + RNG.normal(0, 0.08, (P, 3)).astype(np.float32)

        prob = BAProblem(
            q=jnp.asarray(q0),
            p=jnp.asarray(p0),
            opt_cam=jnp.asarray([False] + [True] * (C - 1)),
            cam_valid=jnp.ones(C, bool),
            Xw=jnp.asarray(Xw0),
            pt_valid=jnp.ones(P, bool),
            obs_uv=jnp.asarray(obs_uv),
            obs_ur=jnp.asarray(obs_ur),
            obs_oct=jnp.asarray(obs_oct),
            obs_pt=jnp.asarray(obs_pt),
        )
        res = solve_local_ba(prob, CAM, iters=12)
        assert float(res.cost1) < float(res.cost0) * 0.05
        # camera positions recovered to the noise-limited optimum
        # (0.3 px noise on far stereo points -> ~cm-level cam uncertainty)
        err = np.linalg.norm(np.asarray(res.p) - p_gt, axis=-1)
        assert err.max() < 0.03, err
        pt_err = np.linalg.norm(np.asarray(res.Xw) - Xw_gt, axis=-1)
        assert np.median(pt_err) < 0.2  # far stereo points are depth-noise-limited

    def test_exact_convergence_noiseless(self):
        """With zero pixel noise the minimizer IS ground truth: the solver
        must reach it to near machine precision."""
        C, P, N = 6, 200, 64
        q_gt, p_gt, Xw_gt, obs_uv, obs_ur, obs_oct, obs_pt = make_ba_scene(
            C, P, N, noise_px=0.0
        )
        p0 = p_gt + RNG.normal(0, 0.05, (C, 3)).astype(np.float32)
        p0[0] = p_gt[0]
        Xw0 = Xw_gt + RNG.normal(0, 0.08, (P, 3)).astype(np.float32)
        prob = BAProblem(
            q=jnp.asarray(q_gt), p=jnp.asarray(p0),
            opt_cam=jnp.asarray([False] + [True] * (C - 1)),
            cam_valid=jnp.ones(C, bool), Xw=jnp.asarray(Xw0),
            pt_valid=jnp.ones(P, bool), obs_uv=jnp.asarray(obs_uv),
            obs_ur=jnp.asarray(obs_ur), obs_oct=jnp.asarray(obs_oct),
            obs_pt=jnp.asarray(obs_pt),
        )
        res = solve_local_ba(prob, CAM, iters=20)
        err = np.linalg.norm(np.asarray(res.p) - p_gt, axis=-1)
        assert err.max() < 1e-4
        assert np.median(np.linalg.norm(np.asarray(res.Xw) - Xw_gt, axis=-1)) < 1e-3

    def test_anchor_stays_fixed(self):
        C, P, N = 4, 100, 48
        q_gt, p_gt, Xw_gt, obs_uv, obs_ur, obs_oct, obs_pt = make_ba_scene(C, P, N)
        prob = BAProblem(
            q=jnp.asarray(q_gt),
            p=jnp.asarray(p_gt + np.array([0.02, 0, 0], np.float32)),
            opt_cam=jnp.asarray([False] + [True] * (C - 1)),
            cam_valid=jnp.ones(C, bool),
            Xw=jnp.asarray(Xw_gt),
            pt_valid=jnp.ones(P, bool),
            obs_uv=jnp.asarray(obs_uv),
            obs_ur=jnp.asarray(obs_ur),
            obs_oct=jnp.asarray(obs_oct),
            obs_pt=jnp.asarray(obs_pt),
        )
        res = solve_local_ba(prob, CAM, iters=5)
        np.testing.assert_allclose(np.asarray(res.p)[0], p_gt[0] + [0.02, 0, 0], atol=1e-6)

    def test_outlier_robustness(self):
        C, P, N = 5, 150, 64
        q_gt, p_gt, Xw_gt, obs_uv, obs_ur, obs_oct, obs_pt = make_ba_scene(C, P, N)
        # corrupt 15% of observations
        mask = RNG.uniform(size=(C, N)) < 0.15
        obs_uv = obs_uv + mask[..., None] * RNG.uniform(30, 90, (C, N, 1))
        p0 = p_gt + RNG.normal(0, 0.03, (C, 3)).astype(np.float32)
        p0[0] = p_gt[0]
        prob = BAProblem(
            q=jnp.asarray(q_gt),
            p=jnp.asarray(p0),
            opt_cam=jnp.asarray([False] + [True] * (C - 1)),
            cam_valid=jnp.ones(C, bool),
            Xw=jnp.asarray(Xw_gt + RNG.normal(0, 0.05, (P, 3)).astype(np.float32)),
            pt_valid=jnp.ones(P, bool),
            obs_uv=jnp.asarray(obs_uv),
            obs_ur=jnp.asarray(obs_ur),
            obs_oct=jnp.asarray(obs_oct),
            obs_pt=jnp.asarray(obs_pt),
        )
        res = solve_local_ba(prob, CAM, iters=12)
        err = np.linalg.norm(np.asarray(res.p) - p_gt, axis=-1)
        assert err.max() < 0.05, err
        # corrupted edges classified as outliers
        inl = np.asarray(res.inlier_edges)
        assert inl[mask & (obs_pt >= 0)].mean() < 0.3


def test_build_ba_problem_includes_fixed_observers():
    """The gathered problem must append out-of-window observer keyframes
    with opt_cam=False whose observations of window points become edges
    (reference: collect_fixed_keyframes, local_ba_lm.rs:355-391). Without
    them the local cloud's only gauge tie is the anchor keyframe and the
    window can rotate slightly every solve — measured as smooth
    visual-only drift."""
    from orbslam3_tpu.imu.preintegration import PreintState
    from orbslam3_tpu.map.slam_map import MapCapacity, empty_map, insert_keyframe
    from orbslam3_tpu.models.local_mapper import build_ba_problem

    rng = np.random.default_rng(2)
    cap = MapCapacity(max_kf=16, n_feat=64, max_mp=512, max_obs=8)
    st = empty_map(cap)
    L = 48
    lm = np.stack(
        [rng.uniform(-3, 3, L), rng.uniform(-2, 2, L), np.full(L, 6.0)], -1
    ).astype(np.float32)
    desc = rng.integers(0, 256, (L, 32)).astype(np.uint8)

    def make_kf(p, matched, t):
        xc = lm - p
        z = xc[:, 2]
        uv = np.stack([240 * xc[:, 0] / z + 192, 240 * xc[:, 1] / z + 128], -1)
        n = cap.n_feat
        mm = np.full(n, -1, np.int32)
        if matched is not None:
            mm[:L] = matched
        return dict(
            time=jnp.float32(t), q_wb=quat.identity(), p_w=jnp.asarray(p),
            vel=jnp.zeros(3), bias_g=jnp.zeros(3), bias_a=jnp.zeros(3),
            uv=jnp.zeros((n, 2)).at[:L].set(jnp.asarray(uv.astype(np.float32))),
            u_right=jnp.full((n,), -1.0),
            depth=jnp.full((n,), -1.0).at[:L].set(jnp.asarray(z)),
            octave=jnp.zeros((n,), jnp.int32),
            desc=jnp.zeros((n, 32), jnp.uint8).at[:L].set(jnp.asarray(desc)),
            points_body=jnp.zeros((n, 3)).at[:L].set(jnp.asarray(xc)),
            feat_valid=jnp.zeros((n,), bool).at[:L].set(True),
            matched_mp=jnp.asarray(mm),
            preint=PreintState.identity(),
        )

    ids = np.arange(L, dtype=np.int32)
    # 8 keyframes all observing the same wall; window=4 covers the newest
    # 4, so keyframes 0..3 are candidate fixed observers
    st, kid = insert_keyframe(st, **make_kf(np.zeros(3, np.float32), None, 0.0),
                              prev_kf=-1, new_mp_budget=64)
    for k in range(1, 8):
        st, kid = insert_keyframe(
            st, **make_kf(np.array([0.1 * k, 0, 0], np.float32), ids, 0.4 * k),
            prev_kf=kid, new_mp_budget=0,
        )
    prob, p_ids, valid, pt_ids, pt_valid = build_ba_problem(
        st, jnp.int32(7), window=4, max_points=128, fixed=4
    )
    ids_np = np.asarray(p_ids)
    valid_np = np.asarray(valid)
    opt_np = np.asarray(prob.opt_cam)
    assert len(ids_np) == 8  # window + fixed slots
    # the fixed tail holds valid out-of-window keyframes, never optimized
    fixed_rows = ids_np[4:][valid_np[4:]]
    assert len(fixed_rows) >= 3, ids_np
    assert not opt_np[4:].any()
    assert set(fixed_rows.tolist()).isdisjoint(set(ids_np[:4].tolist()))
    # their observations of window points became real edges
    obs_pt = np.asarray(prob.obs_pt)[4:][valid_np[4:]]
    assert (obs_pt >= 0).sum() >= L, (obs_pt >= 0).sum()

    # the inertial-window builder supports the same fixed-observer tail
    # (reference: local_inertial_ba.rs:244-263) — off by default
    # (SlamConfig.vi_ba_fixed=0) but the plumbed path must hold the same
    # invariants: valid out-of-window observers, opt_cam=False, real
    # edges, and NO IMU edge on any fixed slot
    from orbslam3_tpu.models.local_mapper import build_vi_ba_problem

    vprob, v_ids, v_valid, _, _ = build_vi_ba_problem(
        st, jnp.int32(7), window=4, max_points=128,
        gravity_w=jnp.asarray([0.0, 0.0, -9.81]), fixed=4,
    )
    v_ids = np.asarray(v_ids)
    v_val = np.asarray(v_valid)
    assert len(v_ids) == 8
    v_fixed = v_ids[4:][v_val[4:]]
    assert len(v_fixed) >= 3, v_ids
    assert not np.asarray(vprob.opt_cam)[4:].any()
    assert set(v_fixed.tolist()).isdisjoint(set(v_ids[:4].tolist()))
    assert not np.asarray(vprob.imu_edge_valid)[4:].any()
    v_obs = np.asarray(vprob.obs_pt)[4:][v_val[4:]]
    assert (v_obs >= 0).sum() >= L
