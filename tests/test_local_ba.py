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
