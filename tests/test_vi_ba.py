"""Visual-inertial local BA: recovery of poses, velocities, and biases on a
synthetic trajectory with exact IMU preintegrations."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.frontend.camera import Camera
from orbslam3_tpu.geometry import quat
from orbslam3_tpu.imu import preintegration as pre
from orbslam3_tpu.optim.vi_ba import VIBAProblem, solve_vi_ba
from tests.test_imu import make_const_motion_imu

RNG = np.random.default_rng(31)
CAM = Camera.create(458.0, 458.0, 376.0, 240.0, 0.11)
G = np.array([0, 0, -9.81], np.float32)


def build_vi_problem(C=6, P=160, N=64, kf_dt=0.25, noise_px=0.3):
    w = np.array([0.3, -0.1, 0.2], np.float32)
    a_w = np.array([0.4, 0.2, -0.2], np.float32)
    q0 = quat.from_axis_angle(jnp.asarray([0.2, -0.1, 0.15]))
    v0 = np.array([0.3, -0.2, 0.1], np.float32)

    qs, ps, vs = [], [], []
    for c in range(C):
        t = c * kf_dt
        qs.append(quat.mul(q0, quat.from_axis_angle(jnp.asarray(w) * t)))
        ps.append(v0 * t + 0.5 * a_w * t * t)
        vs.append(v0 + a_w * t)
    qs = jnp.stack(qs)
    ps = jnp.asarray(np.stack(ps))
    vs = jnp.asarray(np.stack(vs))

    # exact preints per edge (c-1 -> c), zero bias
    preints = [pre.PreintState.identity()]
    for c in range(1, C):
        t = (c - 1) * kf_dt
        gyro, acc, dts, mask = make_const_motion_imu(
            w, a_w, jax.tree.map(lambda a: a[c - 1], qs), None,
            n=int(kf_dt * 200), hz=200.0,
        )
        preints.append(pre.integrate(gyro, acc, dts, mask, jnp.zeros(3), jnp.zeros(3)))
    preints = jax.tree.map(lambda *xs: jnp.stack(xs), *preints)

    # landmarks ahead of the trajectory (in world frame): put them along the
    # camera forward direction of the middle pose
    mid_fwd = np.asarray(quat.rotate(qs[C // 2], jnp.asarray([0.0, 0, 1.0])))
    lm = (
        np.asarray(ps).mean(0)[None]
        + mid_fwd[None] * RNG.uniform(4, 12, (P, 1))
        + RNG.uniform(-3, 3, (P, 3))
    ).astype(np.float32)

    obs_uv = np.zeros((C, N, 2), np.float32)
    obs_ur = np.full((C, N), -1.0, np.float32)
    obs_pt = np.full((C, N), -1, np.int32)
    obs_oct = np.zeros((C, N), np.int32)
    for c in range(C):
        picks = RNG.choice(P, N, replace=False)
        xc = np.asarray(quat.rotate(quat.conj(qs[c])[None], jnp.asarray(lm[picks]) - ps[c]))
        z = xc[:, 2]
        ok = z > 0.5
        u = 458.0 * xc[:, 0] / np.maximum(z, 0.1) + 376.0
        v_ = 458.0 * xc[:, 1] / np.maximum(z, 0.1) + 240.0
        ok &= (u > 0) & (u < 752) & (v_ > 0) & (v_ < 480)
        obs_uv[c, :, 0] = u + RNG.normal(0, noise_px, N)
        obs_uv[c, :, 1] = v_ + RNG.normal(0, noise_px, N)
        obs_ur[c] = obs_uv[c, :, 0] - float(CAM.bf) / np.maximum(z, 0.1) + RNG.normal(0, noise_px, N)
        obs_pt[c] = np.where(ok, picks, -1)

    return qs, ps, vs, preints, jnp.asarray(lm), obs_uv, obs_ur, obs_oct, obs_pt


def test_vi_ba_recovers_velocity_and_pose():
    C, P, N = 6, 160, 64
    qs, ps, vs, preints, lm, obs_uv, obs_ur, obs_oct, obs_pt = build_vi_problem(C, P, N)

    p_pert = np.asarray(ps) + RNG.normal(0, 0.04, (C, 3)).astype(np.float32)
    p_pert[0] = np.asarray(ps)[0]
    v_pert = np.asarray(vs) + RNG.normal(0, 0.25, (C, 3)).astype(np.float32)
    X_pert = np.asarray(lm) + RNG.normal(0, 0.06, (P, 3)).astype(np.float32)

    prob = VIBAProblem(
        q=qs,
        p=jnp.asarray(p_pert),
        v=jnp.asarray(v_pert),
        bg=jnp.zeros((C, 3)),
        ba=jnp.zeros((C, 3)),
        opt_cam=jnp.asarray([False] + [True] * (C - 1)),
        cam_valid=jnp.ones(C, bool),
        Xw=jnp.asarray(X_pert),
        pt_valid=jnp.ones(P, bool),
        obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_oct=jnp.asarray(obs_oct),
        obs_pt=jnp.asarray(obs_pt),
        preint=preints,
        imu_edge_valid=preints.dt > 1e-4,
        gravity_w=jnp.asarray(G),
    )
    res = solve_vi_ba(prob, CAM, iters=10)
    assert float(res.cost1) < float(res.cost0) * 0.1
    p_err = np.linalg.norm(np.asarray(res.p) - np.asarray(ps), axis=-1)
    assert p_err.max() < 0.03, p_err
    # velocities pulled toward truth by the IMU edges (visual edges alone
    # cannot observe velocity at all)
    v_err = np.linalg.norm(np.asarray(res.v) - np.asarray(vs), axis=-1)
    v_err0 = np.linalg.norm(v_pert - np.asarray(vs), axis=-1)
    assert v_err.mean() < 0.4 * v_err0.mean(), (v_err, v_err0)
    # biases stay bounded (true bias is zero)
    assert float(jnp.abs(res.bg).max()) < 0.02
