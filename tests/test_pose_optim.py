"""Pose-only and pose-inertial optimizer tests on synthetic geometry."""
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.frontend.camera import Camera
from orbslam3_tpu.geometry import quat
from orbslam3_tpu.imu import preintegration as pre
from orbslam3_tpu.optim.pose_only import pose_inertial_optimize, pose_optimize

RNG = np.random.default_rng(11)
CAM = Camera.create(458.0, 458.0, 376.0, 240.0, 0.11)


def make_scene(n=200, outlier_frac=0.2):
    """Random landmarks in front of a ground-truth pose; stereo observations."""
    q_gt = quat.from_axis_angle(jnp.asarray([0.05, -0.1, 0.08]))
    p_gt = jnp.asarray([0.5, -0.3, 0.2])
    # camera-frame points 2-15 m ahead
    xc = np.stack(
        [
            RNG.uniform(-4, 4, n),
            RNG.uniform(-2.5, 2.5, n),
            RNG.uniform(2.0, 15.0, n),
        ],
        -1,
    ).astype(np.float32)
    Xw = np.asarray(quat.rotate(q_gt[None], jnp.asarray(xc))) + np.asarray(p_gt)
    z = xc[:, 2]
    u = 458.0 * xc[:, 0] / z + 376.0
    v = 458.0 * xc[:, 1] / z + 240.0
    ur = u - float(CAM.bf) / z
    # pixel noise
    u = u + RNG.normal(0, 0.3, n)
    v = v + RNG.normal(0, 0.3, n)
    ur = ur + RNG.normal(0, 0.3, n)
    # outliers: corrupt some observations badly
    n_out = int(n * outlier_frac)
    idx = RNG.choice(n, n_out, replace=False)
    u[idx] += RNG.uniform(20, 80, n_out) * RNG.choice([-1, 1], n_out)
    uv = jnp.asarray(np.stack([u, v], -1), jnp.float32)
    return q_gt, p_gt, jnp.asarray(Xw), uv, jnp.asarray(ur, jnp.float32), idx


class TestPoseOptimize:
    def test_recovers_pose(self):
        q_gt, p_gt, Xw, uv, ur, out_idx = make_scene()
        n = Xw.shape[0]
        # perturbed initial guess
        q0 = quat.mul(q_gt, quat.from_axis_angle(jnp.asarray([0.03, -0.02, 0.04])))
        p0 = p_gt + jnp.asarray([0.15, -0.1, 0.08])
        res = pose_optimize(
            q0, p0, CAM, Xw, uv, ur, jnp.zeros(n, jnp.int32), jnp.ones(n, bool)
        )
        assert float(jnp.linalg.norm(res.p - p_gt)) < 0.01
        dq = quat.mul(quat.conj(res.q), q_gt)
        assert float(jnp.linalg.norm(quat.to_axis_angle(dq))) < 0.005
        # outliers rejected
        inl = np.asarray(res.inliers)
        assert inl[out_idx].mean() < 0.2
        assert inl.mean() > 0.6

    def test_mono_only(self):
        """Features without stereo depth (ur=-1) still constrain the pose."""
        q_gt, p_gt, Xw, uv, ur, _ = make_scene(outlier_frac=0.0)
        n = Xw.shape[0]
        ur_mono = jnp.full((n,), -1.0, jnp.float32)
        q0 = quat.mul(q_gt, quat.from_axis_angle(jnp.asarray([0.02, 0.01, -0.02])))
        p0 = p_gt + jnp.asarray([0.1, 0.05, -0.08])
        res = pose_optimize(
            q0, p0, CAM, Xw, uv, ur_mono, jnp.zeros(n, jnp.int32), jnp.ones(n, bool)
        )
        assert float(jnp.linalg.norm(res.p - p_gt)) < 0.02


class TestPoseInertial:
    def test_imu_constrains_under_few_features(self):
        """With sparse visual data + a strong IMU edge, the solution stays
        near the IMU prediction instead of drifting."""
        q_gt, p_gt, Xw, uv, ur, _ = make_scene(n=40, outlier_frac=0.0)
        n = Xw.shape[0]

        # previous-KF state & exact preintegration for a static interval
        dt_s = 0.25
        n_imu = 50
        gyro = jnp.zeros((n_imu, 3))
        # body accelerating so that it travels from kf to current pose
        # keep it simple: static body at p_gt (zero motion), measured acc = -g
        acc = jnp.tile(-jnp.asarray(pre.GRAVITY)[None], (n_imu, 1))
        # rotate into body frame of q_gt
        acc = quat.rotate(quat.conj(q_gt)[None], acc)
        dts = jnp.full((n_imu,), dt_s / n_imu)
        st = pre.integrate(gyro, acc, dts, jnp.ones(n_imu, bool), jnp.zeros(3), jnp.zeros(3))

        q0 = quat.mul(q_gt, quat.from_axis_angle(jnp.asarray([0.01, -0.01, 0.02])))
        p0 = p_gt + jnp.asarray([0.05, 0.03, -0.04])
        q, p, v, bg, ba, inl, n_inl = pose_inertial_optimize(
            q0, p0, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
            CAM, Xw, uv, ur, jnp.zeros(n, jnp.int32), jnp.ones(n, jnp.float32),
            st, q_gt, p_gt, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
        )
        assert float(jnp.linalg.norm(p - p_gt)) < 0.02
        assert float(jnp.linalg.norm(v)) < 0.1
        assert int(n_inl) > 30
