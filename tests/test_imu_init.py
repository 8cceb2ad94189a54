"""IMU initialization test: recover gravity, velocities, and biases from
synthetic keyframe poses + preintegrations with known ground truth."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.geometry import quat
from orbslam3_tpu.imu import preintegration as pre
from orbslam3_tpu.optim.imu_init import inertial_init
from tests.test_imu import make_const_motion_imu


def test_inertial_init_recovers_gravity_and_bias():
    """Body follows a known constant-rate/accel trajectory; KFs every 0.5 s.
    Preintegrations carry a known gyro/accel bias; the solver must find it."""
    w = np.array([0.25, -0.15, 0.3], np.float32)
    a_w = np.array([0.4, 0.2, -0.3], np.float32)
    q0 = quat.from_axis_angle(jnp.asarray([0.3, 0.1, -0.2]))
    v0 = jnp.asarray([0.2, -0.1, 0.3])
    G = jnp.asarray([0.0, 0.0, -9.81])

    bg_true = jnp.asarray([0.004, -0.003, 0.005])
    ba_true = jnp.asarray([0.04, -0.03, 0.05])

    W = 9
    kf_dt = 0.5
    n_per = 100  # 200 Hz * 0.5 s
    qs, ps, preints = [], [], []
    for k in range(W):
        t = k * kf_dt
        qk = quat.mul(q0, quat.from_axis_angle(jnp.asarray(w) * t))
        pk = v0 * t + 0.5 * jnp.asarray(a_w) * t * t
        qs.append(qk)
        ps.append(pk)
    for k in range(W - 1):
        # exact IMU for [t_k, t_k+1), biased
        t = k * kf_dt
        gyro, acc, dts, mask = make_const_motion_imu(
            w, a_w, quat.mul(q0, quat.from_axis_angle(jnp.asarray(w) * t)),
            None, n=n_per, hz=200.0,
        )
        gyro = gyro + bg_true[None]
        acc = acc + ba_true[None]
        # integrate with ZERO bias (what the live system does pre-init)
        st = pre.integrate(gyro, acc, dts, mask, jnp.zeros(3), jnp.zeros(3))
        preints.append(st)

    preints_b = jax.tree.map(lambda *xs: jnp.stack(xs), *preints)
    res = inertial_init(
        jnp.stack(qs), jnp.stack(ps), preints_b, jnp.ones(W - 1, bool)
    )

    assert float(res.cost1) < float(res.cost0) * 1e-3
    np.testing.assert_allclose(np.asarray(res.gravity_w), np.asarray(G), atol=0.05)
    np.testing.assert_allclose(np.asarray(res.bias_g), np.asarray(bg_true), atol=2e-3)
    # accel bias is deliberately pinned near zero at first init (strong prior
    # breaks the gravity/accel-bias degeneracy; refined later in VI-BA), so
    # only check it stayed bounded
    assert float(np.linalg.norm(np.asarray(res.bias_a))) < 0.2
    # velocities: v(t) = v0 + a t
    v_true = np.stack([np.asarray(v0 + jnp.asarray(a_w) * (k * kf_dt)) for k in range(W)])
    np.testing.assert_allclose(np.asarray(res.vels), v_true, atol=0.05)
