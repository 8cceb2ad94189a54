"""IMU preintegration tests: golden analytic trajectories, bias correction,
covariance properties, merge, mask handling. Mirrors + extends the
reference's coverage (/root/reference/src/imu/preintegration.rs:509-781).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.geometry import quat, so3
from orbslam3_tpu.imu import preintegration as pre
from orbslam3_tpu.imu.preintegration import GRAVITY, ImuNoise, PreintState

G = np.array([0.0, 0.0, -9.81], dtype=np.float32)


def make_const_motion_imu(w_body, a_world, q0, v0, n=200, hz=200.0):
    """Analytic IMU stream for constant body rate + constant world accel.

    R(t) = R0 Exp(w t); v(t) = v0 + a_w t; p(t) = p0 + v0 t + a_w t^2/2.
    Measured: gyro = w (const in body), acc = R(t)^T (a_w - g).
    """
    dt = 1.0 / hz
    ts = np.arange(n) * dt
    gyro = np.tile(np.asarray(w_body, np.float32), (n, 1))
    acc = []
    for t in ts:
        # midpoint attitude across the sample interval for 2nd-order accuracy
        qt = quat.mul(jnp.asarray(q0), quat.from_axis_angle(jnp.asarray(w_body, jnp.float32) * (t + dt / 2)))
        Rt = np.asarray(quat.to_matrix(qt))
        acc.append(Rt.T @ (np.asarray(a_world, np.float32) - G))
    acc = np.stack(acc)
    dts = np.full(n, dt, np.float32)
    mask = np.ones(n, bool)
    return (
        jnp.asarray(gyro),
        jnp.asarray(acc),
        jnp.asarray(dts),
        jnp.asarray(mask),
    )


def integrate(gyro, acc, dts, mask, bg=None, ba=None):
    z = jnp.zeros(3, jnp.float32)
    return pre.integrate(gyro, acc, dts, mask, bg if bg is not None else z, ba if ba is not None else z)


class TestIntegrate:
    def test_static_hover(self):
        """Static body: deltas cancel gravity exactly under propagate."""
        q0 = quat.identity()
        gyro, acc, dts, mask = make_const_motion_imu([0, 0, 0], [0, 0, 0], q0, [0, 0, 0])
        st = integrate(gyro, acc, dts, mask)
        q_j, v_j, p_j = pre.propagate(st, q0, jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(v_j, 0.0, atol=1e-4)
        np.testing.assert_allclose(p_j, 0.0, atol=1e-4)
        np.testing.assert_allclose(st.dt, 1.0, atol=1e-6)

    def test_pure_rotation(self):
        w = [0.3, -0.2, 0.5]
        q0 = quat.from_axis_angle(jnp.asarray([0.1, 0.2, -0.1]))
        gyro, acc, dts, mask = make_const_motion_imu(w, [0, 0, 0], q0, [0, 0, 0])
        st = integrate(gyro, acc, dts, mask)
        expected = quat.from_axis_angle(jnp.asarray(w) * 1.0)
        np.testing.assert_allclose(
            quat.to_matrix(st.dq), quat.to_matrix(expected), atol=1e-4
        )

    def test_const_accel_trajectory(self):
        """Full golden test: rotating + accelerating body, end state matches
        the analytic trajectory through propagate."""
        w = [0.4, 0.1, -0.3]
        a_w = [0.5, -0.2, 0.3]
        q0 = quat.from_axis_angle(jnp.asarray([0.2, -0.1, 0.3]))
        v0 = jnp.asarray([0.3, 0.1, -0.2])
        p0 = jnp.asarray([1.0, 2.0, 3.0])
        T = 1.0
        gyro, acc, dts, mask = make_const_motion_imu(w, a_w, q0, v0)
        st = integrate(gyro, acc, dts, mask)
        q_j, v_j, p_j = pre.propagate(st, q0, v0, p0)

        q_true = quat.mul(q0, quat.from_axis_angle(jnp.asarray(w) * T))
        v_true = v0 + jnp.asarray(a_w) * T
        p_true = p0 + v0 * T + 0.5 * jnp.asarray(a_w) * T * T
        np.testing.assert_allclose(quat.to_matrix(q_j), quat.to_matrix(q_true), atol=2e-3)
        np.testing.assert_allclose(v_j, v_true, atol=5e-3)
        np.testing.assert_allclose(p_j, p_true, atol=5e-3)

    def test_mask_padding_is_noop(self):
        gyro, acc, dts, mask = make_const_motion_imu([0.2, 0, 0.1], [0.1, 0, 0], quat.identity(), [0, 0, 0], n=100)
        st_full = integrate(gyro, acc, dts, mask)
        # pad with garbage rows that are masked out
        pad = 28
        gyro_p = jnp.concatenate([gyro, jnp.full((pad, 3), 99.0)])
        acc_p = jnp.concatenate([acc, jnp.full((pad, 3), -99.0)])
        dts_p = jnp.concatenate([dts, jnp.full((pad,), 0.1)])
        mask_p = jnp.concatenate([mask, jnp.zeros(pad, bool)])
        st_pad = integrate(gyro_p, acc_p, dts_p, mask_p)
        np.testing.assert_allclose(st_pad.dq, st_full.dq, atol=1e-6)
        np.testing.assert_allclose(st_pad.dp, st_full.dp, atol=1e-6)
        np.testing.assert_allclose(st_pad.cov, st_full.cov, atol=1e-9)
        np.testing.assert_allclose(st_pad.dt, st_full.dt, atol=1e-6)


class TestCovariance:
    def test_grows_and_symmetric_psd(self):
        gyro, acc, dts, mask = make_const_motion_imu([0.3, 0.2, 0.1], [0.2, 0, 0], quat.identity(), [0, 0, 0], n=50)
        st_short = integrate(gyro[:25], acc[:25], dts[:25], mask[:25])
        st_long = integrate(gyro, acc, dts, mask)
        tr_s = np.trace(np.asarray(st_short.cov)[0:9, 0:9])
        tr_l = np.trace(np.asarray(st_long.cov)[0:9, 0:9])
        assert tr_l > tr_s > 0
        c = np.asarray(st_long.cov)
        np.testing.assert_allclose(c, c.T, atol=1e-10)
        eig = np.linalg.eigvalsh(c)
        assert eig.min() > -1e-9

    def test_information_matrix(self):
        gyro, acc, dts, mask = make_const_motion_imu([0.1, 0, 0], [0, 0, 0], quat.identity(), [0, 0, 0], n=20)
        st = integrate(gyro, acc, dts, mask)
        info = pre.information_9(st)
        prod = np.asarray(info @ (st.cov[0:9, 0:9] + jnp.eye(9) * 1e-8))
        np.testing.assert_allclose(prod, np.eye(9), atol=1e-2)


class TestBiasCorrection:
    def test_first_order_matches_reintegration(self):
        w = [0.3, -0.1, 0.2]
        a_w = [0.4, 0.2, -0.1]
        gyro, acc, dts, mask = make_const_motion_imu(w, a_w, quat.identity(), [0, 0, 0])
        bg0 = jnp.asarray([0.01, -0.02, 0.015])
        ba0 = jnp.asarray([0.05, 0.03, -0.04])
        st = integrate(gyro, acc, dts, mask, bg0, ba0)

        dbg = jnp.asarray([2e-3, -1e-3, 1.5e-3])
        dba = jnp.asarray([5e-3, -3e-3, 2e-3])
        st_re = integrate(gyro, acc, dts, mask, bg0 + dbg, ba0 + dba)

        dq_c, dv_c, dp_c = pre.bias_corrected_delta(st, bg0 + dbg, ba0 + dba)
        np.testing.assert_allclose(quat.to_matrix(dq_c), quat.to_matrix(st_re.dq), atol=1e-4)
        np.testing.assert_allclose(dv_c, st_re.dv, atol=1e-3)
        np.testing.assert_allclose(dp_c, st_re.dp, atol=1e-3)


class TestResidual:
    def test_zero_at_truth(self):
        w = [0.2, 0.1, -0.3]
        a_w = [0.3, -0.1, 0.2]
        q0 = quat.from_axis_angle(jnp.asarray([0.1, 0.0, -0.2]))
        v0 = jnp.asarray([0.1, -0.2, 0.3])
        p0 = jnp.zeros(3)
        gyro, acc, dts, mask = make_const_motion_imu(w, a_w, q0, v0)
        st = integrate(gyro, acc, dts, mask)
        q_j, v_j, p_j = pre.propagate(st, q0, v0, p0)
        r = pre.imu_residual(st, q0, v0, p0, q_j, v_j, p_j, jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(r, 0.0, atol=1e-4)

    def test_sensitive_to_perturbation(self):
        gyro, acc, dts, mask = make_const_motion_imu([0.1, 0, 0], [0, 0, 0], quat.identity(), [0, 0, 0])
        st = integrate(gyro, acc, dts, mask)
        q0 = quat.identity()
        q_j, v_j, p_j = pre.propagate(st, q0, jnp.zeros(3), jnp.zeros(3))
        r = pre.imu_residual(
            st, q0, jnp.zeros(3), jnp.zeros(3), q_j, v_j, p_j + jnp.asarray([0.1, 0, 0]),
            jnp.zeros(3), jnp.zeros(3),
        )
        assert np.abs(np.asarray(r)[6:9]).max() > 0.05


class TestMerge:
    def test_merge_matches_full_integration(self):
        w = [0.3, -0.2, 0.4]
        a_w = [0.2, 0.3, -0.1]
        gyro, acc, dts, mask = make_const_motion_imu(w, a_w, quat.identity(), [0.1, 0, 0], n=200)
        st_full = integrate(gyro, acc, dts, mask)
        st_a = integrate(gyro[:100], acc[:100], dts[:100], mask[:100])
        st_b = integrate(gyro[100:], acc[100:], dts[100:], mask[100:])
        st_m = pre.merge(st_a, st_b)
        np.testing.assert_allclose(quat.to_matrix(st_m.dq), quat.to_matrix(st_full.dq), atol=1e-5)
        np.testing.assert_allclose(st_m.dv, st_full.dv, atol=1e-4)
        np.testing.assert_allclose(st_m.dp, st_full.dp, atol=1e-4)
        np.testing.assert_allclose(st_m.dt, st_full.dt, atol=1e-6)
        # bias Jacobians compose to ~the full-window Jacobians
        np.testing.assert_allclose(st_m.J_r_bg, st_full.J_r_bg, atol=1e-3)
        np.testing.assert_allclose(st_m.J_v_ba, st_full.J_v_ba, atol=1e-3)
        np.testing.assert_allclose(st_m.J_p_bg, st_full.J_p_bg, atol=2e-3)
        # covariance: same order of magnitude, symmetric
        np.testing.assert_allclose(
            np.trace(np.asarray(st_m.cov)), np.trace(np.asarray(st_full.cov)), rtol=0.2
        )


def test_jit_integrate():
    gyro, acc, dts, mask = make_const_motion_imu([0.1, 0.2, 0.3], [0.1, 0, 0], quat.identity(), [0, 0, 0], n=50)
    f = jax.jit(lambda g, a, d, m: pre.integrate(g, a, d, m, jnp.zeros(3), jnp.zeros(3)))
    st = f(gyro, acc, dts, mask)
    st2 = integrate(gyro, acc, dts, mask)
    np.testing.assert_allclose(st.dp, st2.dp, atol=1e-6)


@pytest.mark.slow  # the associative combine alone compiles >1 min on CPU;
# every fused e2e test exercises integrate_assoc on-path anyway
def test_integrate_assoc_matches_scan():
    """Associative-scan preintegration == sequential scan (f32 precision),
    including masked padding rows."""
    # n=32: the associative combine compiles ~2 min at n=64 on this CPU;
    # tree depth 5 still exercises every merge path
    gyro, acc, dts, mask = make_const_motion_imu([0.3, -0.2, 0.4], [0.2, 0.3, -0.1], quat.identity(), [0.1, 0, 0], n=32)
    bg = jnp.asarray([0.01, -0.02, 0.005])
    ba = jnp.asarray([0.05, 0.02, -0.03])
    s1 = pre.integrate(gyro, acc, dts, mask, bg, ba)
    s2 = pre.integrate_assoc(gyro, acc, dts, mask, bg, ba)
    np.testing.assert_allclose(np.asarray(s1.dq), np.asarray(s2.dq), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.dv), np.asarray(s2.dv), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.dp), np.asarray(s2.dp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.cov), np.asarray(s2.cov), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.J_r_bg), np.asarray(s2.J_r_bg), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.J_p_ba), np.asarray(s2.J_p_ba), atol=1e-5)
    # masked garbage rows are no-ops
    pad = 16
    g2 = jnp.concatenate([gyro, jnp.full((pad, 3), 9.0)])
    a2 = jnp.concatenate([acc, jnp.full((pad, 3), -9.0)])
    d2 = jnp.concatenate([dts, jnp.full((pad,), 0.1)])
    m2 = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    s3 = pre.integrate_assoc(g2, a2, d2, m2, bg, ba)
    np.testing.assert_allclose(np.asarray(s3.dp), np.asarray(s2.dp), atol=1e-7)
