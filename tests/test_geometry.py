"""Geometry layer tests: SO(3)/SE(3)/Sim(3) group axioms, exp/log roundtrips,
Jacobian identities. Mirrors the reference's coverage
(/root/reference/src/geometry/{so3.rs:94-158, sim3.rs:236-401}).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.geometry import quat, se3, sim3, so3
from orbslam3_tpu.geometry.se3 import SE3
from orbslam3_tpu.geometry.sim3 import Sim3

RNG = np.random.default_rng(0)


def rand_w(n=8, scale=1.0):
    """Random rotation vectors with norm clipped inside (-pi, pi) so exp/log
    roundtrips are well-defined (log returns the wrapped representative)."""
    w = RNG.normal(size=(n, 3)) * scale
    nrm = np.linalg.norm(w, axis=-1, keepdims=True)
    w = np.where(nrm > 3.0, w * (3.0 / nrm), w)
    return jnp.asarray(w, dtype=jnp.float32)


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = rand_w(16, 1.0)
        R = so3.exp_matrix(w)
        w2 = so3.log_matrix(R)
        np.testing.assert_allclose(w, w2, atol=2e-5)

    def test_exp_small_angle(self):
        w = rand_w(8, 1e-8)
        R = so3.exp_matrix(w)
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-6)

    def test_exp_orthonormal(self):
        R = so3.exp_matrix(rand_w(8, 2.0))
        RtR = jnp.swapaxes(R, -1, -2) @ R
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), R.shape), atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_log_near_pi(self):
        axis = np.array([1.0, 0.0, 0.0], dtype=np.float32)
        w = jnp.asarray((np.pi - 1e-4) * axis)[None]
        w2 = so3.log_matrix(so3.exp_matrix(w))
        np.testing.assert_allclose(w, w2, atol=1e-3)

    def test_right_jacobian_identity(self):
        """Exp(w + dw) ≈ Exp(w) Exp(Jr dw)."""
        w = rand_w(8, 1.0)
        dw = rand_w(8, 1e-4)
        lhs = so3.exp_matrix(w + dw)
        Jr = so3.right_jacobian(w)
        rhs = so3.exp_matrix(w) @ so3.exp_matrix(
            jnp.einsum("...ij,...j->...i", Jr, dw)
        )
        np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_right_jacobian_inv(self):
        w = rand_w(8, 1.0)
        J = so3.right_jacobian(w) @ so3.right_jacobian_inv(w)
        np.testing.assert_allclose(J, np.broadcast_to(np.eye(3), J.shape), atol=1e-5)

    def test_hat_vee(self):
        w = rand_w(4)
        np.testing.assert_allclose(so3.vee(so3.hat(w)), w)


class TestQuat:
    def test_rotate_matches_matrix(self):
        w = rand_w(8, 2.0)
        q = quat.from_axis_angle(w)
        v = rand_w(8, 3.0)
        np.testing.assert_allclose(
            quat.rotate(q, v),
            jnp.einsum("...ij,...j->...i", so3.exp_matrix(w), v),
            atol=1e-5,
        )

    def test_axis_angle_roundtrip(self):
        w = rand_w(16, 1.5)
        np.testing.assert_allclose(quat.to_axis_angle(quat.from_axis_angle(w)), w, atol=1e-5)

    def test_mul_matches_matrix_product(self):
        w1, w2 = rand_w(8), rand_w(8)
        q = quat.mul(quat.from_axis_angle(w1), quat.from_axis_angle(w2))
        R = so3.exp_matrix(w1) @ so3.exp_matrix(w2)
        np.testing.assert_allclose(quat.to_matrix(q), R, atol=1e-5)

    def test_from_matrix(self):
        w = rand_w(8, 2.0)
        R = so3.exp_matrix(w)
        q = quat.from_matrix(R)
        np.testing.assert_allclose(quat.to_matrix(q), R, atol=1e-4)


class TestSE3:
    def rand_T(self, n=8):
        return SE3(quat.from_axis_angle(rand_w(n, 1.0)), rand_w(n, 2.0))

    def test_compose_inverse(self):
        T = self.rand_T()
        I = T.compose(T.inverse())
        np.testing.assert_allclose(I.t, np.zeros_like(I.t), atol=1e-5)
        np.testing.assert_allclose(np.abs(I.q[..., 0]), 1.0, atol=1e-5)

    def test_apply_matches_matrix(self):
        T = self.rand_T()
        x = rand_w(8, 2.0)
        xh = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
        np.testing.assert_allclose(
            T.apply(x), jnp.einsum("...ij,...j->...i", T.matrix(), xh)[..., :3], atol=1e-5
        )

    def test_exp_log_roundtrip(self):
        xi = np.asarray(RNG.normal(size=(8, 6)), dtype=np.float32)
        # keep rotation part inside (-pi, pi) so log returns the same branch
        nrm = np.linalg.norm(xi[:, 3:6], axis=-1, keepdims=True)
        xi[:, 3:6] = np.where(nrm > 2.8, xi[:, 3:6] * (2.8 / nrm), xi[:, 3:6])
        xi = jnp.asarray(xi)
        np.testing.assert_allclose(SE3.exp(xi).log(), xi, atol=1e-4)

    def test_retract_local(self):
        T = self.rand_T()
        xi = jnp.asarray(RNG.normal(size=(8, 6)) * 1e-3, dtype=jnp.float32)
        T2 = T.retract(xi)
        np.testing.assert_allclose(T.local(T2), xi, atol=1e-5)

    def test_from_matrix_roundtrip(self):
        T = self.rand_T()
        T2 = SE3.from_matrix(T.matrix())
        np.testing.assert_allclose(T2.matrix(), T.matrix(), atol=1e-4)


class TestSim3:
    def rand_S(self, n=8):
        return Sim3(
            quat.from_axis_angle(rand_w(n, 1.0)),
            rand_w(n, 2.0),
            jnp.exp(jnp.asarray(RNG.normal(size=n) * 0.3, dtype=jnp.float32)),
        )

    def test_compose_inverse(self):
        S = self.rand_S()
        I = S.compose(S.inverse())
        np.testing.assert_allclose(I.t, np.zeros_like(I.t), atol=1e-4)
        np.testing.assert_allclose(I.s, 1.0, atol=1e-5)

    def test_apply_composition(self):
        S1, S2 = self.rand_S(), self.rand_S()
        x = rand_w(8, 2.0)
        np.testing.assert_allclose(
            S1.compose(S2).apply(x), S1.apply(S2.apply(x)), atol=1e-4
        )

    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(16, 7)) * 0.5, dtype=jnp.float32)
        S = Sim3.exp(xi)
        np.testing.assert_allclose(S.log(), xi, atol=1e-3)

    def test_exp_zero_is_identity(self):
        S = Sim3.exp(jnp.zeros((4, 7)))
        np.testing.assert_allclose(S.s, 1.0, atol=1e-6)
        np.testing.assert_allclose(S.t, 0.0, atol=1e-6)

    def test_exp_pure_scale(self):
        xi = jnp.zeros((1, 7)).at[:, 6].set(0.7)
        S = Sim3.exp(xi)
        np.testing.assert_allclose(S.s, np.exp(0.7), rtol=1e-5)

    def test_se3_consistency(self):
        """sigma=0 Sim3 exp matches SE3 exp."""
        xi6 = jnp.asarray(RNG.normal(size=(8, 6)) * 0.5, dtype=jnp.float32)
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1))], axis=-1)
        S = Sim3.exp(xi7)
        T = SE3.exp(xi6)
        np.testing.assert_allclose(S.t, T.t, atol=1e-4)
        np.testing.assert_allclose(S.q, T.q, atol=1e-5)


def test_jit_and_vmap():
    """Everything compiles under jit and vmaps cleanly."""
    f = jax.jit(lambda w: so3.log_matrix(so3.exp_matrix(w)))
    w = rand_w(4)
    np.testing.assert_allclose(f(w), w, atol=1e-5)

    g = jax.jit(jax.vmap(lambda xi: SE3.exp(xi).log()))
    xi = jnp.asarray(RNG.normal(size=(4, 6)), dtype=jnp.float32)
    np.testing.assert_allclose(g(xi), xi, atol=1e-4)
