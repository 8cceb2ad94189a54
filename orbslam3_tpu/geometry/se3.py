"""SE(3) poses as (quat wxyz, translation) pairs — batched, jit-safe.

Capability parity with /root/reference/src/geometry/se3.rs (compose, inverse,
transform, matrix converters) plus exp/log maps used by the solvers. Poses
are stored as flat arrays so a map of K keyframes is just (K,4) + (K,3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from orbslam3_tpu.geometry import quat, so3
from orbslam3_tpu.utils.precision import matmul_hp


class SE3(NamedTuple):
    """Rigid transform: x_out = R(q) @ x + t. Batched over leading dims."""

    q: jnp.ndarray  # (..., 4) wxyz unit quaternion
    t: jnp.ndarray  # (..., 3)

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "SE3":
        return SE3(quat.identity(shape, dtype), jnp.zeros(shape + (3,), dtype))

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other: apply `other` first."""
        return SE3(
            quat.normalize(quat.mul(self.q, other.q)),
            quat.rotate(self.q, other.t) + self.t,
        )

    def inverse(self) -> "SE3":
        qi = quat.conj(self.q)
        return SE3(qi, -quat.rotate(qi, self.t))

    def apply(self, x):
        """Transform points x (..., 3)."""
        return quat.rotate(self.q, x) + self.t

    def rotation_matrix(self):
        return quat.to_matrix(self.q)

    def matrix(self):
        """(..., 4, 4) homogeneous matrix."""
        R = quat.to_matrix(self.q)
        top = jnp.concatenate([R, self.t[..., None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def from_matrix(T) -> "SE3":
        return SE3(quat.from_matrix(T[..., :3, :3]), T[..., :3, 3])

    def retract(self, xi) -> "SE3":
        """Right-multiplicative update with xi = (..., 6) = [rho, phi].

        T' = T * Exp(xi). Matches the local-parameterization used by the
        Gauss-Newton solvers (delta around current estimate).
        """
        dq = quat.from_axis_angle(xi[..., 3:6])
        dt = xi[..., 0:3]
        return self.compose(SE3(dq, dt))

    def local(self, other: "SE3"):
        """xi such that other ≈ self.retract(xi) (first order)."""
        d = self.inverse().compose(other)
        return jnp.concatenate([d.t, quat.to_axis_angle(d.q)], axis=-1)

    @staticmethod
    def exp(xi) -> "SE3":
        """se(3) exp with xi = [rho, phi] (..., 6)."""
        phi = xi[..., 3:6]
        rho = xi[..., 0:3]
        q = quat.from_axis_angle(phi)
        V = _left_jacobian_V(phi)
        t = jnp.einsum("...ij,...j->...i", V, rho, precision="highest")
        return SE3(q, t)

    def log(self):
        """(..., 6) = [rho, phi]."""
        phi = quat.to_axis_angle(self.q)
        Vinv = jnp.linalg.inv(_left_jacobian_V(phi))
        rho = jnp.einsum("...ij,...j->...i", Vinv, self.t, precision="highest")
        return jnp.concatenate([rho, phi], axis=-1)


def _left_jacobian_V(phi):
    """SO(3) left Jacobian (the V matrix of SE(3) exp)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    is_small = theta_sq < 1e-12
    theta = jnp.sqrt(jnp.where(is_small, 1.0, theta_sq))
    theta = jnp.where(is_small, 0.0, theta)
    W = so3.hat(phi)
    W2 = matmul_hp(W, W)
    a = jnp.where(is_small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(is_small, 1.0, theta_sq))
    t3 = jnp.where(is_small, 1.0, theta_sq * theta)
    b = jnp.where(is_small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / t3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2
