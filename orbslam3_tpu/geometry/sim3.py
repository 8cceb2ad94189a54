"""Sim(3) similarity transforms for loop closing / pose-graph optimization.

Capability parity with /root/reference/src/geometry/sim3.rs (compose,
inverse, transform, 7-D log/exp/retract). x_out = s * R(q) @ x + t.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from orbslam3_tpu.geometry import quat, so3
from orbslam3_tpu.utils.precision import matmul_hp
from orbslam3_tpu.geometry.se3 import SE3


class Sim3(NamedTuple):
    q: jnp.ndarray  # (..., 4)
    t: jnp.ndarray  # (..., 3)
    s: jnp.ndarray  # (...,) scale

    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "Sim3":
        return Sim3(
            quat.identity(shape, dtype),
            jnp.zeros(shape + (3,), dtype),
            jnp.ones(shape, dtype),
        )

    @staticmethod
    def from_se3(T: SE3, s=None) -> "Sim3":
        scale = jnp.ones(T.q.shape[:-1], T.q.dtype) if s is None else jnp.asarray(s)
        return Sim3(T.q, T.t, scale)

    def to_se3(self) -> SE3:
        """Drop scale (used when applying corrections to keyframe poses)."""
        return SE3(self.q, self.t)

    def apply(self, x):
        return self.s[..., None] * quat.rotate(self.q, x) + self.t

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(
            quat.normalize(quat.mul(self.q, other.q)),
            self.s[..., None] * quat.rotate(self.q, other.t) + self.t,
            self.s * other.s,
        )

    def inverse(self) -> "Sim3":
        qi = quat.conj(self.q)
        si = 1.0 / self.s
        return Sim3(qi, -si[..., None] * quat.rotate(qi, self.t), si)

    def log(self):
        """(..., 7) = [nu(3), phi(3), sigma(1)] with sigma = log s."""
        phi = quat.to_axis_angle(self.q)
        sigma = jnp.log(self.s)
        W = _sim3_W(phi, sigma)
        nu = jnp.einsum("...ij,...j->...i", jnp.linalg.inv(W), self.t, precision="highest")
        return jnp.concatenate([nu, phi, sigma[..., None]], axis=-1)

    @staticmethod
    def exp(xi) -> "Sim3":
        nu, phi, sigma = xi[..., 0:3], xi[..., 3:6], xi[..., 6]
        q = quat.from_axis_angle(phi)
        W = _sim3_W(phi, sigma)
        t = jnp.einsum("...ij,...j->...i", W, nu, precision="highest")
        return Sim3(q, t, jnp.exp(sigma))

    def retract(self, xi) -> "Sim3":
        return self.compose(Sim3.exp(xi))


def _sim3_W(phi, sigma):
    """The W matrix of the Sim(3) exponential (Strasdat's thesis, eq. 5.73).

    W = C*I + A*hat(phi) + B*hat(phi)^2, with (following the standard Sim(3)
    closed form, generic-theta branch):
        s = e^sigma, a = s*sin(theta), b = s*cos(theta), c = theta^2 + sigma^2
        C = (s - 1)/sigma
        A = (a*sigma + (1 - b)*theta) / (theta * c)
        B = (C - ((b - 1)*sigma + a*theta)/c) / theta^2
    with Taylor fallbacks at small theta / small sigma. jnp.where with safe
    operands keeps it jit/grad safe.
    """
    dtype = phi.dtype
    theta_sq = jnp.sum(phi * phi, axis=-1)
    small_t = theta_sq < 1e-10
    theta = jnp.sqrt(jnp.where(small_t, 1.0, theta_sq))
    theta = jnp.where(small_t, 0.0, theta)
    small_s = jnp.abs(sigma) < 1e-5
    s = jnp.exp(sigma)
    sig_safe = jnp.where(small_s, 1.0, sigma)
    sig2 = sigma * sigma

    # C = (s - 1)/sigma, Taylor: 1 + sigma/2 + sigma^2/6
    C = jnp.where(small_s, 1.0 + sigma / 2.0 + sig2 / 6.0, (s - 1.0) / sig_safe)

    th_safe = jnp.where(small_t, 1.0, theta)
    c_safe = jnp.where(small_t, 1.0, theta_sq + sig2)
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)

    A_g = (a * sigma + (1.0 - b) * theta) / (th_safe * c_safe)
    B_g = (C - ((b - 1.0) * sigma + a * theta) / c_safe) / jnp.where(small_t, 1.0, theta_sq)

    # small-theta limits (exact in sigma, theta -> 0)
    A_s = jnp.where(
        small_s,
        0.5 + sigma / 3.0 + sig2 / 8.0,
        ((sigma - 1.0) * s + 1.0) / jnp.where(small_s, 1.0, sig2),
    )
    B_s = jnp.where(
        small_s,
        1.0 / 6.0 + sigma / 8.0,
        ((0.5 * sig2 - sigma + 1.0) * s - 1.0) / jnp.where(small_s, 1.0, sig2 * sig_safe),
    )

    A = jnp.where(small_t, A_s, A_g)
    B = jnp.where(small_t, B_s, B_g)

    W = so3.hat(phi)
    W2 = matmul_hp(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), W.shape)
    return C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * W2
