"""SO(3): rotation-vector exp/log, hat, right Jacobians (Forster convention).

Capability parity with /root/reference/src/geometry/so3.rs:19-92 (skew,
right_jacobian_so3, right_jacobian_so3_inv with small-angle branches), built
as branch-free broadcastable JAX ops so they vectorize inside jitted solvers.
"""
from __future__ import annotations

import jax.numpy as jnp

from orbslam3_tpu.utils.precision import matmul_hp

_EPS = 1e-6


def hat(w):
    """Skew-symmetric matrix of w (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta(w):
    """Safe angle + mask. Returns (theta, theta_sq, is_small)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    is_small = theta_sq < _EPS * _EPS
    # avoid sqrt(0) grad NaN
    theta = jnp.sqrt(jnp.where(is_small, 1.0, theta_sq))
    theta = jnp.where(is_small, jnp.zeros_like(theta), theta)
    return theta, theta_sq, is_small


def exp_matrix(w):
    """Rodrigues: rotation vector (..., 3) -> rotation matrix (..., 3, 3)."""
    theta, theta_sq, is_small = _theta(w)
    W = hat(w)
    W2 = matmul_hp(W, W)
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    st = jnp.where(is_small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / jnp.where(is_small, 1.0, theta))
    ct = jnp.where(
        is_small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(is_small, 1.0, theta_sq)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + st[..., None, None] * W + ct[..., None, None] * W2


def matrix_to_quat(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Shepperd's method, vectorized: compute all four candidate extractions and
    select per-element by the largest pivot — numerically stable for every
    rotation including theta ~ pi (where trace-based extraction degrades).
    """
    r00, r11, r22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    tr = r00 + r11 + r22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.clip(x, 1e-12, None))

    # candidate 0: pivot on trace
    s0 = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack(
        [
            0.25 * s0,
            (R[..., 2, 1] - R[..., 1, 2]) / s0,
            (R[..., 0, 2] - R[..., 2, 0]) / s0,
            (R[..., 1, 0] - R[..., 0, 1]) / s0,
        ],
        axis=-1,
    )
    # candidate 1: pivot on R00
    s1 = safe_sqrt(1.0 + r00 - r11 - r22) * 2.0
    q1 = jnp.stack(
        [
            (R[..., 2, 1] - R[..., 1, 2]) / s1,
            0.25 * s1,
            (R[..., 0, 1] + R[..., 1, 0]) / s1,
            (R[..., 0, 2] + R[..., 2, 0]) / s1,
        ],
        axis=-1,
    )
    # candidate 2: pivot on R11
    s2 = safe_sqrt(1.0 - r00 + r11 - r22) * 2.0
    q2 = jnp.stack(
        [
            (R[..., 0, 2] - R[..., 2, 0]) / s2,
            (R[..., 0, 1] + R[..., 1, 0]) / s2,
            0.25 * s2,
            (R[..., 1, 2] + R[..., 2, 1]) / s2,
        ],
        axis=-1,
    )
    # candidate 3: pivot on R22
    s3 = safe_sqrt(1.0 - r00 - r11 + r22) * 2.0
    q3 = jnp.stack(
        [
            (R[..., 1, 0] - R[..., 0, 1]) / s3,
            (R[..., 0, 2] + R[..., 2, 0]) / s3,
            (R[..., 1, 2] + R[..., 2, 1]) / s3,
            0.25 * s3,
        ],
        axis=-1,
    )
    pivots = jnp.stack([tr, r00, r11, r22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    return jnp.where(q[..., :1] < 0, -q, q)


def log_matrix(R):
    """Rotation matrix (..., 3, 3) -> rotation vector (..., 3).

    Goes through quaternion extraction + atan2, which keeps full precision
    near theta = pi (unlike the arccos-of-trace formula).
    """
    q = matrix_to_quat(R)
    w = q[..., 0]
    vn_sq = jnp.sum(q[..., 1:] ** 2, axis=-1)
    is_small = vn_sq < 1e-14
    vn = jnp.sqrt(jnp.where(is_small, 1.0, vn_sq))
    vn = jnp.where(is_small, 0.0, vn)
    theta = 2.0 * jnp.arctan2(vn, w)
    k = jnp.where(is_small, 2.0, theta / jnp.where(is_small, 1.0, vn))
    return k[..., None] * q[..., 1:]


def right_jacobian(w):
    """Right Jacobian of SO(3) (Forster eq. 8): Jr(w).

    Exp(w + dw) ~ Exp(w) Exp(Jr(w) dw).
    """
    theta, theta_sq, is_small = _theta(w)
    W = hat(w)
    W2 = matmul_hp(W, W)
    t3 = jnp.where(is_small, 1.0, theta_sq * theta)
    a = jnp.where(is_small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(is_small, 1.0, theta_sq))
    b = jnp.where(is_small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / t3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - a[..., None, None] * W + b[..., None, None] * W2


def right_jacobian_inv(w):
    """Inverse right Jacobian of SO(3)."""
    theta, theta_sq, is_small = _theta(w)
    W = hat(w)
    W2 = matmul_hp(W, W)
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        is_small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 / jnp.where(is_small, 1.0, theta_sq))
        * (1.0 - half_theta * jnp.cos(half_theta) / jnp.where(is_small, 1.0, jnp.sin(half_theta))),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + cot_term[..., None, None] * W2
