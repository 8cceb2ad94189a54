"""Visual-inertial initialization: joint gravity / velocity / bias solve.

Capability parity with /root/reference/src/local_mapping/imu_init.rs +
optimizer/inertial_init_optim.rs (LM over n*3 velocities + shared bias +
gravity direction, numerical Jacobians) — here ONE dense GN over
x = [v_0..v_{W-1} (3W), bg (3), ba (3), g_w (3)] with jacfwd-exact
Jacobians and preintegration-covariance whitening. The state is tiny
(3W+9 <= ~80), so the dense solve is negligible; all W-1 edges evaluate
batched via vmap.

Gravity is solved as a free 3-vector with a soft ||g|| = 9.81 constraint
(the reference parameterizes a 2-dof rotation; the soft-norm form is
simpler and equally well-conditioned once velocities are observable).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam3_tpu.geometry import quat
from orbslam3_tpu.imu import preintegration as pre
from orbslam3_tpu.utils.precision import matmul_hp as mm


class ImuInitResult(NamedTuple):
    vels: jnp.ndarray  # (W, 3)
    bias_g: jnp.ndarray  # (3,)
    bias_a: jnp.ndarray  # (3,)
    gravity_w: jnp.ndarray  # (3,)
    cost0: jnp.ndarray
    cost1: jnp.ndarray


@partial(jax.jit, static_argnames=("iters",))
def inertial_init(
    qs,
    ps,
    preints: pre.PreintState,  # batched over (W-1,) consecutive edges
    edge_valid,
    iters: int = 20,
    w_bg_prior: float = 1e2,
    w_ba_prior: float = 1e3,
    w_gnorm: float = 1e3,
    sigma_pose_rot: float = 5e-3,
    sigma_pose_vel: float = 0.05,
    sigma_pose_pos: float = 0.02,
    prior_scale=1.0,
) -> ImuInitResult:
    """Solve for velocities, biases, and world gravity from keyframe poses.

    Args:
      qs, ps: (W, 4), (W, 3) keyframe poses from visual odometry
      preints: PreintState with leading dim (W-1) — edge i connects kf i -> i+1
      edge_valid: (W-1,) bool
      prior_scale: scales the bias priors — the reference phases them by
        map age (<5 s strong, <15 s moderate, then none;
        inertial_init_optim.rs:81-115). 1.0 for the first init; the
        refinement phases pass smaller values as pose accuracy matures.
    """
    W = qs.shape[0]
    E = W - 1

    # whitening from preintegration covariance (rot/vel/pos blocks) PLUS a
    # visual-pose-uncertainty floor: the keyframe poses come from visual
    # odometry with ~cm/mrad errors, which dwarf the preintegration noise
    # over short edges. Without the floor the LS exploits the gravity/
    # accel-bias degeneracy to "explain" pose noise (huge wrong ba).
    pose_cov = jnp.diag(
        jnp.concatenate(
            [
                jnp.full(3, sigma_pose_rot**2),
                jnp.full(3, sigma_pose_vel**2),
                jnp.full(3, sigma_pose_pos**2),
            ]
        )
    )

    def edge_L(st):
        cov9 = st.cov[0:9, 0:9]
        cov9 = 0.5 * (cov9 + cov9.T) + pose_cov
        info = jnp.linalg.inv(cov9)
        return jnp.linalg.cholesky(info + jnp.eye(9) * 1e-8)

    Ls = jax.vmap(edge_L)(preints)  # (E, 9, 9)

    def unpack(x):
        v = x[: 3 * W].reshape(W, 3)
        bg = x[3 * W : 3 * W + 3]
        ba = x[3 * W + 3 : 3 * W + 6]
        g = x[3 * W + 6 : 3 * W + 9]
        return v, bg, ba, g

    # ---- stage A: gyro bias from rotation residuals only (their own GN —
    # rotations don't involve v/g/ba, so this is a clean 3-dof subproblem)
    def rot_residuals(bg):
        def edge_rot(i, st):
            dq, _, _ = pre.bias_corrected_delta(st, bg, jnp.zeros(3))
            q_err = quat.mul(quat.conj(dq), quat.mul(quat.conj(qs[i]), qs[i + 1]))
            return quat.to_axis_angle(q_err) * edge_valid[i]

        return jax.vmap(edge_rot, in_axes=(0, 0))(jnp.arange(E), preints).reshape(-1)

    def bg_step(bg, _):
        r = rot_residuals(bg)
        J = jax.jacfwd(rot_residuals)(bg)
        H = mm(J.T, J) + jnp.eye(3) * 1e-6
        return bg - jnp.linalg.solve(H, mm(J.T, r)), None

    bg0, _ = jax.lax.scan(bg_step, jnp.zeros(3, jnp.float32), None, length=5)

    # ---- stage B: with bg fixed and NO gravity-norm constraint the v/p
    # residuals are exactly linear in (v, ba, g) -> one GN step lands on the
    # global least-squares optimum (no local minima; this is what makes the
    # init robust where a joint nonconvex solve is not)
    x0 = jnp.zeros(3 * W + 9, jnp.float32).at[3 * W : 3 * W + 3].set(bg0)

    def residuals_nonorm(x):
        v, bg, ba, g = unpack(x)

        def edge_res(i, st, L):
            r9 = pre.imu_residual(
                st, qs[i], v[i], ps[i], qs[i + 1], v[i + 1], ps[i + 1], bg, ba, gravity=g
            )
            return mm(L.T, r9) * edge_valid[i]

        r_edges = jax.vmap(edge_res, in_axes=(0, 0, 0))(
            jnp.arange(E), preints, Ls
        ).reshape(-1)
        r_priors = jnp.concatenate(
            [(bg - bg0) * w_bg_prior, ba * w_ba_prior]
        ) * jnp.maximum(prior_scale, 1e-2)  # keep conditioning at "none"
        return jnp.concatenate([r_edges, r_priors])

    def lin_step(x, _):
        r = residuals_nonorm(x)
        J = jax.jacfwd(residuals_nonorm)(x)
        H = mm(J.T, J) + jnp.eye(x.shape[0]) * 1e-5
        return x - jnp.linalg.solve(H, mm(J.T, r)), None

    x1, _ = jax.lax.scan(lin_step, x0, None, length=3)

    # ---- stage C: norm-constrained polish from the linear solution
    def residuals(x):
        _, bg, ba, g = unpack(x)
        return jnp.concatenate(
            [
                residuals_nonorm(x),
                jnp.array([jnp.linalg.norm(g) - 9.81]) * w_gnorm,
            ]
        )

    def gn_step(x, _):
        r = residuals(x)
        J = jax.jacfwd(residuals)(x)
        H = mm(J.T, J) + jnp.eye(x.shape[0]) * 1e-4
        b = mm(J.T, r)
        x = x - jnp.linalg.solve(H, b)
        return x, None

    cost0 = jnp.sum(residuals(x0) ** 2)
    x, _ = jax.lax.scan(gn_step, x1, None, length=iters)
    cost1 = jnp.sum(residuals(x) ** 2)
    v, bg, ba, g = unpack(x)
    return ImuInitResult(v, bg, ba, g, cost0, cost1)
