"""Motion-only pose optimization (visual and visual-inertial), one jitted GN.

Replaces two reference paths at once:
  * OpenCV solve_pnp_ransac + inlier recount (geometry/pnp.rs:29-137,
    tracker.rs:948) — here a robust GN from the motion/IMU prior with
    per-round chi2 re-gating (the ORB-SLAM3 PoseOptimization shape);
  * the 15-param pose-inertial LM (optimizer/pose_inertial_optim.rs:94)
    — pose + velocity + bias refinement against the previous keyframe's
    preintegration, with jacfwd-exact IMU Jacobians (the reference uses
    numerical differencing there).

Stereo observations contribute 3D residuals (u, v, u_right); mono ones 2D.
All shapes fixed; outliers handled by masks.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orbslam3_tpu.frontend.camera import Camera
from orbslam3_tpu.geometry import quat
from orbslam3_tpu.imu import preintegration as pre
from orbslam3_tpu.optim import robust
from orbslam3_tpu.utils.precision import matmul_hp as mm


def _retract(q, p, xi):
    """Right-multiplicative SE3 update on (q_wb, p_w): rotation last 3."""
    dq = quat.from_axis_angle(xi[3:6])
    return quat.normalize(quat.mul(q, dq)), p + quat.rotate(q, xi[0:3])


def _visual_residual(xi, q0, p0, cam: Camera, Xw, uv, ur):
    """Single-observation stereo reprojection residual (3,). ur < 0 => mono.

    (q0, p0) is the BODY pose; T_BC from `cam` maps into the camera frame
    (reference: frames.rs:159-312 — identity fast path when cam.q_bc is
    None, matching the reference's camera==body synthetic setups)."""
    q, p = _retract(q0, p0, xi)
    q_wc, p_wc = cam.body_to_cam_pose(q, p)
    Xc = quat.rotate(quat.conj(q_wc), Xw - p_wc)
    z = jnp.maximum(Xc[2], 1e-3)
    u_hat = cam.fx * Xc[0] / z + cam.cx
    v_hat = cam.fy * Xc[1] / z + cam.cy
    ur_hat = u_hat - cam.bf / z
    r = jnp.stack([uv[0] - u_hat, uv[1] - v_hat, jnp.where(ur >= 0, ur - ur_hat, 0.0)])
    return r


class PoseOptResult(NamedTuple):
    q: jnp.ndarray
    p: jnp.ndarray
    inliers: jnp.ndarray  # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    chi2: jnp.ndarray  # (N,) final per-obs chi2


@partial(jax.jit, static_argnames=("rounds", "iters_per_round"))
def pose_optimize(
    q0,
    p0,
    cam: Camera,
    mp_w,
    uv,
    ur,
    octave,
    valid,
    rounds: int = 4,
    iters_per_round: int = 4,
) -> PoseOptResult:
    """Robust motion-only GN: optimize (q_wb, p_w) against matched points.

    Args:
      mp_w: (N, 3) matched map point world positions
      uv: (N, 2) observed pixels; ur: (N,) right-u or -1
      octave: (N,) int32; valid: (N,) bool initial match mask
    """
    s2inv = robust.octave_sigma2_inv(octave)
    # per-round chi2 gates, annealed like the reference
    # (pose_inertial_optim.rs:34-45): start loose, end at the 95% quantile
    gates = jnp.linspace(2.5, 1.0, rounds)

    jac_fn = jax.vmap(jax.jacfwd(_visual_residual), in_axes=(None, None, None, None, 0, 0, 0))
    res_fn = jax.vmap(_visual_residual, in_axes=(None, None, None, None, 0, 0, 0))
    zero = jnp.zeros(6, jnp.float32)

    def chi2_of(q, p):
        r = res_fn(zero, q, p, cam, mp_w, uv, ur)
        return jnp.sum(r * r, -1) * s2inv, r

    def gn_step(carry, _):
        q, p, inl = carry
        r = res_fn(zero, q, p, cam, mp_w, uv, ur)  # (N, 3)
        J = jac_fn(zero, q, p, cam, mp_w, uv, ur)  # (N, 3, 6)
        chi2 = jnp.sum(r * r, -1) * s2inv
        is_stereo = ur >= 0
        delta2 = jnp.where(is_stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
        w = robust.huber_weight(chi2, delta2) * s2inv * inl
        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J, precision="highest")
        b = jnp.einsum("nij,ni->j", Jw, r, precision="highest")
        H = H + jnp.eye(6) * 1e-5
        dx = -jnp.linalg.solve(H, b)
        q, p = _retract(q, p, dx)
        return (q, p, inl), None

    def round_step(carry, gate):
        q, p, inl = carry
        (q, p, inl), _ = jax.lax.scan(gn_step, (q, p, inl), None, length=iters_per_round)
        chi2, _ = chi2_of(q, p)
        delta2 = jnp.where(ur >= 0, robust.CHI2_STEREO, robust.CHI2_MONO)
        inl = valid.astype(jnp.float32) * (chi2 <= gate * delta2).astype(jnp.float32)
        return (q, p, inl), None

    inl0 = valid.astype(jnp.float32)
    (q, p, inl), _ = jax.lax.scan(round_step, (q0, p0, inl0), gates)
    chi2, _ = chi2_of(q, p)
    inliers = inl > 0
    return PoseOptResult(q, p, inliers, jnp.sum(inliers.astype(jnp.int32)), chi2)


# ---------------------------------------------------------------------------
# pose + velocity + bias refinement against previous keyframe (VI tracking)
# ---------------------------------------------------------------------------
def _vi_states(x, q0, p0, v0, bg0, ba0):
    """Unpack 15-dof delta into retracted states."""
    q, p = _retract(q0, p0, x[0:6])
    v = v0 + x[6:9]
    bg = bg0 + x[9:12]
    ba = ba0 + x[12:15]
    return q, p, v, bg, ba


@partial(jax.jit, static_argnames=("iters",))
def pose_inertial_optimize(
    q0,
    p0,
    v0,
    bg0,
    ba0,
    cam: Camera,
    mp_w,
    uv,
    ur,
    octave,
    valid,
    preint: pre.PreintState,
    q_kf,
    p_kf,
    v_kf,
    prior_bg,
    prior_ba,
    gravity=None,
    iters: int = 8,
    bias_prior_weight: float = 1e4,
    imu_cap=None,
):
    """15-dof single-frame refinement: visual + IMU edge to previous KF.

    (reference: pose_inertial_optimization, pose_inertial_optim.rs:94 —
    4 annealed LM iters, visual + 9D IMU edge + bias prior; here GN with
    jacfwd-exact Jacobians and the IMU information from the preintegrated
    covariance)

    `gravity` is the WORLD-frame gravity vector (from IMU init — the SLAM
    world is the first body frame, so gravity is generally NOT -z).
    """
    if gravity is None:
        gravity = pre.GRAVITY
    s2inv = robust.octave_sigma2_inv(octave)
    # IMU edge whitening with a reference-state uncertainty floor: the
    # anchor keyframe's estimated pose/velocity carries ~cm-level error that
    # the raw preintegration covariance (sub-mm over fractions of a second)
    # would otherwise treat as signal, letting the bias states absorb it.
    cov9 = preint.cov[0:9, 0:9]
    cov9 = 0.5 * (cov9 + cov9.T) + jnp.diag(
        jnp.concatenate(
            [jnp.full(3, 5e-3**2), jnp.full(3, 0.05**2), jnp.full(3, 0.02**2)]
        )
    )
    info9 = jnp.linalg.inv(cov9)
    L = jnp.linalg.cholesky(info9 + jnp.eye(9) * 1e-8)

    zero = jnp.zeros(15, jnp.float32)

    def step(carry, _):
        q0_, p0_, v0_, bg0_, ba0_ = carry

        def vr(x, Xw, uv_i, ur_i):
            q, p = _retract(q0_, p0_, x[0:6])
            return _visual_residual(jnp.zeros(6), q, p, cam, Xw, uv_i, ur_i)

        def ir(x):
            q, p = _retract(q0_, p0_, x[0:6])
            v = v0_ + x[6:9]
            bg = bg0_ + x[9:12]
            ba = ba0_ + x[12:15]
            r9 = pre.imu_residual(preint, q_kf, v_kf, p_kf, q, v, p, bg, ba, gravity=gravity)
            rw = mm(L.T, r9)
            # robust (Huber) IMU edge with a STATE-DEPENDENT cap: the
            # visual term is huber-capped, so an unbounded IMU edge wins
            # any conflict — after dead-reckoning through a blackout the
            # carried velocity is wildly wrong and a quadratic edge drags
            # the pose away from a perfectly good visual solution
            # (measured ~4 m/s post-reacquisition drift). No single cap
            # separates the regimes in whitened-norm space (cap 10 taxed
            # nominal ATE 0.088 -> 0.16; cap 30 let recovery drift 1.3 m
            # -> 21.8 m; a 40/80 flat-fade diverged the EuRoC fixture) —
            # but the STATE MACHINE knows when the prior is suspect: the
            # caller passes imu_cap ~10 while recently recovered from a
            # lost stretch (vision-led reacquisition), ~30 in steady
            # tracking (full VI accuracy).
            nrm = jnp.linalg.norm(rw)
            cap = 30.0 if imu_cap is None else imu_cap
            return rw * jnp.sqrt(jnp.minimum(1.0, cap / jnp.maximum(nrm, 1e-9)))

        def br(x):
            bg = bg0_ + x[9:12]
            ba = ba0_ + x[12:15]
            return jnp.concatenate([bg - prior_bg, ba - prior_ba]) * jnp.sqrt(
                bias_prior_weight
            )

        rv = jax.vmap(vr, in_axes=(None, 0, 0, 0))(zero, mp_w, uv, ur)  # (N,3)
        Jv = jax.vmap(jax.jacfwd(vr), in_axes=(None, 0, 0, 0))(zero, mp_w, uv, ur)
        chi2 = jnp.sum(rv * rv, -1) * s2inv
        delta2 = jnp.where(ur >= 0, robust.CHI2_STEREO, robust.CHI2_MONO)
        w = robust.huber_weight(chi2, delta2) * s2inv * valid
        Jw = Jv * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, Jv, precision="highest")
        b = jnp.einsum("nij,ni->j", Jw, rv, precision="highest")

        ri = ir(zero)
        Ji = jax.jacfwd(ir)(zero)  # (9, 15)
        H = H + mm(Ji.T, Ji)
        b = b + mm(Ji.T, ri)

        rb = br(zero)
        Jb = jax.jacfwd(br)(zero)
        H = H + mm(Jb.T, Jb)
        b = b + mm(Jb.T, rb)

        H = H + jnp.eye(15) * 1e-4
        dx = -jnp.linalg.solve(H, b)
        q_n, p_n = _retract(q0_, p0_, dx[0:6])
        return (q_n, p_n, v0_ + dx[6:9], bg0_ + dx[9:12], ba0_ + dx[12:15]), None

    (q, p, v, bg, ba), _ = jax.lax.scan(
        step, (q0, p0, v0, bg0, ba0), None, length=iters
    )
    # final inlier classification
    rv = jax.vmap(
        lambda Xw, uv_i, ur_i: _visual_residual(jnp.zeros(6), q, p, cam, Xw, uv_i, ur_i),
        in_axes=(0, 0, 0),
    )(mp_w, uv, ur)
    chi2 = jnp.sum(rv * rv, -1) * s2inv
    delta2 = jnp.where(ur >= 0, robust.CHI2_STEREO, robust.CHI2_MONO)
    inliers = (valid > 0) & (chi2 <= delta2)
    return q, p, v, bg, ba, inliers, jnp.sum(inliers.astype(jnp.int32))