"""Deterministic synthetic stereo-inertial world with exact ground truth.

Design:
  * Trajectory: smooth sum-of-sinusoids SE(3) path inside a box room;
    derivatives (velocity, acceleration, body rates) come from jax autodiff
    of the analytic pose function, so IMU samples are exact to machine
    precision — golden data for preintegration and the full pipeline.
  * Landmarks: random points on the room's walls. Each renders as a
    2x2-checker "fiducial" patch (strong FAST corner at its center, a
    per-landmark random quadrant pattern for descriptor distinctiveness),
    splatted with painter's-order depth handling (near landmarks last).
  * Stereo: left camera = body frame; right camera offset by the baseline
    along +x (camera RDF convention: x right, y down, z forward).

This replaces the reference's reliance on on-disk EuRoC sequences
(io/euroc.rs) for testing; the same front-end/back-end code paths run on
either source.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.frontend.camera import Camera
from orbslam3_tpu.geometry import quat
from orbslam3_tpu.imu.preintegration import GRAVITY


class SyntheticConfig(NamedTuple):
    seed: int = 7
    n_landmarks: int = 1500
    room_half: tuple = (5.0, 5.0, 2.0)  # box half-extents [m]
    duration: float = 20.0  # [s]
    cam_hz: float = 20.0
    imu_hz: float = 200.0
    width: int = 752
    height: int = 480
    fx: float = 458.0
    fy: float = 458.0
    baseline: float = 0.11  # [m] EuRoC-ish
    # trajectory amplitudes
    pos_amp: tuple = (2.0, 1.5, 0.6)
    pos_freq: tuple = (0.11, 0.17, 0.23)  # [Hz]
    yaw_amp: float = 0.9
    yaw_freq: float = 0.07
    rp_amp: float = 0.12  # roll/pitch amplitude [rad]
    rp_freq: tuple = (0.31, 0.27)
    imu_noise: bool = False  # add sensor noise to IMU samples
    gyro_bias: tuple = (0.0, 0.0, 0.0)
    accel_bias: tuple = (0.0, 0.0, 0.0)


def _pose_fn(cfg: SyntheticConfig):
    """t -> (q_wb, p_w) analytic pose (body == left camera, RDF axes).

    The body flies a Lissajous path while yawing; camera z (forward) sweeps
    the room so walls stay in view.
    """
    ax = jnp.asarray(cfg.pos_amp)
    fx_ = jnp.asarray(cfg.pos_freq)
    two_pi = 2.0 * jnp.pi

    def pose(t):
        p = ax * jnp.sin(two_pi * fx_ * t + jnp.asarray([0.0, 1.3, 2.1]))
        yaw = cfg.yaw_amp * jnp.sin(two_pi * cfg.yaw_freq * t)
        roll = cfg.rp_amp * jnp.sin(two_pi * cfg.rp_freq[0] * t + 0.5)
        pitch = cfg.rp_amp * jnp.sin(two_pi * cfg.rp_freq[1] * t + 1.1)
        # camera RDF: x right, y down, z forward. Compose: yaw about world z
        # (camera y is ~down, so yaw = rotation about -y_cam), then small
        # roll/pitch about camera z/x.
        q_yaw = quat.from_axis_angle(jnp.asarray([0.0, -1.0, 0.0]) * yaw)
        q_pitch = quat.from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]) * pitch)
        q_roll = quat.from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]) * roll)
        # base attitude: camera forward (+z_cam) along world +x, camera down
        # (+y_cam) along world -z  => R_wb columns = [y_w, -z_w, x_w]
        R0 = jnp.asarray(
            [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32
        )
        q0 = quat.from_matrix(R0)
        q = quat.mul(q0, quat.mul(q_yaw, quat.mul(q_pitch, q_roll)))
        return quat.normalize(q), p

    return pose


class SyntheticWorld:
    """Generates ground truth, IMU streams, and rendered stereo frames."""

    def __init__(self, cfg: SyntheticConfig = SyntheticConfig()):
        self.cfg = cfg
        self.cam = Camera.create(
            cfg.fx, cfg.fy, cfg.width / 2.0, cfg.height / 2.0, cfg.baseline,
            cfg.width, cfg.height,
        )
        rng = np.random.default_rng(cfg.seed)
        self.landmarks = self._make_landmarks(rng)  # (L, 3) world
        # per-landmark appearance
        L = self.landmarks.shape[0]
        self.lm_quad = rng.uniform(0.0, 1.0, size=(L, 2, 2)).astype(np.float32)
        # force contrast: one diagonal bright, other dark
        self.lm_quad[:, 0, 0] = rng.uniform(0.75, 1.0, L)
        self.lm_quad[:, 1, 1] = rng.uniform(0.75, 1.0, L)
        self.lm_quad[:, 0, 1] = rng.uniform(0.0, 0.25, L)
        self.lm_quad[:, 1, 0] = rng.uniform(0.0, 0.25, L)
        self.lm_size = rng.uniform(0.10, 0.22, L).astype(np.float32)  # [m]
        self.pose = _pose_fn(cfg)
        self._pose_jit = jax.jit(self.pose)

        # analytic derivatives for IMU
        def p_of_t(t):
            return self.pose(t)[1]

        def q_of_t(t):
            return self.pose(t)[0]

        self._vel = jax.jit(jax.jacfwd(p_of_t))
        self._acc = jax.jit(jax.jacfwd(jax.jacfwd(p_of_t)))
        self._qdot = jax.jit(jax.jacfwd(q_of_t))
        self._rng = rng

    # ---------------- ground truth ----------------
    def _make_landmarks(self, rng):
        hx, hy, hz = self.cfg.room_half
        n = self.cfg.n_landmarks
        pts = []
        per_face = n // 6
        for axis, sign in [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]:
            m = per_face if axis < 2 else (n - 4 * per_face) // 2
            p = rng.uniform(-1, 1, size=(m, 3)) * np.array([hx, hy, hz])
            p[:, axis] = sign * [hx, hy, hz][axis]
            pts.append(p)
        return np.concatenate(pts).astype(np.float32)

    def gt_pose(self, t: float):
        q, p = self._pose_jit(jnp.float32(t))
        return np.asarray(q), np.asarray(p)

    def frame_times(self):
        n = int(self.cfg.duration * self.cfg.cam_hz)
        return np.arange(n) / self.cfg.cam_hz

    def imu_times(self):
        n = int(self.cfg.duration * self.cfg.imu_hz)
        return np.arange(n) / self.cfg.imu_hz

    def imu_sample(self, t: float):
        """Exact body-frame gyro/accel at time t (plus optional bias/noise)."""
        q = self._pose_jit(jnp.float32(t))[0]
        a_w = self._acc(jnp.float32(t))
        qd = self._qdot(jnp.float32(t))
        # omega_body: q_dot = 0.5 * q ⊗ (0, omega_b)
        om = 2.0 * quat.mul(quat.conj(q), qd)
        gyro = np.asarray(om)[1:4]
        acc_b = np.asarray(quat.rotate(quat.conj(q), a_w - jnp.asarray(GRAVITY)))
        gyro = gyro + np.asarray(self.cfg.gyro_bias, np.float32)
        acc_b = acc_b + np.asarray(self.cfg.accel_bias, np.float32)
        if self.cfg.imu_noise:
            sr = np.sqrt(self.cfg.imu_hz)
            gyro = gyro + self._rng.normal(0, 1.7e-4 * sr, 3)
            acc_b = acc_b + self._rng.normal(0, 2.0e-3 * sr, 3)
        return gyro.astype(np.float32), acc_b.astype(np.float32)

    def imu_window(self, t0: float, t1: float):
        """All IMU samples in [t0, t1): (gyro (K,3), acc (K,3), dts (K,))."""
        ts = self.imu_times()
        sel = ts[(ts >= t0) & (ts < t1)]
        if len(sel) == 0:
            z = np.zeros((0, 3), np.float32)
            return z, z, np.zeros((0,), np.float32)
        g, a = zip(*(self.imu_sample(t) for t in sel))
        dt = 1.0 / self.cfg.imu_hz
        return np.stack(g), np.stack(a), np.full(len(sel), dt, np.float32)

    # ---------------- rendering ----------------
    def render_frame(self, t: float):
        """Render the stereo pair at time t -> (left, right) (H, W) f32."""
        q, p = self.gt_pose(t)
        left = self._render_cam(q, p)
        # right camera: offset along camera x
        p_r = p + np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray([self.cfg.baseline, 0.0, 0.0])))
        right = self._render_cam(q, p_r)
        return left, right

    def _render_cam(self, q_wb, p_w):
        cfg = self.cfg
        h, w = cfg.height, cfg.width
        # camera-frame landmark coords
        qc = quat.conj(jnp.asarray(q_wb))
        xc = np.asarray(quat.rotate(qc[None], jnp.asarray(self.landmarks - p_w[None])))
        z = xc[:, 2]
        uv = np.stack(
            [
                cfg.fx * xc[:, 0] / np.maximum(z, 1e-6) + w / 2.0,
                cfg.fy * xc[:, 1] / np.maximum(z, 1e-6) + h / 2.0,
            ],
            -1,
        )
        vis = (z > 0.25) & (uv[:, 0] > -20) & (uv[:, 0] < w + 20) & (uv[:, 1] > -20) & (uv[:, 1] < h + 20)

        # background: low-contrast static gradient + per-pixel hash noise
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = 0.45 + 0.05 * np.sin(xx * 0.011) * np.cos(yy * 0.013)

        idx = np.where(vis)[0]
        # painter's order: far first so near landmarks overwrite
        idx = idx[np.argsort(-z[idx])]
        for i in idx:
            s_px = cfg.fx * self.lm_size[i] / z[i]
            s_px = float(np.clip(s_px, 5.0, 40.0))
            half = int(np.ceil(s_px / 2))
            cu, cv = uv[i]
            u0, v0 = int(np.floor(cu)) - half, int(np.floor(cv)) - half
            u1, v1 = u0 + 2 * half + 1, v0 + 2 * half + 1
            uu0, vv0 = max(u0, 0), max(v0, 0)
            uu1, vv1 = min(u1, w), min(v1, h)
            if uu1 <= uu0 or vv1 <= vv0:
                continue
            # 2x2 checker quadrants around the exact (sub-pixel) center
            px = np.arange(uu0, uu1, dtype=np.float32) - cu
            py = np.arange(vv0, vv1, dtype=np.float32) - cv
            PX, PY = np.meshgrid(px, py)
            inside = (np.abs(PX) <= s_px / 2) & (np.abs(PY) <= s_px / 2)
            qu = (PX >= 0).astype(np.int32)
            qv = (PY >= 0).astype(np.int32)
            vals = self.lm_quad[i][qv, qu]
            region = img[vv0:vv1, uu0:uu1]
            img[vv0:vv1, uu0:uu1] = np.where(inside, vals, region)
        # 8-bit intensity convention (matches EuRoC PNGs; FAST thresholds
        # are calibrated for 0..255)
        return (img * 255.0).astype(np.float32)

    def gt_trajectory(self):
        """(T, 3) positions + (T, 4) quats at frame times."""
        ts = self.frame_times()
        qs, ps = [], []
        for t in ts:
            q, p = self.gt_pose(t)
            qs.append(q)
            ps.append(p)
        return np.stack(ps), np.stack(qs)
