"""Deterministic synthetic stereo-inertial world with exact ground truth.

Design:
  * Trajectory: smooth sum-of-sinusoids SE(3) path inside a box room;
    position derivatives are closed-form, body rates come from a central
    difference of the analytic quaternion (1e-4 s step — exact to ~1e-8),
    so IMU samples are golden data for preintegration and the pipeline.
  * Landmarks: random points on the room's walls. Each renders as a
    2x2-checker "fiducial" patch (strong FAST corner + saddle point at its
    center, per-landmark random quadrant pattern for descriptor
    distinctiveness), splatted far-to-near (painter's order).
  * Stereo: left camera = body frame; right camera offset by the baseline
    along +x (camera RDF convention: x right, y down, z forward).

Everything here is HOST-SIDE numpy on purpose: this module is dataset
generation (the analog of reading EuRoC PNGs off disk — io/euroc.rs), and
must not dispatch device ops (under the TPU tunnel a single tiny op costs
network latency).

This replaces the reference's reliance on on-disk EuRoC sequences for
testing; the same front-end/back-end code paths run on either source.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from orbslam3_tpu.frontend.camera import Camera

GRAVITY_NP = np.array([0.0, 0.0, -9.81], dtype=np.float32)


_POOL_WORLD = None


def _pool_init(world):
    """Worker initializer: ship the world ONCE per process, not per task
    (it carries the landmark table + pixel-ray cache, ~5 MB)."""
    global _POOL_WORLD
    _POOL_WORLD = world


def _render_one(t):
    return _POOL_WORLD.render_frame(t)


# ------------------------- host-side quaternion helpers (wxyz) -----------
def _qmul(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def _qconj(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def _qrot(q, v):
    qv = q[1:]
    t = 2.0 * np.cross(qv, v)
    return v + q[0] * t + np.cross(qv, t)


def _qexp(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.array([1.0, 0.5 * w[0], 0.5 * w[1], 0.5 * w[2]])
    return np.concatenate([[np.cos(th / 2)], np.sin(th / 2) * w / th])


def _qnorm(q):
    return q / max(np.linalg.norm(q), 1e-12)


def _qmat(q):
    from orbslam3_tpu.geometry.quat import to_matrix_np

    return to_matrix_np(q)


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
    # linear yaw drift [rad/s]: 2*pi/duration pans a full turn and returns
    # to the starting view — the revisit scenario loop closing needs
    # (sinusoidal-only trajectories keep old keyframes covisible forever,
    # so no loop candidate ever passes the connected-exclusion gate)
    yaw_rate: float = 0.0
    rp_amp: float = 0.12  # roll/pitch amplitude [rad]
    rp_freq: tuple = (0.31, 0.27)
    imu_noise: bool = False  # add sensor noise to IMU samples
    gyro_bias: tuple = (0.0, 0.0, 0.0)
    accel_bias: tuple = (0.0, 0.0, 0.0)
    # mid-run bias step (temperature-drift style): from bias_step_t on, the
    # step values add to the static biases. Paired with a camera blackout
    # this forces genuine dead-reckoning drift — the estimator's bias
    # estimate goes stale exactly when vision can't correct it — which is
    # the scenario loop closing exists to repair.
    bias_step_t: float = -1.0  # [s]; < 0 disables
    gyro_bias_step: tuple = (0.0, 0.0, 0.0)
    accel_bias_step: tuple = (0.0, 0.0, 0.0)
    # T_BC: camera pose in the body (IMU) frame, wxyz quaternion + offset.
    # Identity = body == left camera (the pre-extrinsics setup). Set to a
    # EuRoC-like transform (euroc_t_bc()) to exercise the full extrinsics
    # path: IMU samples stay body-frame, cameras render at T_wb ∘ T_BC.
    q_bc: tuple = (1.0, 0.0, 0.0, 0.0)
    p_bc: tuple = (0.0, 0.0, 0.0)
    # ---- adversarial rendering (VERDICT r3 missing #1: the fiducial world
    # purpose-builds every landmark as a strong DISTINCTIVE ORB feature;
    # real frames have repetitive texture, blur, exposure drift, and
    # descriptor aliasing). texture="textured" replaces the fiducial
    # splats with a ray-traced box room whose walls carry world-anchored
    # procedural texture: multi-octave shading, a 0.5 m checker tile
    # grid, and two sharp speckle scales that REPEAT with a 2.4 m period
    # — any 2.4 m-shifted patch is pixel-identical, so descriptors alias
    # across the room the way repeated office/warehouse structure does.
    # Ground truth stays analytic (the trajectory; landmarks are not GT).
    texture: str = "fiducial"  # "fiducial" | "textured"
    # photometric stress (applied in render_frame, either texture mode):
    exposure_drift: float = 0.0  # gain = 2^(drift*sin(2pi*0.07 t)); 0 off
    image_noise_std: float = 0.0  # Gaussian sigma on the 0..255 scale
    salt_pepper_frac: float = 0.0  # fraction of pixels forced to 0/255
    # motion blur: average n samples over the exposure window (s). At
    # fx=458 and 0.4 rad/s pan, 20 ms exposure smears ~3.7 px.
    motion_blur_samples: int = 1
    exposure_time: float = 0.0


def euroc_t_bc():
    """EuRoC MH cam0 T_BS (body-from-cam) as (q_bc wxyz, p_bc) — the real
    sensor.yaml values (reference: euroc.rs:314-359 loads this matrix; its
    rotation is ~90°+ — the case VERDICT flagged as untested)."""
    T = np.array(
        [
            [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
            [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
            [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    from orbslam3_tpu.geometry.quat import from_matrix_np

    return tuple(from_matrix_np(T[:3, :3])), tuple(T[:3, 3])


class SyntheticWorld:
    """Generates ground truth, IMU streams, and rendered stereo frames."""

    def __init__(self, cfg: SyntheticConfig = SyntheticConfig()):
        self.cfg = cfg
        self._q_bc = _qnorm(np.asarray(cfg.q_bc, np.float64))
        self._p_bc = np.asarray(cfg.p_bc, np.float64)
        self._has_tbc = not (
            np.allclose(self._q_bc, [1.0, 0, 0, 0]) and np.allclose(self._p_bc, 0.0)
        )
        self.cam = Camera.create(
            cfg.fx, cfg.fy, cfg.width / 2.0, cfg.height / 2.0, cfg.baseline,
            cfg.width, cfg.height,
            q_bc=self._q_bc.astype(np.float32) if self._has_tbc else None,
            p_bc=self._p_bc.astype(np.float32) if self._has_tbc else None,
        )
        rng = np.random.default_rng(cfg.seed)
        self.landmarks = self._make_landmarks(rng)  # (L, 3) world
        L = self.landmarks.shape[0]
        self.lm_quad = rng.uniform(0.0, 1.0, size=(L, 2, 2)).astype(np.float32)
        self.lm_quad[:, 0, 0] = rng.uniform(0.75, 1.0, L)
        self.lm_quad[:, 1, 1] = rng.uniform(0.75, 1.0, L)
        self.lm_quad[:, 0, 1] = rng.uniform(0.0, 0.25, L)
        self.lm_quad[:, 1, 0] = rng.uniform(0.0, 0.25, L)
        self.lm_size = rng.uniform(0.10, 0.22, L).astype(np.float32)  # [m]
        self._rng = rng

        # base attitude: camera forward (+z_cam) along world +x, camera down
        # (+y_cam) along world -z  => R_wb columns = [y_w, -z_w, x_w]
        R0 = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
        # quaternion from matrix (trace method fine for this fixed matrix)
        w = np.sqrt(max(1.0 + np.trace(R0), 0.0)) / 2.0
        self._q0 = _qnorm(
            np.array(
                [
                    w,
                    (R0[2, 1] - R0[1, 2]) / (4 * w),
                    (R0[0, 2] - R0[2, 0]) / (4 * w),
                    (R0[1, 0] - R0[0, 1]) / (4 * w),
                ]
            )
        )

    # ---------------- analytic pose + derivatives ----------------
    def _pos(self, t):
        A = np.asarray(self.cfg.pos_amp)
        f = np.asarray(self.cfg.pos_freq)
        ph = np.array([0.0, 1.3, 2.1])
        return A * np.sin(2 * np.pi * f * t + ph)

    def _vel_analytic(self, t):
        A = np.asarray(self.cfg.pos_amp)
        f = np.asarray(self.cfg.pos_freq)
        ph = np.array([0.0, 1.3, 2.1])
        return A * 2 * np.pi * f * np.cos(2 * np.pi * f * t + ph)

    def _acc_analytic(self, t):
        A = np.asarray(self.cfg.pos_amp)
        f = np.asarray(self.cfg.pos_freq)
        ph = np.array([0.0, 1.3, 2.1])
        return -A * (2 * np.pi * f) ** 2 * np.sin(2 * np.pi * f * t + ph)

    def _quat(self, t):
        cfg = self.cfg
        yaw = cfg.yaw_amp * np.sin(2 * np.pi * cfg.yaw_freq * t) + cfg.yaw_rate * t
        roll = cfg.rp_amp * np.sin(2 * np.pi * cfg.rp_freq[0] * t + 0.5)
        pitch = cfg.rp_amp * np.sin(2 * np.pi * cfg.rp_freq[1] * t + 1.1)
        q_yaw = _qexp(np.array([0.0, -1.0, 0.0]) * yaw)
        q_pitch = _qexp(np.array([1.0, 0.0, 0.0]) * pitch)
        q_roll = _qexp(np.array([0.0, 0.0, 1.0]) * roll)
        return _qnorm(_qmul(self._q0, _qmul(q_yaw, _qmul(q_pitch, q_roll))))

    def gt_pose(self, t: float):
        return self._quat(t).astype(np.float32), self._pos(t).astype(np.float32)

    def gt_velocity(self, t: float):
        return self._vel_analytic(t).astype(np.float32)

    def frame_times(self):
        n = int(self.cfg.duration * self.cfg.cam_hz)
        return np.arange(n) / self.cfg.cam_hz

    def imu_times(self):
        n = int(self.cfg.duration * self.cfg.imu_hz)
        return np.arange(n) / self.cfg.imu_hz

    def imu_sample(self, t: float):
        """Exact body-frame gyro/accel at time t (plus optional bias/noise)."""
        h = 1e-4
        q = self._quat(t)
        q_m = self._quat(t - h)
        q_p = self._quat(t + h)
        qdot = (q_p - q_m) / (2 * h)
        om = 2.0 * _qmul(_qconj(q), qdot)
        gyro = om[1:4]
        a_w = self._acc_analytic(t)
        acc_b = _qrot(_qconj(q), a_w - GRAVITY_NP)
        gyro = gyro + np.asarray(self.cfg.gyro_bias)
        acc_b = acc_b + np.asarray(self.cfg.accel_bias)
        if 0.0 <= self.cfg.bias_step_t <= t:
            gyro = gyro + np.asarray(self.cfg.gyro_bias_step)
            acc_b = acc_b + np.asarray(self.cfg.accel_bias_step)
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

    # ---------------- world geometry ----------------
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

    # ---------------- rendering ----------------
    def _cam_poses(self, t: float):
        """Left/right camera poses at time t (T_wb ∘ T_BC, then baseline)."""
        q, p = self.gt_pose(t)
        qc = _qnorm(_qmul(q.astype(np.float64), self._q_bc))
        pc = p.astype(np.float64) + _qrot(q.astype(np.float64), self._p_bc)
        p_r = pc + _qrot(qc, np.array([self.cfg.baseline, 0.0, 0.0]))
        return (qc.astype(np.float32), pc.astype(np.float32),
                p_r.astype(np.float32))

    def render_frame(self, t: float):
        """Render the stereo pair at time t -> (left, right) (H, W) f32.

        Cameras sit at T_wb ∘ T_BC (left) and a baseline offset along the
        camera x-axis (right); gt_pose/imu_sample stay body-frame. In
        "textured" mode (or with exposure/noise/blur enabled) the frames
        additionally pass the photometric-stress pipeline."""
        cfg = self.cfg
        render = (self._render_cam_textured if cfg.texture == "textured"
                  else self._render_cam)
        ns = max(int(cfg.motion_blur_samples), 1)
        if ns > 1 and cfg.exposure_time > 0:
            offs = (np.arange(ns) / (ns - 1) - 0.5) * cfg.exposure_time
        else:
            offs = np.zeros(1)
            ns = 1
        left = right = None
        for dt_ in offs:
            qc, pc, p_r = self._cam_poses(max(t + float(dt_), 0.0))
            li = render(qc, pc)
            ri = render(qc, p_r)
            left = li if left is None else left + li
            right = ri if right is None else right + ri
        left, right = left / ns, right / ns
        return self._photometric(left, t, 0), self._photometric(right, t, 1)

    def _photometric(self, img, t: float, side: int):
        """Exposure drift + Gaussian + salt/pepper noise, deterministic per
        (seed, frame time, camera side) so re-renders are bit-identical."""
        cfg = self.cfg
        if cfg.exposure_drift > 0.0:
            gain = 2.0 ** (
                cfg.exposure_drift * np.sin(2 * np.pi * 0.07 * t + 0.9)
            )
            img = img * gain
        if cfg.image_noise_std > 0.0 or cfg.salt_pepper_frac > 0.0:
            rng = np.random.default_rng(
                (cfg.seed * 1000003 + int(round(t * 1e4)) * 2 + side)
                & 0x7FFFFFFF
            )
            if cfg.image_noise_std > 0.0:
                img = img + rng.normal(0.0, cfg.image_noise_std, img.shape)
            if cfg.salt_pepper_frac > 0.0:
                u = rng.uniform(0.0, 1.0, img.shape)
                f = cfg.salt_pepper_frac
                img = np.where(u < 0.5 * f, 0.0, img)
                img = np.where(u > 1.0 - 0.5 * f, 255.0, img)
        return np.clip(img, 0.0, 255.0).astype(np.float32)

    # ---------------- textured ray-box renderer ----------------
    def _pixel_dirs(self):
        """(H, W, 3) camera-frame ray directions (cached; pinhole)."""
        if getattr(self, "_dirs_cam", None) is None:
            cfg = self.cfg
            h, w = cfg.height, cfg.width
            yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
            self._dirs_cam = np.stack(
                [
                    (xx - w / 2.0) / cfg.fx,
                    (yy - h / 2.0) / cfg.fy,
                    np.ones_like(xx),
                ],
                -1,
            )
        return self._dirs_cam

    @staticmethod
    def _hash01(face, iu, iv, salt):
        """Deterministic integer-lattice hash -> [0, 1). World-anchored so
        texture is viewpoint-consistent (descriptors stable across views)."""
        h = (
            iu.astype(np.int64) * 73856093
            ^ iv.astype(np.int64) * 19349663
            ^ np.int64((face + salt) * 83492791)
        )
        h = (h ^ (h >> 13)) * 1274126177
        h = h ^ (h >> 16)
        return (h & 0xFFFF).astype(np.float32) / 65535.0

    # speckle repeats with this period [m]: shifted patches are pixel-
    # identical, so descriptors alias across the room (repeated structure)
    _TEX_PERIOD = 2.4

    def _face_tex(self, face: int, u, v):
        """Procedural wall texture at face-plane coords (u, v) meters."""
        per = self._TEX_PERIOD
        val = 0.42 + 0.10 * np.sin(u * 2.1 + face) * np.sin(v * 1.7 + 2.0 * face)
        tile = (
            (np.floor(u / 0.5).astype(np.int64)
             + np.floor(v / 0.5).astype(np.int64)) & 1
        ).astype(np.float32)
        val = val + 0.10 * (tile - 0.5)
        # two sharp speckle scales (FAST corners at multiple pyramid
        # levels), both periodic in `per` — the aliasing stressor
        iu5 = np.floor((u % per) / 0.05).astype(np.int64)
        iv5 = np.floor((v % per) / 0.05).astype(np.int64)
        val = val + 0.30 * (self._hash01(face, iu5, iv5, 11) - 0.5)
        iu15 = np.floor((u % per) / 0.15).astype(np.int64)
        iv15 = np.floor((v % per) / 0.15).astype(np.int64)
        val = val + 0.18 * (self._hash01(face, iu15, iv15, 23) - 0.5)
        return np.clip(val, 0.02, 0.98)

    def _render_cam_textured(self, q_wc, p_w):
        """Ray-trace the textured box room from a camera pose: for each
        pixel, intersect the ray with the 6 wall planes, take the nearest
        forward hit inside the face bounds, and sample the procedural
        texture at the world-anchored hit coordinates."""
        cfg = self.cfg
        half = np.asarray(cfg.room_half, np.float32)
        R = _qmat(q_wc.astype(np.float64)).astype(np.float32)
        dirs = self._pixel_dirs() @ R.T  # (H, W, 3) world-frame rays
        p = p_w.astype(np.float32)

        best_s = np.full(dirs.shape[:2], np.inf, np.float32)
        best_face = np.zeros(dirs.shape[:2], np.int8)
        eps = 1e-6
        for face, (axis, sign) in enumerate(
            [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]
        ):
            da = dirs[..., axis]
            s = (sign * half[axis] - p[axis]) / np.where(
                np.abs(da) < eps, eps, da
            )
            o1, o2 = [a for a in range(3) if a != axis]
            h1 = p[o1] + s * dirs[..., o1]
            h2 = p[o2] + s * dirs[..., o2]
            ok = (
                (s > eps)
                & (np.abs(h1) <= half[o1] + 1e-3)
                & (np.abs(h2) <= half[o2] + 1e-3)
                & (s < best_s)
            )
            best_s = np.where(ok, s, best_s)
            best_face = np.where(ok, np.int8(face), best_face)

        img = np.full(dirs.shape[:2], 0.45, np.float32)
        for face, (axis, sign) in enumerate(
            [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]
        ):
            m = best_face == face
            if not m.any():
                continue
            o1, o2 = [a for a in range(3) if a != axis]
            s = best_s[m]
            u = p[o1] + s * dirs[..., o1][m]
            v = p[o2] + s * dirs[..., o2][m]
            img[m] = self._face_tex(face, u, v)
        return img * 255.0

    def _render_cam(self, q_wb, p_w):
        cfg = self.cfg
        h, w = cfg.height, cfg.width
        R = _qmat(q_wb.astype(np.float64))
        xc = (self.landmarks - p_w) @ R  # = R^T (x - p) rowwise
        z = xc[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            uv = np.stack(
                [
                    cfg.fx * xc[:, 0] / np.maximum(z, 1e-6) + w / 2.0,
                    cfg.fy * xc[:, 1] / np.maximum(z, 1e-6) + h / 2.0,
                ],
                -1,
            )
        vis = (
            (z > 0.25)
            & (uv[:, 0] > -20)
            & (uv[:, 0] < w + 20)
            & (uv[:, 1] > -20)
            & (uv[:, 1] < h + 20)
        )

        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = 0.45 + 0.05 * np.sin(xx * 0.011) * np.cos(yy * 0.013)

        idx = np.where(vis)[0]
        idx = idx[np.argsort(-z[idx])]  # painter's order: far first
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

    def render_sequence(self, times, blackout=None, workers: int = 0):
        """Render many frames, fanning out over worker processes (the
        textured ray tracer costs ~0.1 s per camera render; a 180 s soak
        sequence is 3600 frames — serial rendering would dominate wall
        time). Returns [(left_u8, right_u8)] in `times` order.

        blackout: optional (t0, t1) — frames in the window render flat
        gray (sensor dropout)."""
        import os
        from concurrent.futures import ProcessPoolExecutor

        blank = np.full((self.cfg.height, self.cfg.width), 127, np.uint8)

        def is_blank(t):
            return blackout is not None and blackout[0] <= t < blackout[1]

        live = [t for t in times if not is_blank(t)]
        if workers <= 0:
            workers = max((os.cpu_count() or 2) - 1, 1)
        if workers == 1 or len(live) < 8:
            rendered = {t: self.render_frame(t) for t in live}
        else:
            with ProcessPoolExecutor(
                workers, initializer=_pool_init, initargs=(self,)
            ) as ex:
                out = ex.map(_render_one, live,
                             chunksize=max(len(live) // (workers * 8), 1))
                rendered = dict(zip(live, out))
        frames = []
        for t in times:
            if is_blank(t):
                frames.append((blank, blank))
            else:
                l, r = rendered[t]
                frames.append((l.astype(np.uint8), r.astype(np.uint8)))
        return frames

    def gt_trajectory(self):
        """(T, 3) positions + (T, 4) quats at frame times."""
        ts = self.frame_times()
        qs, ps = [], []
        for t in ts:
            q, p = self.gt_pose(t)
            qs.append(q)
            ps.append(p)
        return np.stack(ps), np.stack(qs)
