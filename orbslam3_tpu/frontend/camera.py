"""Pinhole stereo camera model + body-camera extrinsics.

Reference parity: src/tracking/frame/camera.rs (intrinsics) and
src/geometry/frames.rs:159-312 (FrameConverter holding the calibrated
T_body_cam). States throughout the pipeline are BODY (IMU) poses; every
projection composes the body pose with T_BC here. `q_bc is None` is the
calibrated-identity fast path (body == camera, e.g. the default synthetic
world) and compiles to the exact pre-extrinsics program.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Camera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    bf: jnp.ndarray  # baseline * fx  [px * m]
    width: int = 752
    height: int = 480
    # T_BC: camera pose in the body frame (X_body = R(q_bc) X_cam + p_bc).
    # None => identity (pytree-static, so the identity case costs nothing).
    q_bc: Optional[jnp.ndarray] = None  # (4,) wxyz
    p_bc: Optional[jnp.ndarray] = None  # (3,)

    @staticmethod
    def create(fx, fy, cx, cy, baseline, width=752, height=480,
               q_bc=None, p_bc=None) -> "Camera":
        f = jnp.float32
        if p_bc is not None and q_bc is None:
            # pure-translation extrinsic (lever arm, identity rotation) —
            # must not be silently dropped by the q_bc gates below
            q_bc = (1.0, 0.0, 0.0, 0.0)
        if q_bc is not None:
            q_bc = jnp.asarray(q_bc, jnp.float32)
            p_bc = jnp.zeros(3, jnp.float32) if p_bc is None else jnp.asarray(p_bc, jnp.float32)
        return Camera(f(fx), f(fy), f(cx), f(cy), f(baseline * fx), width, height,
                      q_bc, p_bc)

    # ---- extrinsics -------------------------------------------------
    def body_to_cam_pose(self, q_wb, p_wb):
        """World camera pose (q_wc, p_wc) for a world body pose. Broadcasts
        over leading dims."""
        if self.q_bc is None:
            return q_wb, p_wb
        from orbslam3_tpu.geometry import quat

        q_wc = quat.normalize(quat.mul(q_wb, self.q_bc))
        p_wc = p_wb + quat.rotate(q_wb, jnp.broadcast_to(self.p_bc, p_wb.shape))
        return q_wc, p_wc

    def cam_pts_to_body(self, xc):
        """Camera-frame points (..., 3) -> body-frame points."""
        if self.q_bc is None:
            return xc
        from orbslam3_tpu.geometry import quat

        return quat.rotate(jnp.broadcast_to(self.q_bc, xc.shape[:-1] + (4,)), xc) + self.p_bc

    def project_body(self, xb):
        """Body-frame points (..., 3) -> (pixels (..., 2), cam depth (...,))."""
        if self.q_bc is None:
            xc = xb
        else:
            from orbslam3_tpu.geometry import quat

            xc = quat.rotate(
                jnp.broadcast_to(quat.conj(self.q_bc), xb.shape[:-1] + (4,)),
                xb - self.p_bc,
            )
        return self.project(xc), xc[..., 2]

    @property
    def baseline(self):
        return self.bf / self.fx

    def project(self, xc):
        """Camera-frame points (..., 3) -> pixel (..., 2); no validity check."""
        z = xc[..., 2]
        z_safe = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
        u = self.fx * xc[..., 0] / z_safe + self.cx
        v = self.fy * xc[..., 1] / z_safe + self.cy
        return jnp.stack([u, v], axis=-1)

    def unproject(self, uv, z):
        """Pixels (..., 2) + depth (...,) -> camera-frame points (..., 3)."""
        x = (uv[..., 0] - self.cx) / self.fx * z
        y = (uv[..., 1] - self.cy) / self.fy * z
        return jnp.stack([x, y, z], axis=-1)

    def in_view(self, uv, margin=0.0):
        u, v = uv[..., 0], uv[..., 1]
        return (
            (u >= margin)
            & (u < self.width - margin)
            & (v >= margin)
            & (v < self.height - margin)
        )
