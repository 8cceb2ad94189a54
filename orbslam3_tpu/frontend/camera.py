"""Pinhole stereo camera model (reference: src/tracking/frame/camera.rs)."""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    bf: jnp.ndarray  # baseline * fx  [px * m]
    width: int = 752
    height: int = 480

    @staticmethod
    def create(fx, fy, cx, cy, baseline, width=752, height=480) -> "Camera":
        f = jnp.float32
        return Camera(f(fx), f(fy), f(cx), f(cy), f(baseline * fx), width, height)

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
