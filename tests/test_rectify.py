"""Rectification tests: identity behavior, distortion removal end-to-end."""
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.io.rectify import (
    _distort_radtan,
    remap_bilinear,
    stereo_rectify_maps,
)

W, H = 384, 256
K = np.array([[240.0, 0, W / 2], [0, 240.0, H / 2], [0, 0, 1.0]])


def make_pair(dist0, dist1, T1_offset=np.array([0.11, 0.0, 0.0])):
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[:3, 3] = T1_offset
    return stereo_rectify_maps(K, dist0, T0, K, dist1, T1, (W, H))


class TestRectify:
    def test_identity_when_undistorted_and_aligned(self):
        m = make_pair(np.zeros(4), np.zeros(4))
        us, vs = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
        # pure horizontal-baseline aligned pair: maps ~ identity
        np.testing.assert_allclose(m.map_x0, us, atol=0.6)
        np.testing.assert_allclose(m.map_y0, vs, atol=0.6)
        assert abs(m.baseline - 0.11) < 1e-6

    def test_distortion_removed(self):
        """Render a scene with radtan distortion; rectified image must match
        the ideal pinhole render of the same scene."""
        rng = np.random.default_rng(3)
        d = np.array([-0.28, 0.07, 0.0002, 0.00002])

        # scene: grid of bright dots at known 3D positions
        pts = np.stack(
            [rng.uniform(-2, 2, 60), rng.uniform(-1.3, 1.3, 60), np.full(60, 5.0)], -1
        )

        def render(distort):
            img = np.zeros((H, W), np.float32)
            for X in pts:
                xn, yn = X[0] / X[2], X[1] / X[2]
                if distort:
                    xn, yn = _distort_radtan(xn, yn, d)
                u, v = K[0, 0] * xn + K[0, 2], K[1, 1] * yn + K[1, 2]
                ui, vi = int(round(u)), int(round(v))
                if 2 <= ui < W - 2 and 2 <= vi < H - 2:
                    img[vi - 1 : vi + 2, ui - 1 : ui + 2] = 255.0
            return img

        distorted = render(True)
        m = make_pair(d, d)
        # note K_new focal == K focal here, so ideal pinhole render at K_new
        # equals render(False) up to the principal-point shift (zero here)
        rect = np.asarray(remap_bilinear(jnp.asarray(distorted), jnp.asarray(m.map_x0), jnp.asarray(m.map_y0)))
        ideal = render(False)

        # compare dot centroids
        def centroids(img):
            ys, xs = np.nonzero(img > 100)
            # cluster by rounding to 6px grid
            out = {}
            for y, x in zip(ys, xs):
                key = (y // 6, x // 6)
                out.setdefault(key, []).append((y, x))
            return [np.mean(v, axis=0) for v in out.values() if len(v) >= 4]

        ci = np.array(centroids(ideal))
        cr = np.array(centroids(rect))
        assert len(cr) >= 0.8 * len(ci)
        # each rectified dot within ~1px of an ideal dot
        d2 = np.linalg.norm(ci[:, None] - cr[None], axis=-1)
        assert np.median(d2.min(axis=0)) < 1.0
