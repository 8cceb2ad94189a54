"""Pallas FAST+NMS kernel: exact equivalence with the XLA path (TPU only —
Mosaic kernels do not compile on the CPU backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu",), reason="Pallas TPU kernel needs a TPU"
)


def test_pallas_matches_xla():
    from orbslam3_tpu.ops import fast as F
    from orbslam3_tpu.ops.fast_pallas import fast_nms_pallas

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (480, 752)).astype(np.float32))
    ref = F.nms3x3(
        jnp.maximum(F.fast_score(img, 20.0), F.fast_score(img, 7.0) * 1e-3)
    )
    out = fast_nms_pallas(img, 20.0, 7.0)
    np.testing.assert_array_equal(
        np.asarray(ref)[8:-8, 8:-8], np.asarray(out)[8:-8, 8:-8]
    )
