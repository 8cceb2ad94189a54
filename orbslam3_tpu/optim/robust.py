"""Robust weighting + chi2 gates shared by the solvers."""
from __future__ import annotations

import jax.numpy as jnp

# chi2 95% quantiles (reference uses the same: local_ba_lm.rs:115 etc.)
CHI2_MONO = 5.991  # 2 dof
CHI2_STEREO = 7.815  # 3 dof


def huber_weight(chi2, delta2):
    """Huber IRLS weight for squared error chi2 with squared threshold delta2."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


def octave_sigma2_inv(octave, scale=1.2):
    """Per-observation information scale: 1 / scale^(2*octave)."""
    return 1.0 / (scale ** (2.0 * octave.astype(jnp.float32)))
