"""ATE / RPE trajectory metrics with Umeyama alignment (host-side numpy).

Standard formulation (Sturm et al., TUM RGB-D benchmark): align estimate to
ground truth with the closed-form similarity/rigid transform, report RMSE of
translational residuals.
"""
from __future__ import annotations

import numpy as np


def umeyama_align(est: np.ndarray, gt: np.ndarray, with_scale: bool = False):
    """Least-squares rigid (or similarity) alignment est -> gt.

    Args:
      est, gt: (T, 3) trajectories
    Returns:
      (R (3,3), t (3,), s) minimizing ||gt - (s R est + t)||^2
    """
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    xe = est - mu_e
    xg = gt - mu_g
    cov = xg.T @ xe / len(est)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_e = (xe**2).sum() / len(est)
        s = float(np.trace(np.diag(D) @ S) / var_e)
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return R, t, s


def ate_rmse(est: np.ndarray, gt: np.ndarray, with_scale: bool = False) -> float:
    """Absolute trajectory error RMSE [m] after alignment."""
    R, t, s = umeyama_align(est, gt, with_scale)
    aligned = (s * (R @ est.T)).T + t
    err = np.linalg.norm(aligned - gt, axis=-1)
    return float(np.sqrt((err**2).mean()))


def rpe_rmse(est: np.ndarray, gt: np.ndarray, delta: int = 20) -> float:
    """Relative pose (translation drift) RMSE over windows of `delta` frames."""
    T = len(est)
    errs = []
    for i in range(T - delta):
        de = est[i + delta] - est[i]
        dg = gt[i + delta] - gt[i]
        errs.append(np.linalg.norm(de) - np.linalg.norm(dg))
    return float(np.sqrt(np.mean(np.square(errs)))) if errs else 0.0
