"""Nonlinear least-squares solvers (Gauss-Newton / LM) as jitted programs.

Replaces /root/reference/src/optimizer/ (8 solver families). Design deltas
from the reference (SURVEY.md §7.1):
  * analytic-quality Jacobians via jax.jacfwd on residuals (the reference
    falls back to numerical differencing for IMU/Sim3/inertial-init edges)
  * fixed iteration counts + masked inlier gating instead of abort flags
  * Schur-complement reduced camera system instead of dense LU
"""
from orbslam3_tpu.optim.pose_only import pose_optimize, pose_inertial_optimize  # noqa: F401
