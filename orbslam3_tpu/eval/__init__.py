"""Trajectory evaluation (ATE / RPE) — absent from the reference (SURVEY.md
§4: "no ATE/RPE computation is implemented anywhere"); built in from day 1.
"""
from orbslam3_tpu.eval.metrics import ate_rmse, rpe_rmse, umeyama_align  # noqa: F401
