"""Utilities: precision helpers, config, logging, metrics, profiling."""
from orbslam3_tpu.utils.precision import matmul_hp  # noqa: F401
