"""Dataset IO: EuRoC loader + deterministic synthetic stereo-inertial worlds.

The synthetic world (io/synthetic.py) fills the evaluation role the
reference delegates to on-disk EuRoC data (io/euroc.rs) — no dataset ships
with this environment, so ATE/throughput benchmarks run on rendered
sequences with exact ground truth.
"""
from orbslam3_tpu.io.synthetic import SyntheticWorld, SyntheticConfig  # noqa: F401
