"""Visualization + export: trajectory files, point-cloud dumps, optional
Rerun streaming (reference: src/viz/rerun.rs — here optional since the
rerun SDK may be absent; offline exports always work)."""
from orbslam3_tpu.viz.export import (  # noqa: F401
    save_map_ply,
    save_trajectory_tum,
)
