"""Multi-device parallelism: mesh construction + distributed global BA.

No analog exists in the reference (single process, thread pipeline —
SURVEY.md §2.3); this is the TPU-native scaling axis: landmark blocks
sharded over the mesh, per-device partial Hessians, Schur reduction via
psum over ICI (BASELINE.json driver config #5).
"""
from orbslam3_tpu.parallel.distributed_ba import (  # noqa: F401
    GlobalBAPoints,
    distributed_global_ba,
    make_point_table,
)
