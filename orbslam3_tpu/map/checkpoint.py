"""Map / tracker-state checkpointing (save + resume).

The reference has NO session persistence (SURVEY.md §5: "Checkpoint/resume:
None"). The dense-array map makes it trivial here: every MapState /
TrackState leaf is an array, so a checkpoint is one npz. Enables
map-reuse sessions, crash recovery, and offline global refinement.
"""
from __future__ import annotations

import numpy as np

from orbslam3_tpu.imu.preintegration import PreintState
from orbslam3_tpu.map.slam_map import MapState


def _flatten(prefix: str, tree, out: dict):
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # NamedTuple
        for name in tree._fields:
            _flatten(f"{prefix}{name}.", getattr(tree, name), out)
    else:
        out[prefix.rstrip(".")] = np.asarray(tree)


def _unflatten(cls, prefix: str, data: dict):
    kwargs = {}
    for name, hint in cls.__annotations__.items():
        key = f"{prefix}{name}"
        if key in data:
            kwargs[name] = data[key]
        else:
            # nested NamedTuple (only PreintState occurs in practice)
            kwargs[name] = _unflatten(PreintState, f"{key}.", data)
    return cls(**kwargs)


def save_map(path: str, map_state: MapState, track_state=None):
    out: dict = {}
    _flatten("map.", map_state, out)
    if track_state is not None:
        _flatten("ts.", track_state, out)
    np.savez_compressed(path, **out)


def load_map(path: str, with_track_state: bool = False):
    import jax.numpy as jnp

    data = {k: jnp.asarray(v) for k, v in np.load(path).items()}
    st = _unflatten(MapState, "map.", data)
    if not with_track_state:
        return st
    from orbslam3_tpu.models.fused import TrackState

    ts = _unflatten(TrackState, "ts.", data)
    return st, ts
