"""Structured, throttled pipeline logging.

Parity with the reference's `tracing` + env-filter setup (main.rs:13-19:
default INFO, `RUST_LOG`-style override; tracker logs throttled to every
100 frames, tracker.rs:538,927). Python analog: stdlib logging under the
"orbslam3_tpu" namespace, level from ORBSLAM3_TPU_LOG (default WARNING so
library users aren't spammed; set INFO/DEBUG to watch a run).

Design constraint unique to this engine: log emission must not force a
device sync — everything logged here is host-side state (counters,
snapshots already fetched by the service round), never a fresh `int(x)` on
a device array.
"""
from __future__ import annotations

import logging
import os

_CONFIGURED = False


def get_logger(name: str = "orbslam3_tpu") -> logging.Logger:
    global _CONFIGURED
    if not _CONFIGURED:
        level = os.environ.get("ORBSLAM3_TPU_LOG", "WARNING").upper()
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s",
                              "%H:%M:%S")
        )
        root = logging.getLogger("orbslam3_tpu")
        root.addHandler(h)
        root.setLevel(getattr(logging, level, logging.WARNING))
        root.propagate = False
        _CONFIGURED = True
    return logging.getLogger(name)


class Throttle:
    """Emit at most once per `every` calls (reference: every-100-frames
    throttling in the tracker)."""

    def __init__(self, every: int = 100):
        self.every = every
        self.n = 0

    def ready(self) -> bool:
        self.n += 1
        return (self.n - 1) % self.every == 0
