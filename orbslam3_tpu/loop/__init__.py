"""Loop closing: BoW retrieval, Sim3 RANSAC, pose graph, global BA wiring.

Replaces /root/reference/src/loop_closing/ + vocabulary/. One deliberate
improvement over the reference: the essential-graph pose-graph optimizer is
actually WIRED INTO loop correction (the reference implements but never
calls it — SURVEY.md §2.1 #23).
"""
from orbslam3_tpu.loop.vocab import Vocabulary, train_vocabulary  # noqa: F401
from orbslam3_tpu.loop.closer import LoopCloser, LoopConfig  # noqa: F401
from orbslam3_tpu.loop.sim3 import sim3_ransac  # noqa: F401
