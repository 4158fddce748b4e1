"""Global mapping: keyframe graph, Sim(3) constraints, pose-graph optimizer.

Equivalent of src/GlobalMapping/ (KeyFrameGraph, TrackableKeyFrameSearch,
g2o Sim3 pose graph) re-designed for batched device execution: candidate
quick-checks run as vmapped coarse tracks, the pose graph optimizes with a
JAX Gauss-Newton/LM solver over Sim3 vertex/edge arrays.
"""

from lsd_slam_tpu.mapping.backend import MappingBackend  # noqa: F401
