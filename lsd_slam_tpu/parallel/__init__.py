"""Multi-device scaling: sharded constraint search + distributed PGO.

The reference is single-machine (boost threads + ROS, SURVEY.md section
2.10-2.11). The TPU-native scale axes are:

  * DP over constraint candidates: batched permaRef/Sim3 quick-checks
    sharded across a device mesh (each chip scores a slice of candidate
    keyframes for the same query frame);
  * distributed pose-graph optimization: edges partition across devices,
    each chip assembles its partial normal equations, and H/g are
    psum-reduced over ICI before the solve (Schur/CG for large graphs).
"""

from lsd_slam_tpu.parallel.distributed import (  # noqa: F401
    make_mesh,
    default_mesh,
    pad_to_mesh,
    distributed_pgo_normal_equations,
    sharded_quick_track,
    sharded_quick_track_frames,
    distributed_pgo_step,
    distributed_pgo_cg_step,
)
