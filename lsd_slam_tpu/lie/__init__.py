"""Lie groups for TPU SLAM: SO(3), SE(3), Sim(3) in pure jnp.

Replaces the reference's vendored Sophus (lsd_slam_core/thirdparty/Sophus) —
same group semantics and tangent-vector ordering, brand-new implementation:

  * rotations are unit quaternions ``[w, x, y, z]`` (shape ``(..., 4)``);
  * SE3 elements are ``(..., 7)`` arrays ``[qw qx qy qz, tx ty tz]``;
  * Sim3 elements are ``(..., 8)`` arrays ``[qw qx qy qz, tx ty tz, s]``
    with the scale stored explicitly (Sophus embeds it in the quaternion
    norm; explicit storage is friendlier to f32 and to masking);
  * tangents follow the Sophus ordering ``[upsilon(3), omega(3) (, sigma)]``
    (translation first), so Jacobian/adjoint layouts match the reference's
    LGS6/LGS7 dimension conventions (Sim3Tracker.cpp / LGSX.h:422-442);
  * everything is branch-free and batch-broadcastable: exp/log use masked
    Taylor fallbacks, and the SE3/Sim3 "V"/"W" matrices use the unified
    series W = sum_k M^k/(k+1)! with M = sigma*I + hat(omega), which is
    exact for both groups (sigma=0 gives SE3's V) and maps to 3x3 matmul
    chains the compiler fuses.

All functions accept arbitrary leading batch dims and preserve input dtype.
"""

from lsd_slam_tpu.lie.groups import (  # noqa: F401
    quat_identity,
    quat_mul,
    quat_conj,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    hat,
    so3_exp,
    so3_log,
    se3_identity,
    se3_exp,
    se3_log,
    se3_mul,
    se3_inverse,
    se3_apply,
    se3_matrix,
    se3_from_matrix,
    se3_adjoint,
    sim3_identity,
    sim3_exp,
    sim3_log,
    sim3_mul,
    sim3_inverse,
    sim3_apply,
    sim3_matrix,
    sim3_adjoint,
    se3_from_sim3,
    sim3_from_se3,
)
