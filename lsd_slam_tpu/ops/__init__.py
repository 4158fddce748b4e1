"""Shared device ops: interpolation, normal-equation reductions, kernels."""

from lsd_slam_tpu.ops.interp import bilinear, bilinear3  # noqa: F401
