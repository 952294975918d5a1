"""Numeric kernels: rotations, Lie groups, polynomials, triangulation,
minimal pose solvers."""

from . import (  # noqa: F401
    epipolar,
    five_point,
    focal_radial,
    generalized_pose,
    known_rotation,
    lie,
    orthographic,
    p3p,
    partial_rotation,
    pnp,
    polynomial,
    radial_homography,
    rotation,
    triangulation,
)
