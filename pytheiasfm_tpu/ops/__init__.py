"""Numeric kernels: rotations, Lie groups, polynomials, triangulation,
minimal pose solvers."""

from . import (  # noqa: F401
    epipolar,
    five_point,
    lie,
    p3p,
    pnp,
    polynomial,
    rotation,
    triangulation,
)
