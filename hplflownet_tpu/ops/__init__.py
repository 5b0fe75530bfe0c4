"""Lattice neural primitives: splat, blur, slice, correlation."""

from .bcl import splat, blur_matmul, slice_to_points, BilateralConv  # noqa: F401
from .corr import BilateralCorrelation  # noqa: F401
