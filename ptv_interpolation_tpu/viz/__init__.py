"""Matplotlib viewers over the NPZ field contract (host-side compat layer)."""

from ptv_interpolation_tpu.viz.scalar import show_scalar_field
from ptv_interpolation_tpu.viz.slices import (
    ComparisonViewer,
    ScalarSideBySideViewer,
    ScalarSliceViewer,
    SideBySideViewer,
    SliceViewer,
    compare,
    compare_scalars,
    show,
    show_scalar,
    side_by_side,
)

__all__ = [
    "SliceViewer",
    "ComparisonViewer",
    "SideBySideViewer",
    "ScalarSliceViewer",
    "ScalarSideBySideViewer",
    "show",
    "compare",
    "side_by_side",
    "show_scalar",
    "compare_scalars",
    "show_scalar_field",
]
