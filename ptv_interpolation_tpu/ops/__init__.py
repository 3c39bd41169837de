"""Device-side compute primitives: neighbor search, stencils, solvers, sampling."""

from ptv_interpolation_tpu.ops.neighbors import (
    CellList,
    build_cell_list,
    knn,
    knn_bruteforce,
    knn_celllist,
)

__all__ = [
    "CellList",
    "build_cell_list",
    "knn",
    "knn_bruteforce",
    "knn_celllist",
]
