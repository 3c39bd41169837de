"""Parity of the grid linear evaluators vs scipy griddata.

`interpolate/delaunay.py::linear_grid_interpolate` serves the reference's
production method (`/root/reference/interpolator.py:197` griddata-linear,
production per `run_porous_glass.py:18`) with two evaluators over the
same Delaunay triangulation: scipy's compiled walk+blend ('walk', the
at-scale default — measured fastest exact evaluator) and a vectorized
bbox-rasterization ('raster', an independent oracle). Both must produce
the identical piecewise-linear interpolant, including the fill_value=0
outside-hull contract.
"""

import numpy as np

from ptv_interpolation_tpu.grid import create_grid
from ptv_interpolation_tpu.interpolate.delaunay import linear_grid_interpolate
from ptv_interpolation_tpu.interpolate.dispatch import interpolate_field


def _problem(seed=0, n_pts=3000, n=24):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, n, size=(n_pts, 3)).astype(np.float32)
    vals = np.stack([
        np.sin(pts[:, 0] * 0.3) + pts[:, 1] * 0.01,
        np.cos(pts[:, 1] * 0.2),
        1.0 + 0.1 * pts[:, 2] / n,
    ], axis=-1).astype(np.float32)
    grid = create_grid(((0, n + 1), (0, n + 1), (0, n + 1)), n)
    return pts, vals, grid


def test_raster_matches_griddata():
    from scipy.interpolate import griddata

    pts, vals, grid = _problem()
    got = np.asarray(linear_grid_interpolate(pts, vals, grid,
                                             evaluator="raster"))

    ZZ, YY, XX = np.meshgrid(grid.z, grid.y, grid.x, indexing="ij")
    q = np.stack([XX.ravel(), YY.ravel(), ZZ.ravel()], axis=-1)
    want = griddata(pts.astype(np.float64), vals.astype(np.float64), q,
                    method="linear", fill_value=0.0).reshape(got.shape)

    # identical interpolant; hull-boundary nodes may flip in/out at f64
    # roundoff between the walk and the bbox test — allow a razor-thin band
    close = np.isclose(got, want, rtol=1e-5, atol=1e-6).all(axis=-1)
    assert close.mean() > 0.9995, f"{(~close).sum()} mismatched nodes"
    # interior nodes must match exactly to f32 roundoff
    inner = close[2:-2, 2:-2, 2:-2]
    assert inner.all()


def test_walk_matches_raster():
    pts, vals, grid = _problem(seed=3)
    walk = np.asarray(linear_grid_interpolate(pts, vals, grid,
                                              evaluator="walk"))
    rast = np.asarray(linear_grid_interpolate(pts, vals, grid,
                                              evaluator="raster"))
    close = np.isclose(walk, rast, rtol=1e-5, atol=1e-6).all(axis=-1)
    assert close.mean() > 0.9995
    assert close[2:-2, 2:-2, 2:-2].all()


def test_raster_fill_value_outside_hull():
    pts, vals, grid = _problem(n_pts=500)
    # confine the cloud: upper-z half of the grid is outside the hull
    pts[:, 2] *= 0.4
    for ev in ("walk", "raster"):
        got = np.asarray(linear_grid_interpolate(pts, vals, grid,
                                                 evaluator=ev))
        assert np.all(got[-4:] == 0.0)
        assert np.abs(got[:2]).max() > 0.0


def test_interpolate_field_routes_linear_through_grid_path():
    pts, vals, grid = _problem(n_pts=800, n=12)
    U, V, W = interpolate_field(pts, vals, grid, method="linear")
    got = np.asarray(linear_grid_interpolate(pts, vals, grid))
    np.testing.assert_array_equal(np.asarray(U), got[..., 0])
    np.testing.assert_array_equal(np.asarray(W), got[..., 2])
