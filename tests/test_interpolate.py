"""Interpolator parity vs the scipy reference path."""

import numpy as np
import pytest

from ptv_interpolation_tpu.grid import create_grid
from ptv_interpolation_tpu.interpolate import (
    idw_interpolate, interpolate_field, linear_interpolate,
    nearest_interpolate, rbf_global_interpolate, rbf_local_interpolate,
    sibson_interpolate,
)


@pytest.fixture(scope="module")
def scattered():
    rng = np.random.default_rng(42)
    pts = rng.uniform(0, 10, size=(2000, 3)).astype(np.float32)
    # smooth analytic field
    u = np.sin(pts[:, 0] * 0.5) * np.cos(pts[:, 1] * 0.3)
    v = pts[:, 2] * 0.1
    w = np.cos(pts[:, 0] * 0.2 + pts[:, 1] * 0.1)
    vals = np.stack([u, v, w], axis=-1).astype(np.float32)
    return pts, vals


@pytest.fixture(scope="module")
def queries():
    rng = np.random.default_rng(43)
    return rng.uniform(1, 9, size=(400, 3)).astype(np.float32)


def _reference_idw(pts, vals, queries, k, power):
    from scipy.spatial import KDTree
    dist, idx = KDTree(pts).query(queries, k=k)
    w = 1.0 / (dist ** power + 1e-10)
    w = w / w.sum(axis=1, keepdims=True)
    return np.einsum("qk,qkc->qc", w, vals[idx])


def _reference_sibson(pts, vals, queries, k):
    from scipy.spatial import KDTree
    distances, idx = KDTree(pts).query(queries, k=k)
    eps = 1e-10
    inv = 1.0 / (distances + eps)
    w = inv / inv.sum(axis=1, keepdims=True)
    dist_std = distances.std(axis=1, keepdims=True)
    w = w * np.exp(-distances / (dist_std + eps))
    w = w / w.sum(axis=1, keepdims=True)
    return np.einsum("qk,qkc->qc", w, vals[idx])


def test_idw_parity(scattered, queries):
    pts, vals = scattered
    got = np.asarray(idw_interpolate(pts, vals, queries, k=50, power=2.0))
    want = _reference_idw(pts, vals, queries, 50, 2.0)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sibson_parity(scattered, queries):
    pts, vals = scattered
    got = np.asarray(sibson_interpolate(pts, vals, queries, k=30))
    want = _reference_sibson(pts, vals, queries, 30)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_nearest_parity(scattered, queries):
    from scipy.interpolate import griddata
    pts, vals = scattered
    got = np.asarray(nearest_interpolate(pts, vals, queries))
    want = griddata(pts.astype(np.float64), vals, queries, method="nearest")
    assert (np.abs(got - want) < 1e-5).mean() > 0.995  # f32 tie edges


def test_linear_parity(scattered, queries):
    from scipy.interpolate import griddata
    pts, vals = scattered
    got = np.asarray(linear_interpolate(pts, vals, queries, fill_value=0.0))
    want = griddata(pts.astype(np.float64), vals, queries,
                    method="linear", fill_value=0.0)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_rbf_local_vs_scipy(scattered, queries):
    from scipy.interpolate import RBFInterpolator
    pts, vals = scattered
    got = np.asarray(rbf_local_interpolate(
        pts, vals, queries, k=20, kernel="thin_plate_spline", smoothing=0.0))
    interp = RBFInterpolator(pts.astype(np.float64), vals, neighbors=20,
                             kernel="thin_plate_spline", smoothing=0.0)
    want = interp(queries.astype(np.float64))
    # both approximate the same smooth field; local groupings differ slightly
    err = np.abs(got - want) / (np.abs(want).max() + 1e-9)
    assert np.median(err) < 2e-3
    assert np.percentile(err, 99) < 3e-2


def test_rbf_local_reproduces_data_points(scattered):
    pts, vals = scattered
    got = np.asarray(rbf_local_interpolate(pts[:200], vals[:200], pts[:50],
                                           k=20, kernel="thin_plate_spline"))
    np.testing.assert_allclose(got, vals[:50], rtol=5e-3, atol=5e-3)


def test_rbf_global_gaussian_cholesky(scattered, queries):
    from scipy.interpolate import RBFInterpolator
    pts, vals = scattered
    pts_s, vals_s = pts[:500], vals[:500]
    eps = 0.5
    got = np.asarray(rbf_global_interpolate(
        pts_s, vals_s, queries, kernel="gaussian", epsilon=eps,
        smoothing=1e-3, degree=-1))
    # scipy scales epsilon against raw coords; ours against shifted/scaled.
    # Compare against a numpy recomputation of the same model instead.
    shift = pts_s.mean(0)
    scale = np.abs(pts_s - shift).max()
    xs = (pts_s - shift) / scale
    qs = (queries - shift) / scale
    r = np.linalg.norm(xs[:, None] - xs[None, :], axis=-1)
    K = np.exp(-(eps * r) ** 2) + 1e-3 * np.eye(len(xs))
    K += 1e-6 * np.abs(K).max() * np.eye(len(xs))
    c = np.linalg.solve(K, vals_s)
    rq = np.linalg.norm(qs[:, None] - xs[None, :], axis=-1)
    want = np.exp(-(eps * rq) ** 2) @ c
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)
    # sanity vs scipy on the *field* level (same kernel family)
    interp = RBFInterpolator(xs, vals_s, kernel="gaussian", epsilon=eps,
                             smoothing=1e-3, degree=-1)
    scipy_want = interp(qs)
    assert np.abs(got - scipy_want).max() < 0.05 * np.abs(scipy_want).max() + 1e-3


def test_rbf_global_tps_interpolates(scattered):
    pts, vals = scattered
    got = np.asarray(rbf_global_interpolate(pts[:300], vals[:300], pts[:300],
                                            kernel="thin_plate_spline"))
    np.testing.assert_allclose(got, vals[:300], rtol=1e-2, atol=2e-3)


def test_interpolate_field_grid_contract(scattered):
    pts, vals = scattered
    grid = create_grid(((0, 10), (0, 10), (0, 10)), (8, 6, 4))
    U, V, W = interpolate_field(pts, vals, grid, method="idw", idw_neighbors=10)
    assert np.asarray(U).shape == (4, 6, 8)
    assert np.isfinite(np.asarray(U)).all()


def test_cubic_raises():
    with pytest.raises(ValueError, match="cubic"):
        interpolate_field(np.zeros((4, 3), np.float32),
                          np.zeros((4, 3), np.float32),
                          create_grid(((0, 1), (0, 1), (0, 1)), 2),
                          method="cubic")


def test_cubic_fallback_serves_cubic_rbf(scattered, queries):
    """Explicit opt-in: method='cubic' + cubic_fallback=True serves the
    documented 3D substitute (local RBF, kernel='cubic')."""
    pts, vals = scattered
    from ptv_interpolation_tpu.interpolate import interpolate_values
    got = np.asarray(interpolate_values(pts, vals, queries, method="cubic",
                                        cubic_fallback=True))
    want = np.asarray(rbf_local_interpolate(pts, vals, queries, k=20,
                                            kernel="cubic"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rbf_progress_callback_reports_and_matches(scattered):
    """The host-batched progress path (reference interpolator.py:185-193
    chunked progress) must report monotonically to completion and return
    bit-comparable results to the one-shot jit path."""
    pts, vals = scattered
    rng = np.random.default_rng(44)
    q = rng.uniform(1, 9, size=(20_000, 3)).astype(np.float32)
    calls = []
    got = np.asarray(rbf_local_interpolate(
        pts, vals, q, k=8, query_tile=256, point_chunk=2048,
        progress=lambda d, t: calls.append((d, t))))
    want = np.asarray(rbf_local_interpolate(pts, vals, q, k=8,
                                            query_tile=256, point_chunk=2048))
    assert calls and calls[-1][0] == 20_000
    assert [c[0] for c in calls] == sorted(c[0] for c in calls)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_interpolators_recover_analytic_cylinder_flow():
    """All kNN methods must reconstruct the analytic potential flow past
    two cylinders from scattered samples (the reference's cylinder fixture
    as an accuracy benchmark rather than a smoke test)."""
    from ptv_interpolation_tpu.datasets import cylinders
    cloud, mask_grid, bounds = cylinders.generate(n_points=20000, seed=3)
    grid = create_grid(bounds, (48, 24, 8))
    X, Y, Z = (np.asarray(a) for a in grid.meshgrid())
    u_true, v_true = cylinders.analytic_velocity(X.ravel(), Y.ravel())

    # evaluate away from the cylinders and domain edges
    q = np.asarray(grid.flat_coords())
    d1 = np.hypot(q[:, 0] - 0.0, q[:, 1] - 0.0)
    d2 = np.hypot(q[:, 0] - 3.0, q[:, 1] - 3.0 * 0)
    sel = (d1 > 0.6) & (d2 > 0.6) & (np.abs(q[:, 1]) < 1.6) \
        & (q[:, 0] > -1.5) & (q[:, 0] < 5.5)

    for method, kwargs in [("idw", dict(idw_neighbors=30)),
                           ("sibson", dict(sibson_neighbors=30)),
                           ("rbf", dict(rbf_neighbors=25))]:
        U, V, W = interpolate_field(cloud.points, cloud.values, grid,
                                    method=method, **kwargs)
        u_err = np.abs(np.asarray(U).ravel()[sel] - u_true[sel])
        scale = np.abs(u_true[sel]).mean()
        assert u_err.mean() / scale < 0.05, (method, u_err.mean() / scale)


def test_triangulation_cache(tmp_path, monkeypatch):
    """`linear` amortizes Qhull: same point cloud hits the one-slot memory
    cache (same Delaunay object), a changed cloud rebuilds, and
    PTV_TRI_CACHE_DIR persists entries across "processes" (simulated by
    clearing the memory slot)."""
    from ptv_interpolation_tpu.interpolate import delaunay as dl

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 10, size=(200, 3))
    t1 = dl.get_cached_triangulation(pts)
    t2 = dl.get_cached_triangulation(pts.copy())
    assert t1 is t2                      # content-hash hit, not identity
    other = dl.get_cached_triangulation(rng.uniform(0, 10, size=(180, 3)))
    assert other is not t1

    monkeypatch.setenv("PTV_TRI_CACHE_DIR", str(tmp_path))
    t3 = dl.get_cached_triangulation(pts)   # rebuilds (slot was evicted), writes disk
    assert len(list(tmp_path.glob("tri_*.pkl"))) == 1
    dl._TRI_CACHE.clear()                   # simulate a fresh process
    t4 = dl.get_cached_triangulation(pts)   # disk hit
    np.testing.assert_array_equal(t4.simplices, t3.simplices)

    # and the public linear path uses it: two calls, one triangulation
    dl._TRI_CACHE.clear()
    q = rng.uniform(1, 9, size=(50, 3))
    vals = rng.normal(size=(200, 2))
    a = np.asarray(dl.linear_interpolate(pts, vals, q))
    built = dl._TRI_CACHE[dl._points_digest(np.asarray(pts, np.float64))]
    b = np.asarray(dl.linear_interpolate(pts, vals, q))
    assert dl._TRI_CACHE[dl._points_digest(np.asarray(pts, np.float64))] is built
    np.testing.assert_allclose(a, b)
