"""Neighbor-search parity vs scipy KDTree."""

import numpy as np
import pytest
from scipy.spatial import KDTree

from ptv_interpolation_tpu.ops.neighbors import (
    build_cell_list, knn, knn_bruteforce, knn_celllist,
)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    return rng.uniform(0, 10, size=(3000, 3)).astype(np.float32)


def test_bruteforce_matches_kdtree(cloud):
    rng = np.random.default_rng(8)
    queries = rng.uniform(0, 10, size=(500, 3)).astype(np.float32)
    k = 12
    d_ref, i_ref = KDTree(cloud).query(queries, k=k)
    d_got, i_got = knn_bruteforce(cloud, queries, k)
    d_got, i_got = np.asarray(d_got), np.asarray(i_got)
    np.testing.assert_allclose(d_got, d_ref, rtol=2e-3, atol=1e-3)
    # indices agree except possible f32 ties: check ≥99.9% exact
    assert (i_got == i_ref).mean() > 0.999


def test_bruteforce_padding_edges(cloud):
    # query/point counts not multiples of tile/chunk sizes
    queries = cloud[:37]
    d, i = knn_bruteforce(cloud[:100], queries, 5, query_tile=16, point_chunk=32)
    d_ref, i_ref = KDTree(cloud[:100]).query(queries, k=5)
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=2e-3, atol=1e-3)
    assert (np.asarray(i) == i_ref).mean() > 0.99


def test_self_query_first_neighbor_is_self(cloud):
    d, i = knn_bruteforce(cloud, cloud, 3)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(len(cloud)))
    np.testing.assert_allclose(np.asarray(d)[:, 0], 0.0, atol=1e-3)


def test_celllist_matches_kdtree_uniform(cloud):
    rng = np.random.default_rng(9)
    queries = rng.uniform(0.5, 9.5, size=(800, 3)).astype(np.float32)
    k = 10
    cells = build_cell_list(cloud, k_hint=k)
    d_got, i_got = knn_celllist(cells, queries, k)
    d_ref, i_ref = KDTree(cloud).query(queries, k=k)
    d_got = np.asarray(d_got)
    # distance parity (the metric that matters for interpolation weights)
    np.testing.assert_allclose(d_got, d_ref, rtol=2e-3, atol=1e-3)
    # neighbor recall
    recall = np.mean([
        len(np.intersect1d(np.asarray(i_got)[q], i_ref[q])) / k
        for q in range(len(queries))])
    assert recall > 0.999


def test_celllist_rings_expand_guaranteed_radius(cloud):
    # cell_size deliberately smaller than the k-th NN distance: ring-1 has
    # poor recall, ring-3 (radius 3*cs > r_k) recovers the exact answer.
    rng = np.random.default_rng(10)
    queries = rng.uniform(1, 9, size=(64, 3)).astype(np.float32)
    k = 32  # r_k ≈ 0.9 for 3000 pts in 10³
    cells = build_cell_list(cloud, cell_size=0.5)
    d_ref, i_ref = KDTree(cloud).query(queries, k=k)

    def recall(i_got):
        return np.mean([len(np.intersect1d(np.asarray(i_got)[q], i_ref[q])) / k
                        for q in range(len(queries))])

    _, i1 = knn_celllist(cells, queries, k, rings=1, query_tile=64)
    d3, i3 = knn_celllist(cells, queries, k, rings=3, query_tile=64)
    assert recall(i1) < 1.0          # ring-1 provably insufficient here
    assert recall(i3) > 0.999        # ring-3 covers r_k
    np.testing.assert_allclose(np.asarray(d3), d_ref, rtol=2e-3, atol=1e-3)


def test_celllist_capacity_static_and_ghost_cell(cloud):
    cells = build_cell_list(cloud, cell_size=2.0)
    assert cells.table.shape[0] == int(np.prod(cells.dims)) + 1
    # ghost row is all-sentinel
    assert (np.asarray(cells.table[-1]) == len(cloud)).all()
    # corner query (clipped neighborhood) still returns valid neighbors
    d, i = knn_celllist(cells, np.asarray([[0.0, 0.0, 0.0]], np.float32), 5)
    assert (np.asarray(i) >= 0).all() and np.isfinite(np.asarray(d)).all()


def test_knn_dispatcher(cloud):
    queries = cloud[:50]
    d_a, i_a = knn(cloud, queries, 8, method="bruteforce")
    d_b, i_b = knn(cloud, queries, 8, method="celllist")
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b), rtol=2e-3, atol=1e-3)


def test_k_larger_than_candidates():
    pts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    d, i = knn_bruteforce(pts, np.zeros((1, 3), np.float32), 3)
    assert np.isfinite(np.asarray(d)).all()
