"""Local (k-nearest-neighbor) RBF interpolation.

TPU-native equivalent of ``scipy.interpolate.RBFInterpolator(..., neighbors=k)``
(reference `/root/reference/interpolator.py:157-195`): for every evaluation
point, fit an RBF + polynomial model through its ``k`` nearest particles and
evaluate it there.

Where scipy groups evaluation points that share a neighbor set and solves
each group's system once on the CPU, here every query gets its own local
``(k+m)×(k+m)`` system and the systems are solved as one big *batched* LU —
thousands of small dense solves are exactly the shape a TPU eats (vmapped
``linalg.solve`` lowers to batched MXU kernels, and no group bookkeeping /
dynamic shapes are needed). The two formulations agree wherever the local
model is well-posed; the per-query fit is the textbook "moving RBF" method.

Conditioning: each local system is centered on the query and scaled by the
k-th neighbor distance before assembly, keeping f32 solves stable for
arbitrarily large coordinate magnitudes (scipy does a similar shift/scale
on its global system).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ptv_interpolation_tpu.ops.neighbors import (
    CellList,
    bruteforce_tile_fn,
    celllist_tile_fn,
    map_query_tiles,
)
from ptv_interpolation_tpu.ops.rbf_kernels import (
    MIN_DEGREE,
    SCALE_INVARIANT,
    kernel_value,
    n_poly_terms,
    polynomial_basis,
)


def _local_rbf_solve_tile(q_tile, sq, xi, fi, valid, k, kernel, smoothing,
                          epsilon, degree, m, n_ch):
    """Shared per-neighborhood RBF fit+evaluate used by both the tiled and
    the grid-block paths: center on query, scale by k-th distance, solve
    the (k+m)² saddle system batched, evaluate at the query."""
    # k-th *valid* distance (missing slots carry a 3.4e38 sentinel that
    # would collapse every valid offset to ~0 and wreck conditioning)
    sq_valid = jnp.where(valid, sq, 0.0)
    scale = jnp.sqrt(jnp.maximum(
        jnp.max(sq_valid, axis=-1), 1e-30))[:, None, None]
    xl = (xi - q_tile[:, None, :]) / scale                # (T, k, 3)

    r = jnp.sqrt(jnp.maximum(
        jnp.sum((xl[:, :, None, :] - xl[:, None, :, :]) ** 2, axis=-1),
        0.0))
    K = kernel_value(kernel, epsilon * r)                 # (T, k, k)
    lam = smoothing + 1e-6 * jnp.max(jnp.abs(K), axis=(1, 2), keepdims=True)
    K = K + lam * jnp.eye(k)
    vmat = valid[:, :, None] & valid[:, None, :]
    K = jnp.where(vmat, K, jnp.eye(k))

    P = polynomial_basis(xl, degree)                      # (T, k, m)
    P = jnp.where(valid[:, :, None], P, 0.0)

    A = jnp.concatenate([
        jnp.concatenate([K, P], axis=2),
        jnp.concatenate([jnp.swapaxes(P, 1, 2),
                         jnp.zeros((q_tile.shape[0], m, m))], axis=2),
    ], axis=1)                                            # (T, k+m, k+m)
    rhs = jnp.concatenate([
        jnp.where(valid[:, :, None], fi, 0.0),
        jnp.zeros((q_tile.shape[0], m, n_ch)),
    ], axis=1)                                            # (T, k+m, C)

    sol = jnp.linalg.solve(A, rhs)                        # batched LU
    c = sol[:, :k, :]
    d = sol[:, k:, :]

    rq = jnp.sqrt(jnp.maximum(sq_valid, 0.0)) / scale[:, :, 0]
    Kq = kernel_value(kernel, epsilon * rq)               # (T, k)
    Kq = jnp.where(valid, Kq, 0.0)
    out = jnp.einsum("tk,tkc->tc", Kq, c)
    if m > 0:
        Pq = polynomial_basis(jnp.zeros_like(q_tile), degree)  # (T, m)
        out = out + jnp.einsum("tm,tmc->tc", Pq, d)
    return out


@functools.lru_cache(maxsize=32)
def _rbf_consume(k: int, kernel: str, smoothing: float, epsilon: float,
                 degree: int, n_ch: int):
    m = n_poly_terms(degree)

    def consume(sq, n_pos, n_val, ok, q):
        return _local_rbf_solve_tile(q, sq, n_pos, n_val, ok, k, kernel,
                                     smoothing, epsilon, degree, m, n_ch)
    return consume


def rbf_local_grid_interpolate(points, values, grid, k: int = 20,
                               kernel: str = "thin_plate_spline",
                               smoothing: float = 0.0, epsilon: float = 1.0,
                               degree: int | None = None, **kwargs):
    """Local kNN-RBF onto a :class:`Grid` via the block-centric kernel —
    neighbor selection amortized per block, one batched (k+m)² LU per
    query tile. The at-scale path for BASELINE config 3."""
    import numpy as np

    from ptv_interpolation_tpu.ops.grid_knn import grid_knn_apply
    if degree is None:
        degree = max(MIN_DEGREE[kernel], 0)
    n_ch = int(np.shape(values)[1])
    consume = _rbf_consume(int(k), kernel, float(smoothing), float(epsilon),
                           int(degree), n_ch)
    return grid_knn_apply(points, values, grid, k, consume, out_dim=n_ch,
                          **kwargs)


def rbf_local_interpolate(points, values, queries, k: int = 20,
                          kernel: str = "thin_plate_spline",
                          smoothing: float = 0.0, epsilon: float = 1.0,
                          degree: int | None = None,
                          cells: CellList | None = None, rings: int = 1,
                          query_tile: int = 256, point_chunk: int = 4096,
                          progress=None):
    """Evaluate a k-neighbor local RBF model of ``values`` (N, C) at
    ``queries`` (Q, 3). Returns (Q, C).

    Parameters mirror the reference CLI: ``k`` = --rbf-neighbors,
    ``kernel`` = --rbf-kernel, ``smoothing`` = --smoothing
    (`main.py:34-36`). ``progress`` (a host callback ``fn(done, total)``)
    routes through host-level macro-batches instead of the one-shot jit.
    """
    if degree is None:
        # scipy default: the kernel's minimum degree, or 0 when unrestricted
        degree = max(MIN_DEGREE[kernel], 0)
    if progress is None:
        return _rbf_local_jit(points, values, queries, k, kernel, smoothing,
                              epsilon, degree, cells, rings, query_tile,
                              point_chunk)
    return _rbf_local_impl(points, values, queries, k, kernel, smoothing,
                           epsilon, degree, cells, rings, query_tile,
                           point_chunk, progress)


@functools.partial(jax.jit, static_argnames=(
    "k", "kernel", "degree", "rings", "query_tile", "point_chunk"))
def _rbf_local_jit(points, values, queries, k, kernel, smoothing, epsilon,
                   degree, cells, rings, query_tile, point_chunk):
    return _rbf_local_impl(points, values, queries, k, kernel, smoothing,
                           epsilon, degree, cells, rings, query_tile,
                           point_chunk, None)


def _rbf_local_impl(points, values, queries, k, kernel, smoothing, epsilon,
                    degree, cells, rings, query_tile, point_chunk, progress):
    points = jnp.asarray(points, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    m = n_poly_terms(degree)
    n_ch = values.shape[1]

    neighbor = (celllist_tile_fn(cells, k, rings) if cells is not None
                else bruteforce_tile_fn(points, k, point_chunk))

    def tile(q_tile):
        sq, idx = neighbor(q_tile)                        # (T, k)
        safe_idx = jnp.clip(idx, 0, None)
        xi = points[safe_idx]                             # (T, k, 3)
        fi = values[safe_idx]                             # (T, k, C)
        valid = idx >= 0
        return _local_rbf_solve_tile(q_tile, sq, xi, fi, valid, k, kernel,
                                     smoothing, epsilon, degree, m, n_ch)

    return map_query_tiles(tile, queries, query_tile, progress=progress)
