#!/usr/bin/env python
"""Sub-stage timing for _host_setup and repair_empty_nodes at the bench
geometry — decides where the fixed ~3 s of the fused headline path goes
(host numpy? tunnel transfers? subset kernel? sync chain?)."""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_bench_cache"))
import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from bench import GRID_N, K, make_problem             # noqa: E402
from ptv_interpolation_tpu.grid import create_grid    # noqa: E402
from ptv_interpolation_tpu.ops import fused_grid_knn as fg   # noqa: E402
from ptv_interpolation_tpu.ops import grid_knn as gk  # noqa: E402
from ptv_interpolation_tpu.ops.neighbors import build_cell_list  # noqa: E402


def t(label, t0):
    w = time.time() - t0
    print(f"  {label:44s} {w:7.3f}s", flush=True)
    return time.time()


def main():
    print(f"devices: {jax.devices()}", flush=True)
    pts, vals = make_problem()
    grid = create_grid(((0, GRID_N + 1), (0, GRID_N + 1), (0, GRID_N + 1)),
                       GRID_N)
    block = (8, 8, 16)

    # raw transfer cost
    for tag in ("cold", "warm"):
        t0 = time.time()
        d = jnp.asarray(pts)
        jax.block_until_ready(d)
        t(f"12MB H2D transfer ({tag})", t0)

    print("\n--- _host_setup sub-stages (2nd run, compile-warm) ---",
          flush=True)
    for rep in range(2):
        t0 = time.time()
        cells = build_cell_list(pts, cell_size=None, build_table=False,
                                k_hint=K)
        t0 = t(f"build_cell_list host+enqueue (rep{rep})", t0)
        jax.block_until_ready((cells.points_sorted, cells.starts,
                               cells.order))
        t0 = t("  block_until_ready (transfers drain)", t0)
        values_dev = jnp.asarray(vals)
        values_sorted = gk._sort_values(values_dev, cells.order)
        jax.block_until_ready(values_sorted)
        t0 = t("  values transfer + device sort", t0)

    setup = gk._host_setup(pts, vals, grid, K, None, None, block, 1.45)
    (cells, values_sorted, axes, margin, mc, _row_len, values_dev) = setup
    axes_np = tuple(np.asarray(a) for a in axes)
    C_raw = fg._block_total_capacity(cells, axes_np, margin, block,
                                     grid.shape, mc)
    C = max((C_raw + 127) // 128 * 128, 128)
    t0 = time.time()
    C2 = fg._block_total_capacity(cells, axes_np, margin, block,
                                  grid.shape, mc)
    t0 = t("_block_total_capacity (host)", t0)

    nz, ny, nx = grid.shape
    dims = (fg._block_counts(nz, block[0]), fg._block_counts(ny, block[1]),
            fg._block_counts(nx, block[2]))
    V = vals.shape[1]
    sz = fg._pick_sz(*block)
    m2 = jnp.asarray([[margin * margin]], jnp.float32)
    cand = fg._compact_gather(cells, values_sorted, axes, jnp.float32(margin),
                              block, grid.shape, mc, C, 8)
    qx, qy, qz = fg._build_queries(axes, block, dims, sz)
    out = fg._fused_eval(m2, cand, qx, qy, qz, block, dims, sz, K, V, C,
                         "sibson", 2.0)
    field8 = fg._reassemble(out, block, dims, sz, grid.shape)
    jax.block_until_ready(field8)
    field, den = field8[..., :V], field8[..., V]

    print("\n--- repair_empty_nodes sub-stages (monkey-timed) ---",
          flush=True)
    # warm once
    rep = gk.repair_empty_nodes(field, den, pts, values_dev, grid, K,
                                "sibson", 2.0, cells=cells, margin=margin,
                                values_sorted=values_sorted, block=block)
    jax.block_until_ready(rep)

    # manual replay of the repair stages with timers
    t0 = time.time()
    den_zero = den == 0.0
    n_fix = int(jnp.sum(den_zero))
    t0 = t(f"n_fix scalar pull (n_fix={n_fix})", t0)
    flat = jnp.nonzero(den_zero.ravel(), size=n_fix)[0]
    flat_np = np.asarray(flat)
    t0 = t("nonzero + index pull", t0)
    iz, iy, ix = np.unravel_index(flat_np, np.shape(den))
    queries = np.stack([np.asarray(grid.x)[ix], np.asarray(grid.y)[iy],
                        np.asarray(grid.z)[iz]], axis=-1).astype(np.float32)
    t0 = t("host unravel + query build", t0)

    import math
    bz, by, bx = block
    nzs, nys, nxs = np.shape(den)
    nbz, nby, nbx = (gk._block_counts(nzs, bz), gk._block_counts(nys, by),
                     gk._block_counts(nxs, bx))
    blk = ((iz // bz) * nby + (iy // by)) * nbx + (ix // bx)
    uniq, inv = np.unique(blk, return_inverse=True)
    cell_size = 1.0 / float(np.asarray(cells.inv_cell)[0])
    margin2 = 1.6 * float(margin)
    dx, dy, dz = grid.spacing
    mc2 = tuple(int(math.ceil((ext + 2.0 * margin2) / cell_size)) + 1
                for ext in (bx * dx, by * dy, bz * dz))[::-1]
    row_len2 = gk._row_capacity(cells, mc2[2])
    B = bz * by * bx
    print(f"  [uniq blocks={len(uniq)} row_len2={row_len2} "
          f"panel C2={mc2[0]*mc2[1]*row_len2} B={B}]", flush=True)
    t0 = time.time()

    from ptv_interpolation_tpu.interpolate.knn_weights import (
        _sibson_panel_weights)

    def pad_axis2(ax, b):
        n_ax = len(ax)
        target = gk._block_counts(n_ax, b) * b
        ax = np.asarray(ax, np.float32)
        if target == n_ax:
            return jnp.asarray(ax)
        step = ax[1] - ax[0] if n_ax > 1 else 1.0
        extra = ax[-1] + step * np.arange(1, target - n_ax + 1)
        return jnp.asarray(np.concatenate([ax, extra]), jnp.float32)

    axes2 = (pad_axis2(grid.x, bx), pad_axis2(grid.y, by),
             pad_axis2(grid.z, bz))
    n_pad = 1 << max(len(uniq) - 1, 1).bit_length()
    ids = np.concatenate(
        [uniq, np.broadcast_to(uniq[-1:], (n_pad - len(uniq),))])
    t0 = t("subset host prep", t0)
    sub = gk._grid_block_weighted_sum_subset(
        cells, values_sorted, axes2, jnp.float32(margin2),
        jnp.asarray(ids, jnp.int32), min(K, pts.shape[0]), tuple(block),
        (nzs, nys, nxs), mc2, row_len2, _sibson_panel_weights(), 8)
    jax.block_until_ready(sub)
    t0 = t("subset kernel (device)", t0)
    V1 = V
    local = ((iz % bz) * by + (iy % by)) * bx + (ix % bx)
    rows = inv.astype(np.int64) * B + local
    picked = np.asarray(sub.reshape(-1, V1 + 1)[jnp.asarray(rows)])
    t0 = t("picked rows pull", t0)
    good = picked[:, V1] > 0.0
    n_left = int((~good).sum())
    t0 = t(f"certify (left for brute force: {n_left})", t0)

    if n_left:
        from ptv_interpolation_tpu.interpolate.knn_weights import (
            sibson_interpolate)
        todo_q = queries[~good]
        qc, m = gk._pad_pow2(todo_q)
        part = sibson_interpolate(pts, vals, qc, k=min(K, pts.shape[0]))
        jax.block_until_ready(part)
        t0 = t(f"brute-force tail ({m} queries, padded {len(qc)})", t0)

    out2 = field.reshape(-1, V).at[flat].set(jnp.zeros((n_fix, V)))
    jax.block_until_ready(out2)
    t0 = t("device scatter", t0)


if __name__ == "__main__":
    main()
