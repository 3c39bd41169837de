#!/usr/bin/env python
"""Account for every millisecond of the warm fused end-to-end call —
the stage sums in bench_fused_breakdown leave a ~1.5 s gap."""

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
from ptv_interpolation_tpu.ops.grid_knn import (      # noqa: E402
    _host_setup, repair_empty_nodes)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    pts, vals = make_problem()
    grid = create_grid(((0, GRID_N + 1), (0, GRID_N + 1), (0, GRID_N + 1)),
                       GRID_N)
    block = (8, 8, 16)
    k = K

    def run_once(label):
        print(f"--- {label} ---", flush=True)
        t00 = time.time()

        def t(name, t0):
            w = time.time() - t0
            print(f"  {name:40s} {w:7.3f}s", flush=True)
            return time.time()

        t0 = time.time()
        setup = _host_setup(pts, vals, grid, k, None, None, block, 1.45,
                            cell_divisor=3.0)
        (cells, values_sorted, axes, margin, mc, _rl, values_dev) = setup
        jax.block_until_ready((cells.points_sorted, values_sorted))
        t0 = t("setup (blocked)", t0)

        axes_np = tuple(np.asarray(a) for a in axes)
        C_raw = fg._block_total_capacity(cells, axes_np, margin, block,
                                         grid.shape, mc)
        C = max((C_raw + 127) // 128 * 128, 128)
        t0 = t("capacity (host)", t0)

        nz, ny, nx = grid.shape
        dims = (fg._block_counts(nz, block[0]),
                fg._block_counts(ny, block[1]),
                fg._block_counts(nx, block[2]))
        V = vals.shape[1]
        sz = fg._pick_sz(*block)
        cand = fg._compact_gather(cells, values_sorted, axes,
                                  jnp.float32(margin), block, grid.shape,
                                  mc, C, 8)
        jax.block_until_ready(cand)
        t0 = t("compact gather (blocked)", t0)

        m2 = jnp.asarray([[margin * margin]], jnp.float32)
        qx, qy, qz = fg._build_queries(axes, block, dims, sz)
        jax.block_until_ready((qx, qy, qz))
        t0 = t("build_queries (blocked)", t0)

        out = fg._fused_eval(m2, cand, qx, qy, qz, block, dims, sz, k, V, C,
                             "sibson", 2.0)
        jax.block_until_ready(out)
        t0 = t("fused eval (blocked)", t0)

        field8 = fg._reassemble(out, block, dims, sz, grid.shape)
        jax.block_until_ready(field8)
        t0 = t("reassemble (blocked)", t0)

        field, den = field8[..., :V], field8[..., V]
        rep = repair_empty_nodes(field, den, pts, values_dev, grid, k,
                                 "sibson", 2.0, cells=cells, margin=margin,
                                 values_sorted=values_sorted, block=block)
        jax.block_until_ready(rep)
        t0 = t("repair (blocked)", t0)
        print(f"  {'TOTAL':40s} {time.time() - t00:7.3f}s", flush=True)

    run_once("warmup")
    run_once("warm 1")
    run_once("warm 2")


if __name__ == "__main__":
    main()
