#!/usr/bin/env python
"""Stage breakdown + roofline accounting for the fused headline kernel.

Runs the 1M→256³ sibson problem through the fused two-phase path
(`ops/fused_grid_knn.py`) stage by stage on the real chip, reporting warm
walls for: host setup (cell build + transfers), compact gather, Pallas
τ-bisect eval, reassembly, and repair — plus an HBM-traffic model per
stage and the achieved fraction of v5e peak (~0.8 TB/s), for the roofline
table in BASELINE.md.
"""

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

HBM_PEAK = 0.82e12   # v5e ~819 GB/s


def timed(label, fn, n=3):
    fn()                      # warmup/compile
    walls = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        walls.append(time.time() - t0)
    w = float(np.median(walls))
    print(f"{label:34s} {w:7.3f}s   (runs: "
          + " ".join(f"{x:.3f}" for x in walls) + ")", flush=True)
    return w


def main():
    print(f"devices: {jax.devices()}", flush=True)
    pts, vals = make_problem()
    grid = create_grid(((0, GRID_N + 1), (0, GRID_N + 1), (0, GRID_N + 1)),
                       GRID_N)
    block = (8, 8, 16)
    k = K

    # ---- stage 0: host setup (cell build + device transfers) ----
    for tag in ("cold", "warm"):
        t0 = time.time()
        setup = _host_setup(pts, vals, grid, k, None, None, block, 1.45,
                            cell_divisor=3.0)
        (cells, values_sorted, axes, margin, mc, _row_len, values_dev) = setup
        jax.block_until_ready((cells.points_sorted, values_sorted))
        t_setup = time.time() - t0
        print(f"{'host setup ' + tag + ' (incl transfer)':34s} "
              f"{t_setup:7.3f}s", flush=True)

    axes_np = tuple(np.asarray(a) for a in axes)
    C_raw = fg._block_total_capacity(cells, axes_np, margin, block,
                                     grid.shape, mc)
    C = max((C_raw + 127) // 128 * 128, 128)
    nz, ny, nx = grid.shape
    bz, by, bx = block
    dims = (fg._block_counts(nz, bz), fg._block_counts(ny, by),
            fg._block_counts(nx, bx))
    n_blocks = dims[0] * dims[1] * dims[2]
    V = vals.shape[1]
    sz = fg._pick_sz(bz, by, bx)
    n_sub = bz // sz
    Bt = sz * by * bx
    print(f"C={C} n_blocks={n_blocks} sz={sz} Bt={Bt} margin={margin:.3f}",
          flush=True)

    m2 = jnp.asarray([[margin * margin]], jnp.float32)

    # ---- stage 1: compact gather ----
    w_gather = timed("phase1 compact gather (XLA)", lambda: jax.block_until_ready(
        fg._compact_gather(cells, values_sorted, axes, jnp.float32(margin),
                           block, grid.shape, mc, C, 8)))
    cand = fg._compact_gather(cells, values_sorted, axes, jnp.float32(margin),
                              block, grid.shape, mc, C, 8)
    jax.block_until_ready(cand)

    qx, qy, qz = fg._build_queries(axes, block, dims, sz)
    jax.block_until_ready((qx, qy, qz))

    # ---- stage 2: fused Pallas eval ----
    w_pallas = timed("phase2 pallas tau-bisect eval", lambda: jax.block_until_ready(
        fg._fused_eval(m2, cand, qx, qy, qz, block, dims, sz, k, V, C,
                       "sibson", 2.0)))

    out = fg._fused_eval(m2, cand, qx, qy, qz, block, dims, sz, k, V, C,
                         "sibson", 2.0)
    w_reasm = timed("reassemble", lambda: jax.block_until_ready(
        fg._reassemble(out, block, dims, sz, grid.shape)))

    field8 = fg._reassemble(out, block, dims, sz, grid.shape)
    field, den = field8[..., :V], field8[..., V]

    w_repair = None
    for tag in ("first call this process", "warm"):
        t0 = time.time()
        rep = repair_empty_nodes(field, den, pts, values_dev, grid, k,
                                 "sibson", 2.0, cells=cells, margin=margin,
                                 values_sorted=values_sorted, block=block)
        jax.block_until_ready(rep)
        w_repair = time.time() - t0
        print(f"{'repair (' + tag + ')':34s} {w_repair:7.3f}s", flush=True)

    # ---- end-to-end warm ----
    def full():
        return jax.block_until_ready(fg.fused_grid_weighted_interpolate(
            pts, vals, grid, k, mode="sibson", block=block))
    w_full = timed("end-to-end fused (incl setup)", full)

    # ---- roofline model ----
    Q = nz * ny * nx
    panel_bytes = n_blocks * 8 * C * 4          # candidate store, f32
    # phase 1: read CSR rows once (~panel) + write panel
    ph1_bytes = 2 * panel_bytes
    # phase 2: read panel once per sub-tile (n_sub reads of (8, C)) +
    # queries + output; the 24 bisect passes hit VMEM only
    ph2_bytes = n_blocks * n_sub * (8 * C * 4 + 4 * Bt * 4) + Q * 8 * 4
    print("\nroofline model (f32 HBM traffic):")
    for label, b, w in (("phase1", ph1_bytes, w_gather),
                        ("phase2", ph2_bytes, w_pallas)):
        gbs = b / max(w, 1e-9) / 1e9
        print(f"  {label}: {b/1e9:6.2f} GB moved, {gbs:6.1f} GB/s achieved "
              f"= {gbs*1e9/HBM_PEAK*100:5.1f}% of v5e peak", flush=True)
    print(f"\nTOTAL warm ≈ setup {t_setup:.2f} + gather {w_gather:.2f} + "
          f"pallas {w_pallas:.2f} + reassemble {w_reasm:.2f} + repair "
          f"{w_repair:.2f} | end-to-end {w_full:.2f}s", flush=True)


if __name__ == "__main__":
    main()
