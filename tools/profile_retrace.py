#!/usr/bin/env python
"""Where the warm-cache fresh-process first call goes (VERDICT r4 task 5).

A CLI-shaped tool pays this cost every invocation: Python imports, the
axon/PJRT backend handshake, host problem setup, per-program tracing, and
compilation-cache reads (remote-compile only on a truly cold cache). This
script times each phase separately in ONE fresh process so BASELINE.md can
document the floor and what it is made of. Run twice back-to-back to
separate disk-cache reads (first) from OS page cache effects (second).
"""

import importlib
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_bench_cache"))

_t0 = time.time()


def mark(name, t0):
    w = time.time() - t0
    print(f"  {name:44s} {w:7.2f}s", flush=True)
    return time.time()


def main():
    t = _t0
    import numpy as np                                    # noqa: F401
    t = mark("import numpy", t)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    t = mark("import jax (no backend)", t)
    devs = jax.devices()
    t = mark(f"backend init / axon handshake ({devs[0].platform})", t)
    import jax.numpy as jnp
    x = jnp.ones((8, 128))
    jax.block_until_ready(x @ x.T)
    t = mark("first tiny dispatch (tunnel warm-up)", t)

    import bench
    t = mark("import bench + framework modules", t)
    pts, vals = bench.make_problem()
    t = mark("make_problem (host RNG, 1M rows)", t)

    from ptv_interpolation_tpu.grid import create_grid
    from ptv_interpolation_tpu.interpolate.knn_weights import (
        sibson_grid_interpolate)
    grid = create_grid(((0, bench.GRID_N + 1),) * 3, bench.GRID_N)
    out = sibson_grid_interpolate(pts, vals, grid, k=bench.K)
    jax.block_until_ready(out)
    t = mark("first full fused call (trace+cache-read+run)", t)
    out = sibson_grid_interpolate(pts, vals, grid, k=bench.K)
    jax.block_until_ready(out)
    t = mark("second full call (warm)", t)
    print(f"  {'TOTAL process wall':44s} {time.time() - _t0:7.2f}s",
          flush=True)


if __name__ == "__main__":
    main()
