#!/usr/bin/env python
"""Measure the reference SciPy path on the headline benchmark problem.

Reproduces the reference's sibson interpolation
(`/root/reference/interpolator.py:83-124`): KDTree k=50 query over all
256³ grid nodes (all host cores) + the smoothed-IDW weights, on the same
1M-point problem `bench.py` uses. The resulting wall-clock is recorded as
``REFERENCE_SECONDS`` in bench.py / BASELINE.md.
"""

import sys
import time

import numpy as np
from scipy.spatial import KDTree

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import GRID_N, K, make_problem  # noqa: E402


def main():
    pts, vals = make_problem()
    pts64 = pts.astype(np.float64)
    g = np.linspace(0, GRID_N - 1, GRID_N)

    t_start = time.time()
    tree = KDTree(pts64)
    t_build = time.time() - t_start
    print(f"KDTree build: {t_build:.1f}s", flush=True)

    eps = 1e-10
    t0 = time.time()
    for iz in range(GRID_N):
        flat = np.stack([
            np.broadcast_to(g[None, :], (GRID_N, GRID_N)).ravel(),
            np.broadcast_to(g[:, None], (GRID_N, GRID_N)).ravel(),
            np.full(GRID_N * GRID_N, g[iz]),
        ], axis=-1)
        dist, idx = tree.query(flat, k=K, workers=-1)
        inv = 1.0 / (dist + eps)
        w = inv / inv.sum(1, keepdims=True)
        std = dist.std(1, keepdims=True)
        w = w * np.exp(-dist / (std + eps))
        w /= w.sum(1, keepdims=True)
        np.einsum("qk,qkc->qc", w, vals[idx])
        if iz == 15:
            el = time.time() - t0
            print(f"  16/{GRID_N} slabs in {el:.1f}s "
                  f"-> projected: {el * GRID_N / 16:.1f}s", flush=True)
    total = time.time() - t_start
    print(f"scipy reference total: {total:.1f}s")


if __name__ == "__main__":
    main()
