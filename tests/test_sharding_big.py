"""8-device 128³ / 500k-point sharded-store parity run (VERDICT r4 task 1).

Production-shape evidence that the z-slab-sharded candidate store matches
the single-chip kernel bit-for-bit where covered and through the shared
repair path elsewhere — slab boundaries, panel capacities, and padding at
a realistic scale (the regular suite's sharding problems are 16³).

Heavy: several minutes of single-core CPU (the streaming kernel runs twice
over 2M queries × 500k points), so gated behind ``PTV_BIG_PARITY=1``:

    PTV_BIG_PARITY=1 python -m pytest tests/test_sharding_big.py -s

The measured run is recorded in BASELINE.md §multi-chip.
"""

import os

import numpy as np
import pytest

import jax

pytestmark = [
    pytest.mark.skipif(os.environ.get("PTV_BIG_PARITY") != "1",
                       reason="heavy (~10 min, 1-core host): set "
                              "PTV_BIG_PARITY=1 to run"),
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
]


def test_big_parity_128cubed_500k():
    from ptv_interpolation_tpu.grid import create_grid
    from ptv_interpolation_tpu.interpolate.knn_weights import (
        sibson_grid_interpolate,
    )
    from ptv_interpolation_tpu.parallel.mesh import make_mesh
    from ptv_interpolation_tpu.parallel.sharding import (
        sharded_grid_interpolate,
    )

    rng = np.random.default_rng(5)
    n = 500_000
    points = rng.uniform(0, 128, size=(n, 3)).astype(np.float32)
    values = np.stack([
        np.sin(points[:, 0] * 0.05),
        np.cos(points[:, 1] * 0.04),
        1.0 + 0.1 * np.sin(points[:, 2] * 0.03),
    ], axis=-1).astype(np.float32)
    grid = create_grid(((0, 129), (0, 129), (0, 129)), 128)
    mesh = make_mesh(8)

    k = 20
    got = np.asarray(sharded_grid_interpolate(
        points, values, grid, mesh, method="sibson", k=k, backend="xla"))
    want = np.asarray(sibson_grid_interpolate(
        points, values, grid, k=k, backend="xla"))

    assert np.isfinite(got).all()
    # covered nodes run the identical kernel on identical candidate sets
    # (rebased indices only) — expect agreement at f32 noise, not just
    # statistical closeness
    close = np.isclose(got, want, rtol=1e-5, atol=1e-6)
    assert close.mean() > 0.9999, f"only {close.mean():.6f} close"
    rel_l2 = (np.linalg.norm((got - want).ravel())
              / max(np.linalg.norm(want.ravel()), 1e-30))
    assert rel_l2 < 1e-5, rel_l2
    print(f"\n[big-parity] 128^3/500k 8-device: close={close.mean():.6f} "
          f"rel_l2={rel_l2:.2e}")

    # the memory claim at this scale: per-device window ≈ total/8 + halo
    from ptv_interpolation_tpu.ops.grid_knn import _host_setup
    from ptv_interpolation_tpu.parallel.slab_store import build_slab_store
    block = (8, 8, 16)
    (cells, values_sorted, axes, margin, mc, row_len, _vd) = _host_setup(
        points, values, grid, k, None, None, block, 1.45)
    z_slabs = np.asarray(grid.z, np.float32).reshape(8, 16)
    store = build_slab_store(cells, values_sorted, z_slabs, block[0],
                             grid.spacing[2], margin)
    frac = store.n_loc_np.max() / n
    print(f"[big-parity] max window rows {store.n_loc_np.max()} "
          f"({100 * frac:.1f}% of cloud), halo {store.halo:.2f} vox, "
          f"per-device store {store.per_device_bytes() / 1e6:.1f} MB")
    assert frac < 0.35   # 12.5% ownership + halo, far from replication
