#!/usr/bin/env python
"""Multi-chip scaling evidence on the virtual CPU mesh (VERDICT r1 item 10).

Runs the two sharded hot paths — the block-centric grid kernel
(`parallel/sharding.py::sharded_grid_interpolate`) and z-slab projection
cleaning (`physics.py::clean_divergence_projection` under GSPMD z-sharding)
— at 1/2/4/8 devices on the SAME problem and reports wall-clock plus parity
vs the single-device result.

Interpretation on this container (ONE physical core): the N virtual CPU
devices time-slice a single core, so total wall-clock cannot shrink;
what the table measures is the *sharding overhead factor*
``wall(N) / wall(1)`` — the cost of the slab padding, the replicated-cell
broadcast, and the GSPMD halo exchanges relative to the single-device
program. A factor near 1.0 is the evidence that per-slab work is
embarrassingly parallel (the kernel) or halo-bounded (the stencils), i.e.
that on N real chips the wall-clock is ~work/N + the measured overhead.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python benchmarks/weak_scaling.py
(the script applies both itself if it can).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    # the shared helper applies XLA_FLAGS + the jax_platforms pin AND
    # fails loudly if a non-CPU backend was initialized first
    import __graft_entry__
    jax = __graft_entry__._force_virtual_cpu(8)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ptv_interpolation_tpu.grid import create_grid
    from ptv_interpolation_tpu.parallel.mesh import DATA_AXIS
    from ptv_interpolation_tpu.parallel.sharding import sharded_grid_interpolate
    from ptv_interpolation_tpu.physics import clean_divergence_projection

    devices = np.asarray(jax.devices())
    assert len(devices) >= 8, f"need 8 virtual devices, have {len(devices)}"

    # ---- problem: 60k points -> 64^3 grid, gyroid mask for cleaning ----
    # (sized for this container's single physical core: the N virtual
    # devices time-slice it, so wall-clock scales with TOTAL work)
    rng = np.random.default_rng(0)
    n = 64
    pts = rng.uniform(0, n, size=(60_000, 3)).astype(np.float32)
    vals = np.stack([
        np.sin(pts[:, 0] * 0.1), np.cos(pts[:, 1] * 0.08),
        1.0 + 0.1 * np.sin(pts[:, 2] * 0.06)], -1).astype(np.float32)
    grid = create_grid(((0, n + 1),) * 3, n)
    ax = np.arange(n) - n / 2
    Z, Y, X = np.meshgrid(ax, ax, ax, indexing="ij")
    fluid = (np.sin(X * 0.1) * np.sin(Y * 0.13) * np.sin(Z * 0.07)) <= 0.55

    rows = []
    ref_interp = None
    ref_clean = None
    for n_dev in (1, 2, 4, 8):
        mesh = Mesh(devices[:n_dev], (DATA_AXIS,))

        # ---- sharded headline kernel ----
        out = sharded_grid_interpolate(pts, vals, grid, mesh, k=30)
        jax.block_until_ready(out)           # compile + warmup
        t0 = time.time()
        out = sharded_grid_interpolate(pts, vals, grid, mesh, k=30)
        jax.block_until_ready(out)
        t_interp = time.time() - t0
        o = np.asarray(out)
        if ref_interp is None:
            ref_interp = o
        interp_dev = float(np.abs(o - ref_interp).max())

        # ---- z-slab projection cleaning ----
        zshard = NamedSharding(mesh, P(DATA_AXIS))
        U = jax.device_put(jnp.asarray(o[..., 0] * fluid), zshard)
        V = jax.device_put(jnp.asarray(o[..., 1] * fluid), zshard)
        W = jax.device_put(jnp.asarray(o[..., 2] * fluid), zshard)
        M = jax.device_put(jnp.asarray(fluid), zshard)
        res = clean_divergence_projection(U, V, W, M, 1.0, 1.0, 1.0,
                                          iterations=1, maxiter=60)
        jax.block_until_ready(res.u)         # compile + warmup
        t0 = time.time()
        res = clean_divergence_projection(U, V, W, M, 1.0, 1.0, 1.0,
                                          iterations=1, maxiter=60)
        jax.block_until_ready(res.u)
        t_clean = time.time() - t0
        c = np.asarray(res.u)
        if ref_clean is None:
            ref_clean = c
        clean_dev = float(np.abs(c - ref_clean).max())

        rows.append(dict(devices=n_dev,
                         interp_s=round(t_interp, 2),
                         interp_overhead=round(t_interp / rows[0]["interp_s"], 2) if rows else 1.0,
                         clean_s=round(t_clean, 2),
                         clean_overhead=round(t_clean / rows[0]["clean_s"], 2) if rows else 1.0,
                         interp_max_dev=interp_dev,
                         clean_max_dev=clean_dev))
        print(f"devices={n_dev}  kernel {t_interp:6.2f}s "
              f"(x{rows[-1]['interp_overhead']:.2f})  cleaning {t_clean:6.2f}s "
              f"(x{rows[-1]['clean_overhead']:.2f})  "
              f"parity dev: {interp_dev:.2e} / {clean_dev:.2e}", flush=True)

    print(json.dumps({"note": "single-core host: overhead factor, not speedup",
                      "rows": rows}))


if __name__ == "__main__":
    main()
