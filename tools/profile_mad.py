#!/usr/bin/env python
"""Stage breakdown of the fused kNN-MAD filter (VERDICT r4 item 4).

Replicates the scenario-3 filter problem (500k porous-cloud points,
k=25, threshold=3) and times each stage of
``ops/fused_mad.fused_mad_filter`` by running the same private helpers
in sequence, synchronizing between stages. Run on the TPU env:

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_mad.py [n_points]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def main(n_points=500_000):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks"))
    from scenarios import porous_problem

    from ptv_interpolation_tpu.ops import fused_mad as fm
    from ptv_interpolation_tpu.ops.neighbors import build_cell_list

    pts, vals, _ = porous_problem(n_points, 128)
    rng = np.random.default_rng(3)
    out_idx = rng.choice(len(pts), 1000, replace=False)
    vals = vals.copy()
    vals[out_idx] *= 20.0
    speed = np.sqrt((vals * vals).sum(axis=-1))

    k, threshold = 25, 3.0
    margin_factor = 1.9

    def timed(label, fn, *a, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        jax.block_until_ready(out) if hasattr(out, "block_until_ready") or (
            isinstance(out, (tuple, list)) and any(
                hasattr(o, "block_until_ready") for o in out)) else None
        dt = time.time() - t0
        print(f"  {label:38s} {dt * 1e3:9.1f} ms")
        return out, dt

    for rep in range(3):
        print(f"--- pass {rep} ({'cold' if rep == 0 else 'warm'}) ---")
        total0 = time.time()
        s = speed
        n = pts.shape[0]

        t0 = time.time()
        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
        extent = np.maximum(hi - lo, 1e-12)
        density = n / float(np.prod(extent))
        r_k = (3.0 * (k + 1) / (4.0 * math.pi * density)) ** (1.0 / 3.0)
        margin = r_k * margin_factor
        cell_size = max(margin / 3.0, 1e-6)
        cells = build_cell_list(pts, cell_size=cell_size, build_table=False)
        print(f"  {'host: build_cell_list':38s} {(time.time()-t0)*1e3:9.1f} ms")

        t0 = time.time()
        edge = 2.0 * margin
        dims = np.maximum(np.ceil(extent / edge).astype(int), 1)
        bidx = np.clip(((pts - lo) / edge).astype(np.int64), 0, dims - 1)
        bid = (bidx[:, 2] * dims[1] + bidx[:, 1]) * dims[0] + bidx[:, 0]
        order = np.argsort(bid, kind="stable")
        sorted_bid = bid[order]
        uniq, inv_start = np.unique(sorted_bid, return_index=True)
        counts = np.diff(np.append(inv_start, len(sorted_bid)))
        b_cap = int(counts.max())
        Bt = max((b_cap + 127) // 128 * 128, 128)
        n_blocks = len(uniq)
        q_table = np.full((n_blocks, Bt), n, np.int64)
        rank = np.arange(len(sorted_bid)) - np.repeat(inv_start, counts)
        q_table[np.repeat(np.arange(n_blocks), counts), rank] = order
        print(f"  {'host: block bucketing + q_table':38s} {(time.time()-t0)*1e3:9.1f} ms")

        t0 = time.time()
        mc = tuple(int(math.ceil((edge + 2.0 * margin) / cell_size)) + 1
                   for _ in range(3))
        C_raw = fm._lattice_capacity(cells, lo, edge, dims, uniq, margin, mc)
        C = max((C_raw + 127) // 128 * 128, 128)
        print(f"  {'host: _lattice_capacity':38s} {(time.time()-t0)*1e3:9.1f} ms"
              f"   (Bt={Bt}, C={C}, blocks={n_blocks})")

        uz = uniq // (dims[1] * dims[0])
        uy = (uniq // dims[0]) % dims[1]
        ux = uniq % dims[0]
        lo_blocks = (lo[None, :].astype(np.float32)
                     + np.stack([ux, uy, uz], axis=-1).astype(np.float32)
                     * np.float32(edge))

        t0 = time.time()
        speed_sorted = jnp.concatenate(
            [jnp.asarray(s)[cells.order], jnp.zeros((1024,), jnp.float32)])
        store = fm._build_store_t(cells.points_sorted, speed_sorted)
        jax.block_until_ready(store)
        print(f"  {'dev: build store':38s} {(time.time()-t0)*1e3:9.1f} ms")

        t0 = time.time()
        G = fm._compact_indices_scatter(cells, jnp.asarray(lo_blocks),
                                        jnp.float32(margin), mc, C)
        jax.block_until_ready(G)
        print(f"  {'dev: compact indices':38s} {(time.time()-t0)*1e3:9.1f} ms")

        t0 = time.time()
        cand = jnp.take(store, G.reshape(-1), axis=1)
        jax.block_until_ready(cand)
        print(f"  {'dev: panel gather':38s} {(time.time()-t0)*1e3:9.1f} ms")

        t0 = time.time()
        qrs_pad = jnp.asarray(np.concatenate(
            [pts, np.full((1, 3), 1e19, np.float32)]))
        speed_pad = jnp.asarray(np.concatenate([s.astype(np.float32),
                                                np.zeros(1, np.float32)]))
        qx, qy, qz, qs = fm._gather_queries(qrs_pad, speed_pad,
                                            jnp.asarray(q_table, jnp.int32))
        jax.block_until_ready(qs)
        print(f"  {'dev: gather queries':38s} {(time.time()-t0)*1e3:9.1f} ms")

        t0 = time.time()
        sm = jnp.asarray([[margin * margin]], jnp.float32)
        out = fm._mad_eval(sm, cand, qx, qy, qz, qs, int(k), float(threshold),
                           Bt, C)
        jax.block_until_ready(out)
        print(f"  {'dev: _mad_eval kernel':38s} {(time.time()-t0)*1e3:9.1f} ms")

        t0 = time.time()
        packed_dev, radius_dev, _ = fm._post(out, n)
        packed = np.asarray(packed_dev)
        keep = np.ones(n, bool)
        covered = np.zeros(n, bool)
        flat_idx = q_table.reshape(-1)
        valid = flat_idx < n
        keep[flat_idx[valid]] = (packed & 1)[valid] > 0
        covered[flat_idx[valid]] = (packed & 2)[valid] > 0
        print(f"  {'dev+host: post/pull/scatter-back':38s} {(time.time()-t0)*1e3:9.1f} ms")

        n_unc = int((~covered).sum())
        print(f"  uncovered={n_unc}  removed={int((~keep).sum())}"
              f"  total={time.time()-total0:.3f} s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000)
