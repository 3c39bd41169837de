"""Fused Pallas kernel for τ-threshold weighted grid interpolation.

One kernel instance = one grid block (bz·by·bx queries). The block's CSR
candidate rows are DMA'd from HBM into a VMEM panel once; the k-th-distance
threshold τ is found by *bisection counting* entirely in VMEM (multi-pass
algorithms are free there — this replaces ``approx_min_k``, the dominant
cost of the XLA path); weights overwrite the distance panel in place; the
reduction is one MXU matmul. Nothing per-query ever touches HBM.

Candidate storage is transposed host-side to ``(8, N)`` — rows
x,y,z,u,v,w,·,· — so row DMAs are lane-aligned ``(8, L)`` strided copies
and the panel math reads naturally in lanes.

Status (measured on v5e, 1M points → 256³, k=50): the kernel compiles and
runs correctly through the axon backend (27.7 s steady) but **loses to the
XLA τ-threshold path (8.8 s)**: Mosaic requires 128-lane-aligned DMA slices,
so every CSR row fetch pays a ≥128-column alignment floor while natural row
content is ~30–60 points — ~9× more panel work per query than the XLA
path's unaligned gathers. It is kept as an experimental backend
(``ops.grid_knn.grid_weighted_interpolate(backend='pallas')``): the
formulation wins when row content ≫ 128 (denser clouds / larger k), and it
documents the full Pallas DMA/bisection machinery for future kernels.

**Superseded by ``ops/fused_grid_knn.py``** (the production default on
TPU): the two-phase form keeps this kernel's VMEM bisection but replaces
the alignment-hobbled per-row DMAs with an XLA flat lane-gather into a
*compacted* panel — element-granular, no 128-lane floor — and beat both
this kernel and the streaming XLA path (3.7 s vs 27.7 s / 8.2 s at the
bench geometry). The streaming XLA path remains the cross-platform
correctness oracle (interpret-mode parity is tested in CI).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptv_interpolation_tpu.grid import Grid
from ptv_interpolation_tpu.ops.neighbors import build_cell_list

_BIG = 1e19


def _kernel(starts_hbm, q_hbm, cand_hbm, out_ref,
            starts_s, qv, cand, d2, dma_sems, *,
            R, L, B, k, mode, power, eps, bisect_iters):
    C = R * L
    i = pl.program_id(0)

    # ---- fetch this block's descriptors + query coords ----
    cp_s = pltpu.make_async_copy(starts_hbm.at[i], starts_s, dma_sems.at[R])
    cp_q = pltpu.make_async_copy(q_hbm.at[i], qv, dma_sems.at[R + 1])
    cp_s.start(); cp_q.start()
    cp_s.wait(); cp_q.wait()

    # ---- fetch the block's candidate rows (overlapped DMAs) ----
    # No validity mask is needed: the candidate store is padded with L
    # sentinel columns between CSR (z,y)-rows, so a fixed-length window
    # tail only ever reads same-row points (a harmless superset of the
    # candidate region — they are real cloud points) or far-away
    # sentinels. Duplicates across the block's rows are impossible.
    def start_dma(r):
        # align the window start down to the 128-lane boundary Mosaic
        # requires; the head slack reads same-row points (harmless
        # superset) and the store's inter-row gaps absorb the tail
        sa = (starts_s[r] // 128) * 128
        return pltpu.make_async_copy(
            cand_hbm.at[:, pl.ds(sa, L)],
            cand.at[:, pl.ds(r * L, L)],
            dma_sems.at[r],
        )

    for r in range(R):
        start_dma(r).start()
    for r in range(R):
        start_dma(r).wait()

    qx = qv[0, :]
    qy = qv[1, :]
    qz = qv[2, :]

    cx = cand[0, :]
    cy = cand[1, :]
    cz = cand[2, :]
    # accumulate in place: a single fused (B, C) expression needs ~3 panel
    # temporaries and blows the 16MB scoped-VMEM budget
    d2[:] = (qx[:, None] - cx[None, :]) ** 2
    d2[:] = d2[:] + (qy[:, None] - cy[None, :]) ** 2
    d2[:] = d2[:] + (qz[:, None] - cz[None, :]) ** 2

    # ---- τ via bisection counting (k-th smallest distance²) ----
    # upper bound = farthest *valid* candidate (sparse/boundary queries can
    # have their k-th neighbor beyond the nominal margin radius)
    lo = jnp.zeros((B, 1), jnp.float32)
    hi = jnp.max(jnp.where(d2[:] < _BIG * 0.5, d2[:], 0.0), axis=1,
                 keepdims=True) * (1.0 + 1e-6) + 1e-30
    for _ in range(bisect_iters):
        mid = 0.5 * (lo + hi)
        n_in = jnp.sum((d2[:] <= mid).astype(jnp.float32), axis=1,
                       keepdims=True)
        ge = n_in >= k
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid)
    tau = hi

    # ---- weights overwrite the panel in place ----
    sel = d2[:] <= tau
    if mode == "idw":
        if power == 2.0:
            w = 1.0 / (d2[:] + eps)
        else:
            w = 1.0 / (d2[:] ** (power * 0.5) + eps)
    else:  # sibson: inv-dist × exp(-(d - dmin)/std) over the selected set
        d = jnp.sqrt(jnp.maximum(d2[:], 0.0))
        d_sel = jnp.where(sel, d, 0.0)
        n_sel = jnp.maximum(jnp.sum(sel.astype(jnp.float32), axis=1,
                                    keepdims=True), 1.0)
        s1 = jnp.sum(d_sel, axis=1, keepdims=True) / n_sel
        s2 = jnp.sum(d_sel * d_sel, axis=1, keepdims=True) / n_sel
        std = jnp.sqrt(jnp.maximum(s2 - s1 * s1, 0.0))
        dmin = jnp.min(jnp.where(sel, d, _BIG), axis=1, keepdims=True)
        w = (1.0 / (d + eps)) * jnp.exp(-(d - dmin) / (std + eps))
    d2[:] = jnp.where(sel, w, 0.0)

    # ---- fused reduction: (B, C) × (3, C)ᵀ on the MXU (lane contraction,
    # no transpose materialized) ----
    num = jax.lax.dot_general(
        d2[:], cand[3:6, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (B, 3)
    den = jnp.sum(d2[:], axis=1, keepdims=True)
    out_ref[0, :, :] = num / jnp.maximum(den, 1e-37)


@functools.partial(jax.jit, static_argnames=(
    "R", "L", "B", "k", "mode", "power", "bisect_iters", "interpret"))
def _pallas_eval(starts, q_all, cand_hbm,
                 R, L, B, k, mode, power, bisect_iters, interpret):
    n_blocks = starts.shape[0]

    kern = functools.partial(
        _kernel, R=R, L=L, B=B, k=k, mode=mode, power=power, eps=1e-10,
        bisect_iters=bisect_iters)

    out = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # starts (n_blocks, R)
            pl.BlockSpec(memory_space=pltpu.HBM),   # q (n_blocks, 3, B)
            pl.BlockSpec(memory_space=pltpu.HBM),   # candidate store (8, ·)
        ],
        out_specs=pl.BlockSpec((1, B, 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, B, 3), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((128,), jnp.int32),
            pltpu.VMEM((8, B), jnp.float32),
            pltpu.VMEM((8, R * L), jnp.float32),
            pltpu.VMEM((B, R * L), jnp.float32),
            pltpu.SemaphoreType.DMA((R + 4,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, q_all, cand_hbm)
    return out


def pallas_grid_weighted_interpolate(points, values, grid: Grid, k: int,
                                     mode: str = "sibson",
                                     power: float = 2.0,
                                     block: Tuple[int, int, int] = (2, 8, 8),
                                     margin_factor: float = 1.45,
                                     row_pad: int = 128,
                                     bisect_iters: int = 14,
                                     interpret: bool = False):
    """IDW/sibson interpolation onto ``grid`` via the fused Pallas kernel.

    Host side mirrors ``ops.grid_knn._host_setup``: cell list, static
    candidate-region dims, per-block CSR starts/counts, axes reshaped into
    per-block slices, and the transposed (8, N) candidate store
    [x, y, z, u, v, w, 0, 0].
    """
    pts = np.asarray(points, np.float32)
    vals = np.asarray(values, np.float32)
    n = pts.shape[0]
    assert vals.shape[1] == 3

    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    extent = np.maximum(hi - lo, 1e-12)
    density = n / float(np.prod(extent))
    r_k = (3.0 * k / (4.0 * math.pi * density)) ** (1.0 / 3.0)
    cell_size = max(r_k * margin_factor, 1e-6)   # coarse: few, fat rows
    cells = build_cell_list(pts, cell_size=cell_size)
    margin = r_k * margin_factor

    bz, by, bx = block
    dx, dy, dz = grid.spacing
    mc = tuple(int(math.ceil((ext + 2.0 * margin) / cell_size)) + 1
               for ext in (bz * dz, by * dy, bx * dx))   # z, y, x
    mcz, mcy, mcx = mc
    R = mcz * mcy

    ncx, ncy, ncz = cells.dims
    starts_np = np.asarray(cells.starts)

    # static row length (max over mcx-wide windows), padded for lane alignment
    row_counts = np.diff(starts_np.astype(np.int64)).reshape(ncz * ncy, ncx)
    w_win = min(mcx, ncx)
    csum = np.concatenate([np.zeros((row_counts.shape[0], 1), np.int64),
                           np.cumsum(row_counts, axis=1)], axis=1)
    windows = csum[:, w_win:] - csum[:, :-w_win] if ncx > w_win \
        else csum[:, -1:]
    content_max = int(windows.max()) if windows.size else 1
    # fetch = content + ≤127 alignment slack, rounded to full lanes
    L = ((content_max + 127 + 127) // 128) * 128

    # per-block CSR starts/counts (host, vectorized over the block lattice)
    def _blocks(n_pts, b):
        return (n_pts + b - 1) // b

    nbz, nby, nbx = _blocks(grid.nz, bz), _blocks(grid.ny, by), _blocks(grid.nx, bx)

    def pad_axis(ax, b, nb):
        out = np.zeros(nb * b, np.float32)
        out[: len(ax)] = ax
        if len(ax) < nb * b and len(ax) > 1:
            step = ax[1] - ax[0]
            out[len(ax):] = ax[-1] + step * np.arange(1, nb * b - len(ax) + 1)
        return out.reshape(nb, b)

    x_blk = pad_axis(grid.x, bx, nbx)
    y_blk = pad_axis(grid.y, by, nby)
    z_blk = pad_axis(grid.z, bz, nbz)

    blo_x = x_blk[:, 0]
    blo_y = y_blk[:, 0]
    blo_z = z_blk[:, 0]
    origin = np.asarray(cells.origin)
    inv = float(np.asarray(cells.inv_cell)[0])
    base_x = np.floor((blo_x - margin - origin[0]) * inv).astype(np.int64)
    base_y = np.floor((blo_y - margin - origin[1]) * inv).astype(np.int64)
    base_z = np.floor((blo_z - margin - origin[2]) * inv).astype(np.int64)

    roz, roy = np.meshgrid(np.arange(mcz), np.arange(mcy), indexing="ij")
    roz = roz.ravel()
    roy = roy.ravel()
    # (nbz, nby, nbx, R) row descriptors
    cz = base_z[:, None, None, None] + roz[None, None, None, :]
    cy = base_y[None, :, None, None] + roy[None, None, None, :]
    cz = np.broadcast_to(cz, (nbz, nby, nbx, R))
    cy = np.broadcast_to(cy, (nbz, nby, nbx, R))
    row_ok = (cz >= 0) & (cz < ncz) & (cy >= 0) & (cy < ncy)
    x0 = np.clip(base_x, 0, ncx)[None, None, :, None]
    x1 = np.clip(base_x + mcx, 0, ncx)[None, None, :, None]
    # gapped candidate store: L sentinel columns between every CSR
    # (z, y)-row so fixed-length window tails never cross into another
    # row (→ no duplicates, no validity mask needed in the kernel)
    n_csr_rows = ncz * ncy
    order = np.asarray(cells.order)
    cell_of_sorted = np.repeat(np.arange(len(starts_np) - 1),
                               np.diff(starts_np.astype(np.int64)))
    rowidx_of_sorted = (cell_of_sorted // ncx).astype(np.int64)
    new_pos = np.arange(n, dtype=np.int64) + rowidx_of_sorted * L
    store_w = ((n + n_csr_rows * L + 2 * L + 127) // 128) * 128
    store = np.full((8, store_w), _BIG, np.float32)
    store[0:3, new_pos] = pts[order].T
    store[3:6, new_pos] = vals[order].T
    store[6:8, new_pos] = 0.0

    # per-block window starts in gapped coordinates; sentinel-region start
    # for out-of-range rows
    rid = (cz * ncy + cy) * ncx
    s_idx = np.where(row_ok, rid + np.broadcast_to(x0, rid.shape), 0)
    gap_shift = np.where(row_ok, (rid // ncx) * L, 0)
    starts = (starts_np[s_idx].astype(np.int64) + gap_shift)
    # out-of-range rows point at the trailing all-sentinel columns
    starts = np.where(row_ok, starts, store_w - L).astype(np.int32)
    starts = starts.reshape(-1, R)
    if R > 128:
        raise ValueError(f"candidate region has {R} rows (>128); use a "
                         f"coarser cell size or smaller blocks")
    # pad rows to the full 128-lane width (Mosaic requires lane-aligned
    # HBM slices for the descriptor DMA)
    starts = np.pad(starts, ((0, 0), (0, 128 - R)),
                    constant_values=store_w - L)
    assert store_w - L >= 0 and (store_w % 128) == 0

    # per-block query coordinates, lane-aligned (n_blocks, 3, B)
    B = bz * by * bx
    qx = np.broadcast_to(x_blk[None, None, :, None, None, :],
                         (nbz, nby, nbx, bz, by, bx))
    qy = np.broadcast_to(y_blk[None, :, None, None, :, None],
                         (nbz, nby, nbx, bz, by, bx))
    qz = np.broadcast_to(z_blk[:, None, None, :, None, None],
                         (nbz, nby, nbx, bz, by, bx))
    q_all = np.zeros((nbz * nby * nbx, 8, B), np.float32)
    q_all[:, 0] = qx.reshape(-1, B)
    q_all[:, 1] = qy.reshape(-1, B)
    q_all[:, 2] = qz.reshape(-1, B)

    out = _pallas_eval(jnp.asarray(starts),
                       jnp.asarray(q_all), jnp.asarray(store),
                       R, L, B, k, mode, float(power),
                       int(bisect_iters), bool(interpret))
    out = np.asarray(out).reshape(nbz, nby, nbx, bz, by, bx, 3)
    out = out.transpose(0, 3, 1, 4, 2, 5, 6).reshape(
        nbz * bz, nby * by, nbx * bx, 3)
    return out[: grid.nz, : grid.ny, : grid.nx]
