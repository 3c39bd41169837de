"""Fused two-phase grid kNN: compact candidate gather (XLA) + VMEM-resident
τ-bisection weighted sum (Pallas).

Why this exists — the roofline of the one-phase XLA kernel
(``ops/grid_knn.py::_grid_block_weighted_sum``): its (B, C) distance panel
(≈16 MB at the 1M→256³/k=50 bench geometry) is materialized in HBM and
re-streamed by each of the 24 τ-bisection counting passes, ≈6–7 TB of HBM
traffic over the 16 384 blocks — at v5e's ~0.8 TB/s that IS the measured
~8 s wall. This module restructures the same math so the panel is read
O(1) times from HBM:

* **Phase 1 (XLA)** gathers each block's candidate rows once and writes a
  *compacted* per-block panel ``(n_blocks, 8, C)`` — rows x,y,z,u,v,w,0,0,
  invalid slots filled with far sentinels. Compaction (cumsum over the
  block's CSR rows + a vectorized slot→row search) shrinks C from
  ``n_rows × row_capacity`` (max-padded, ~4k) to the actual candidate
  count (~1.3k): ~3× less panel work for phase 2.
* **Phase 2 (Pallas)** runs per block entirely in VMEM: the (Bt, C)
  distance sub-panel is built once in scratch, the 24 bisection passes are
  a ``lax.fori_loop`` over that VMEM panel (multi-pass is free on-chip),
  weights and the exact per-channel f32 VPU reductions follow in place.
  HBM traffic per block collapses from ~400 MB to ~50 KB.

Selection math is identical to the XLA path's ``tau_mode='bisect'``
(monotone counting of ``#{d² ≤ t}``, 24 halvings of [0, margin²] — exact
k-th distance to ~margin²·2⁻²⁴, i.e. parity-equivalent to exact top-k),
and the coverage sentinel / ``repair_empty_nodes`` escape hatch is shared
unchanged. The 24 unrolled compare+reduce passes that inflated the XLA
HLO (and drove the ~10-minute cold remote compiles recorded in round 2)
become one small fori_loop in Mosaic.

Reference parity target: the sibson/IDW weight math of
`/root/reference/interpolator.py:83-155` (same formulas as
``interpolate/knn_weights.py``).
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


_SENTINEL = 1e19          # sentinel coordinate → d² ≈ 1e38, never selected
_EPS = 1e-10              # reference's weight epsilon (interpolator.py:106)
_BISECT_ITERS = 24


def _block_counts(n: int, b: int) -> int:
    return (n + b - 1) // b


# ---------------------------------------------------------------------------
# Phase 1: compact candidate gather (XLA)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "block", "grid_shape", "mc", "C", "group"))
def _compact_indices(cells, axes, margin,
                     block: Tuple[int, int, int],
                     grid_shape: Tuple[int, int, int],
                     mc: Tuple[int, int, int], C: int, ids=None,
                     group: int = 64):
    """Per grid block: the (C,) compacted candidate source-row indices
    (slots past the block's candidate count point at the sentinel row).
    Pure index arithmetic — no gathers — so XLA fuses it into a fast
    elementwise program. Returns (n_blocks, C) int32.

    ``ids`` (optional, (n_sel,) int32): evaluate only these flat block
    indices — the repair path reruns the kernel at a widened margin over
    just the blocks containing uncovered nodes."""
    bz, by, bx = block
    nz, ny, nx = grid_shape
    nbz, nby, nbx = (_block_counts(nz, bz), _block_counts(ny, by),
                     _block_counts(nx, bx))
    mcz, mcy, mcx = mc
    ncx, ncy, ncz = cells.dims
    x_ax, y_ax, z_ax = axes
    n_sent = cells.n_points            # first sentinel row index

    roz = jax.lax.broadcasted_iota(jnp.int32, (mcz, mcy), 0).ravel()
    roy = jax.lax.broadcasted_iota(jnp.int32, (mcz, mcy), 1).ravel()
    slots = jnp.arange(C, dtype=jnp.int32)

    def one_block(flat_idx):
        ibz = flat_idx // (nby * nbx)
        iby = (flat_idx // nbx) % nby
        ibx = flat_idx % nbx
        lo = jnp.stack([x_ax[ibx * bx], y_ax[iby * by], z_ax[ibz * bz]])
        base = jnp.floor(
            (lo - margin - cells.origin) * cells.inv_cell).astype(jnp.int32)
        cz = base[2] + roz
        cy = base[1] + roy
        row_ok = (cz >= 0) & (cz < ncz) & (cy >= 0) & (cy < ncy)
        x0 = jnp.clip(base[0], 0, ncx)
        x1 = jnp.clip(base[0] + mcx, 0, ncx)
        rid = (cz * ncy + cy) * ncx
        start = jnp.where(row_ok, cells.starts[rid + x0], 0)
        end = jnp.where(row_ok, cells.starts[rid + x1], 0)
        cnt = end - start                                     # (R,)

        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)])    # (R+1,)
        # slot → source row: #(offsets[1:] <= slot) — R is small (~50), the
        # dense compare+sum beats a binary search on the VPU
        row = jnp.sum((slots[:, None] >= offsets[None, 1:]).astype(jnp.int32),
                      axis=1)                                  # (C,)
        valid = slots < offsets[-1]
        g = start[row] + (slots - offsets[row])
        return jnp.where(valid, g, n_sent)   # sentinel row: coords 1e19

    if ids is None:
        ids = jnp.arange(nbz * nby * nbx, dtype=jnp.int32)
    n_blocks = ids.shape[0]
    # bound the (g, C, R) row-search intermediate per map step — a bare
    # vmap over every block would let a non-fused compare tensor reach GBs
    g = group
    while n_blocks % g:
        g //= 2
    out = jax.lax.map(jax.vmap(one_block), ids.reshape(-1, g))
    return out.reshape(n_blocks, C)


@jax.jit
def _build_pts8_t(points_sorted, values_sorted):
    """(8, N+pad) transposed candidate store [x,y,z,u,v,w,0,0]: the lane
    layout the flat panel gather and the Pallas kernel both want. Sentinel
    rows carry 1e19 coords (from ``points_sorted``'s padding) and zero
    values (``values_sorted``'s padding), so compaction needs no explicit
    validity channel."""
    V = values_sorted.shape[1]
    n = points_sorted.shape[0]
    z = jnp.zeros((8 - 3 - V, n), jnp.float32)
    return jnp.concatenate([points_sorted.T, values_sorted.T, z], axis=0)


@jax.jit
def _panel_take(pts8_t, G):
    """One flat lane-gather: (8, N) taken at (n_blocks·C,) indices →
    (8, n_blocks·C). A single big gather runs ~6× faster on TPU than the
    per-block ``lax.map`` gathers it replaces (measured 0.22 s vs 1.34 s
    for the 1M→256³ panel), and the lane-major result needs no transpose:
    the Pallas kernel windows the lane axis directly via its BlockSpec."""
    return jnp.take(pts8_t, G.reshape(-1), axis=1)


def _compact_gather(cells, values_sorted, axes, margin,
                    block: Tuple[int, int, int],
                    grid_shape: Tuple[int, int, int],
                    mc: Tuple[int, int, int], C: int, group: int = 64,
                    ids=None, pts8_t=None):
    """Candidate panel for the fused kernel: (8, n_blocks·C) lane-major,
    rows [x, y, z, u, v, w, 0, 0]; invalid slots hold far-sentinel coords
    and zero values. ``group`` bounds the (group, C, R) slot-search
    intermediate of the index stage."""
    if pts8_t is None:
        pts8_t = _build_pts8_t(cells.points_sorted, values_sorted)
    G = _compact_indices(cells, axes, margin, block, grid_shape, mc, C,
                         ids=ids, group=group)
    return _panel_take(pts8_t, G)


# ---------------------------------------------------------------------------
# Phase 2: fused VMEM panel kernel (Pallas)
# ---------------------------------------------------------------------------

def _fused_kernel(m2_ref, cand_ref, qx_ref, qy_ref, qz_ref, out_ref,
                  d2, dd, *, block, dims, sz, k, V, mode, power):
    bz, by, bx = block
    Bt = sz * by * bx

    cx = cand_ref[0, :]
    cy = cand_ref[1, :]
    cz = cand_ref[2, :]

    # flat query coordinates for this (block, sub-tile), prebuilt in XLA —
    # Mosaic cannot relayout lane vectors across the query axes, so the
    # (tz, ty, tx) → row flattening happens outside the kernel
    qx = qx_ref[0, 0, :]                                        # (Bt,)
    qy = qy_ref[0, 0, :]
    qz = qz_ref[0, 0, :]

    # distance panel, built once in VMEM scratch (accumulated in place to
    # bound Mosaic's temporary count)
    d2[:] = (qx[:, None] - cx[None, :]) ** 2
    d2[:] = d2[:] + (qy[:, None] - cy[None, :]) ** 2
    d2[:] = d2[:] + (qz[:, None] - cz[None, :]) ** 2

    m2 = m2_ref[0, 0]
    kf = jnp.float32(k)
    # coverage sentinel: #candidates inside the margin ≥ k ⟺ the true k-th
    # distance ≤ margin (guaranteed-radius property) — identical to the XLA
    # path's sentinel; counts fit f32 exactly (C < 2^24)
    cnt_in = jnp.sum((d2[:] <= m2).astype(jnp.float32), axis=1, keepdims=True)
    covered = cnt_in >= kf

    # exact τ by monotone counting: 24 halvings of [0, margin²] pin the
    # k-th distance below the f32 spacing of any realistic d² — all passes
    # read the VMEM-resident panel, no HBM traffic
    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        c = jnp.sum((d2[:] <= mid).astype(jnp.float32), axis=1,
                    keepdims=True)
        short = c < kf
        return (jnp.where(short, mid, lo), jnp.where(short, hi, mid))

    lo0 = jnp.zeros((Bt, 1), jnp.float32)
    hi0 = jnp.full((Bt, 1), 1.0, jnp.float32) * m2
    _, tau2 = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo0, hi0))

    # the τ mask is evaluated in the SQUARED domain (sel = d² ≤ τ²), the
    # domain the bisection searched: Mosaic's sqrt is not correctly
    # rounded, and re-deriving the mask as sqrt(d²) ≤ sqrt(τ²) dropped the
    # k-th neighbor (whose d² sits within an ulp of τ² by construction)
    # for ~1.4% of queries — n_sel 49, a 1e-4-scale weight error each
    sel = d2[:] <= tau2
    dd[:] = jnp.sqrt(jnp.maximum(d2[:], 0.0))

    if mode == "idw":
        if power == 2.0:
            dd[:] = jnp.where(sel, 1.0 / (dd[:] * dd[:] + _EPS), 0.0)
        else:
            dd[:] = jnp.where(sel, 1.0 / (dd[:] ** power + _EPS), 0.0)
    else:
        # sibson (`interpolator.py:102-116`): masked mean/std/min of the
        # k-set distances, then inv-dist × shifted-exp smoothing. Stats are
        # panel reductions; only then is the panel overwritten by weights.
        okf = sel.astype(jnp.float32)
        n_ok = jnp.maximum(jnp.sum(okf, axis=1, keepdims=True), 1.0)
        s1 = jnp.sum(jnp.where(sel, dd[:], 0.0), axis=1, keepdims=True)
        mean = s1 / n_ok
        # two-pass masked ddof=0 variance, NOT E[d²]−E[d]²: the one-pass
        # form cancels (std/mean)² ≈ 1e-2 of the mantissa and the resulting
        # ~1e-5 std error leaks through exp(-(d-dmin)/std) into the weights
        # (measured: headline L2 parity 1.8e-5 one-pass vs 1.1e-7 two-pass)
        var = jnp.sum(jnp.where(sel, (dd[:] - mean) ** 2, 0.0), axis=1,
                      keepdims=True) / n_ok
        std = jnp.sqrt(var)
        dmin = jnp.min(jnp.where(sel, dd[:], 3.4e38), axis=1, keepdims=True)
        dmin = jnp.where(dmin > 1e18, 0.0, dmin)
        dd[:] = jnp.where(
            sel,
            (1.0 / (dd[:] + _EPS))
            * jnp.exp(-(dd[:] - dmin) / (std + _EPS)), 0.0)

    den = jnp.sum(dd[:], axis=1)                                # (Bt,)
    inv_den = 1.0 / jnp.maximum(den, 1e-37)
    # exact per-channel f32 VPU reductions (no MXU rounding)
    for c in range(V):
        num = jnp.sum(dd[:] * cand_ref[3 + c, :][None, :], axis=1)
        out_ref[0, 0, c, :] = num * inv_den
    out_ref[0, 0, V, :] = jnp.where(covered[:, 0], den, 0.0)
    for c in range(V + 1, 8):
        out_ref[0, 0, c, :] = jnp.zeros((Bt,), jnp.float32)


@functools.partial(jax.jit, static_argnames=("block", "dims", "sz"))
def _build_queries(axes, block, dims, sz, ids=None):
    """Flat per-(block, sub-tile) query coordinate rows, (n_rows, 1, Bt)
    each for x/y/z — the (ibz, iby, ibx, j, tz, ty, tx) flattening the
    Pallas kernel cannot do in-register. With ``ids`` (n_sel,), rows are
    built only for those flat block indices."""
    bz, by, bx = block
    nbz, nby, nbx = dims
    n_sub = bz // sz
    Bt = sz * by * bx
    x_ax, y_ax, z_ax = axes
    if ids is not None:
        n_sel = ids.shape[0]
        ibz = ids // (nby * nbx)
        iby = (ids // nbx) % nby
        ibx = ids % nbx
        shape = (n_sel, n_sub, sz, by, bx)
        qx = jnp.broadcast_to(
            x_ax[ibx[:, None] * bx + jnp.arange(bx)[None, :]]
            .reshape(n_sel, 1, 1, 1, bx), shape)
        qy = jnp.broadcast_to(
            y_ax[iby[:, None] * by + jnp.arange(by)[None, :]]
            .reshape(n_sel, 1, 1, by, 1), shape)
        qz = jnp.broadcast_to(
            z_ax[ibz[:, None] * bz + jnp.arange(bz)[None, :]]
            .reshape(n_sel, n_sub, sz, 1, 1), shape)
        n_rows = n_sel * n_sub
        return (qx.reshape(n_rows, 1, Bt), qy.reshape(n_rows, 1, Bt),
                qz.reshape(n_rows, 1, Bt))
    shape = (nbz, nby, nbx, n_sub, sz, by, bx)
    qx = jnp.broadcast_to(
        x_ax.reshape(1, 1, nbx, 1, 1, 1, bx), shape)
    qy = jnp.broadcast_to(
        y_ax.reshape(1, nby, 1, 1, 1, by, 1), shape)
    qz = jnp.broadcast_to(
        z_ax.reshape(nbz, 1, 1, n_sub, sz, 1, 1), shape)
    n_rows = nbz * nby * nbx * n_sub
    return (qx.reshape(n_rows, 1, Bt), qy.reshape(n_rows, 1, Bt),
            qz.reshape(n_rows, 1, Bt))


@functools.partial(jax.jit, static_argnames=(
    "block", "dims", "sz", "k", "V", "C", "mode", "power", "interpret"))
def _fused_eval(m2, cand, qx_all, qy_all, qz_all, block, dims, sz, k, V, C,
                mode, power, interpret=False):
    bz, by, bx = block
    # blocks come from the candidate panel, NOT dims: subset (repair)
    # evaluation passes a panel holding only the uncovered blocks
    n_blocks = cand.shape[1] // C
    n_sub = bz // sz
    Bt = sz * by * bx

    kern = functools.partial(_fused_kernel, block=block, dims=dims, sz=sz,
                             k=k, V=V, mode=mode, power=power)
    q_spec = pl.BlockSpec((1, 1, Bt), lambda i, j: (i * n_sub + j, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n_blocks, n_sub),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # m2 (1, 1)
            pl.BlockSpec((8, C), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),              # candidates
            q_spec, q_spec, q_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, 8, Bt), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, n_sub, 8, Bt), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bt, C), jnp.float32),
                        pltpu.VMEM((Bt, C), jnp.float32)],
        # the (Bt, C) panel plus Mosaic's expression temporaries exceed the
        # default 16 MB scoped budget; v5e has 128 MB VMEM per core
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(m2, cand, qx_all, qy_all, qz_all)
    return out


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("dims_c", "mcz", "mcy"))
def _block_tot_device(starts, x0, x1, base_y, base_z, dims_c,
                      mcz: int, mcy: int):
    """Device form of the per-block candidate-total table: same integral-
    image math as the numpy branch below, run where ``starts`` lives.
    Returns (nbz, nby, nbx) i32 totals (callers pull the ~64 KB table once
    instead of the full multi-MB ``starts``)."""
    ncx, ncy, ncz = dims_c
    counts = jnp.diff(starts).reshape(ncz * ncy, ncx)
    csum = jnp.concatenate(
        [jnp.zeros((ncz * ncy, 1), jnp.int32), jnp.cumsum(counts, axis=1)],
        axis=1)
    W = (jnp.take(csum, x1, axis=1) - jnp.take(csum, x0, axis=1))
    nbx = x0.shape[0]
    W = W.reshape(ncz, ncy, nbx)
    Wp = jnp.pad(W, ((mcz, mcz), (mcy, mcy), (0, 0)))
    cz_idx = jnp.clip(base_z[:, None] + jnp.arange(mcz)[None, :] + mcz,
                      0, ncz + 2 * mcz - 1)
    cy_idx = jnp.clip(base_y[:, None] + jnp.arange(mcy)[None, :] + mcy,
                      0, ncy + 2 * mcy - 1)
    T1 = Wp[cz_idx].sum(axis=1)                      # (nbz, ncy+2mcy, nbx)
    return T1[:, cy_idx, :].sum(axis=2)              # (nbz, nby, nbx)


def _block_total_capacity(cells, axes_np, margin: float,
                          block: Tuple[int, int, int],
                          grid_shape: Tuple[int, int, int],
                          mc: Tuple[int, int, int], ids=None) -> int:
    """Max total candidate count over all blocks (the static panel width C
    for the compacted store) — the compaction analogue of
    ``grid_knn._row_capacity``, summed over the block's candidate rows.
    With ``ids`` (flat block indices), the max is taken over that subset
    only (the repair path's widened-margin panels stay as narrow as the
    repair blocks allow)."""
    bz, by, bx = block
    nz, ny, nx = grid_shape
    nbz, nby, nbx = (_block_counts(nz, bz), _block_counts(ny, by),
                     _block_counts(nx, bx))
    mcz, mcy, mcx = mc
    ncx, ncy, ncz = cells.dims
    x_ax, y_ax, z_ax = axes_np
    from ptv_interpolation_tpu.ops.neighbors import cell_meta_np
    origin, inv = cell_meta_np(cells)
    inv = np.float32(inv)
    # the window base MUST be computed in f32 with the device kernel's
    # exact op order ((lo - margin) - origin) * inv: in f64 the floor can
    # land one cell off when the product sits within an f32 ulp of an
    # integer, under-sizing C and silently truncating candidates that
    # the coverage sentinel would never flag
    m32 = np.float32(margin)

    base_x = np.floor(((np.asarray(x_ax)[np.arange(nbx) * bx]
                        .astype(np.float32) - m32)
                       - origin[0]) * inv).astype(np.int64)
    base_y = np.floor(((np.asarray(y_ax)[np.arange(nby) * by]
                        .astype(np.float32) - m32)
                       - origin[1]) * inv).astype(np.int64)
    base_z = np.floor(((np.asarray(z_ax)[np.arange(nbz) * bz]
                        .astype(np.float32) - m32)
                       - origin[2]) * inv).astype(np.int64)
    x0 = np.clip(base_x, 0, ncx)
    x1 = np.clip(base_x + mcx, 0, ncx)

    if cells.starts_host is None:
        # device CSR build: integral image on device, pull the ~64 KB
        # per-block table (the full starts pull was ~0.17 s at 750k cells)
        tot = np.asarray(_block_tot_device(
            cells.starts, jnp.asarray(x0, jnp.int32),
            jnp.asarray(x1, jnp.int32), jnp.asarray(base_y, jnp.int32),
            jnp.asarray(base_z, jnp.int32), cells.dims, mcz, mcy))
        if ids is not None:
            tot = tot.reshape(-1)[np.asarray(ids, np.int64)]
        return int(tot.max()) if tot.size else 1

    starts_np = cells.starts_host.astype(np.int64)
    counts = np.diff(starts_np).reshape(ncz * ncy, ncx)
    csum = np.concatenate([np.zeros((ncz * ncy, 1), np.int64),
                           np.cumsum(counts, axis=1)], axis=1)

    W = (csum[:, x1] - csum[:, x0]).reshape(ncz, ncy, nbx)
    Wp = np.zeros((ncz + 2 * mcz, ncy + 2 * mcy, nbx), np.int64)
    Wp[mcz:mcz + ncz, mcy:mcy + ncy] = W
    cz_idx = np.clip(base_z[:, None] + np.arange(mcz)[None, :] + mcz,
                     0, ncz + 2 * mcz - 1)
    cy_idx = np.clip(base_y[:, None] + np.arange(mcy)[None, :] + mcy,
                     0, ncy + 2 * mcy - 1)
    T1 = Wp[cz_idx].sum(axis=1)                      # (nbz, ncy+2mcy, nbx)
    tot = T1[:, cy_idx, :].sum(axis=2)               # (nbz, nby, nbx)
    if ids is not None:
        tot = tot.reshape(-1)[np.asarray(ids, np.int64)]
    return int(tot.max()) if tot.size else 1


def _pick_sz(bz: int, by: int, bx: int, target: int = 256) -> int:
    """Largest divisor of bz with a sub-tile of sz·by·bx ≤ target queries
    (panel ≤ 2 · target × C f32 in VMEM). Bigger sub-tiles amortize the
    per-invocation Mosaic overhead slightly (1024 measured ~5% faster
    warm at the bench geometry) but inflate the Mosaic compile 3×
    (fresh-cache first call 59.5 s at 256 vs 154.9 s at 1024) — cold
    start is the scarcer resource."""
    best = 1
    for sz in range(1, bz + 1):
        if bz % sz == 0 and sz * by * bx <= target:
            best = sz
    return best


class FusedCapacityError(ValueError):
    """The compacted candidate panel would exceed the VMEM budget —
    callers fall back to the streaming XLA path."""


def fused_grid_weighted_interpolate(points, values, grid: Grid, k: int,
                                    mode: str = "sibson", power: float = 2.0,
                                    block: Tuple[int, int, int] | None = None,
                                    margin_factor: float = 1.45,
                                    group: int = 8, skip_mask=None,
                                    max_panel: int = 8192,
                                    interpret: bool = False):
    """IDW/sibson onto ``grid`` via the fused two-phase kernel. Returns
    (nz, ny, nx, V) with uncovered nodes repaired exactly — same contract
    (and same escape hatches) as
    ``ops.grid_knn.grid_weighted_interpolate``."""
    from ptv_interpolation_tpu.ops.grid_knn import (
        _host_setup, repair_empty_nodes)

    if block is None:
        block = (4, 8, 16) if skip_mask is not None else (8, 8, 16)
    bz, by, bx = block

    setup = _host_setup(points, values, grid, k, None, None, block,
                        margin_factor, cell_divisor=3.0)
    (cells, values_sorted, axes, margin, mc, _row_len, values_dev) = setup
    axes_np = tuple(np.asarray(a) for a in axes)

    C_raw = _block_total_capacity(cells, axes_np, margin, block, grid.shape,
                                  mc)
    C = max((C_raw + 127) // 128 * 128, 128)
    if C > max_panel:
        raise FusedCapacityError(
            f"compacted candidate panel {C} exceeds max_panel={max_panel}; "
            f"use the streaming XLA path")

    nz, ny, nx = grid.shape
    dims = (_block_counts(nz, bz), _block_counts(ny, by),
            _block_counts(nx, bx))
    V = int(np.shape(values)[1])
    sz = _pick_sz(bz, by, bx)

    cand = _compact_gather(cells, values_sorted, axes, jnp.float32(margin),
                           tuple(block), grid.shape, mc, C, group)
    m2 = jnp.asarray([[margin * margin]], jnp.float32)
    qx_all, qy_all, qz_all = _build_queries(axes, tuple(block), dims, sz)
    out = _fused_eval(m2, cand, qx_all, qy_all, qz_all,
                      tuple(block), dims, sz, int(k), V, C, mode,
                      float(power), interpret=bool(interpret))
    out = _reassemble(out, tuple(block), dims, sz, grid.shape)
    field, den = out[..., :V], out[..., V]
    return repair_empty_nodes(field, den, points, values_dev, grid, k, mode,
                              power, cells=cells, margin=margin,
                              skip_mask=skip_mask, values_sorted=values_sorted,
                              block=tuple(block))


def fused_subset_weighted_sum(cells, values_sorted, axes, margin: float,
                              ids_np, k: int, block: Tuple[int, int, int],
                              grid_shape: Tuple[int, int, int],
                              mc: Tuple[int, int, int], mode: str,
                              power: float, V: int,
                              max_panel: int = 8192, group: int = 8):
    """Fused-kernel analogue of ``grid_knn._grid_block_weighted_sum_subset``:
    evaluate only the blocks in ``ids_np`` (host int array) at the given
    (typically widened) margin. Returns ``(n_sel, B, V+1)`` in ids order
    with the coverage-sentinel den channel, or ``None`` when the compacted
    panel would not fit (caller falls back to the streaming subset kernel).

    This is the repair stage-1 evaluator on TPU: the streaming subset
    kernel re-streams a ~8.7k-wide padded panel from HBM for each of the
    24+6 passes (~1 s warm at the 1M→256³ bench, where repair serves only
    ~14k nodes); the compacted VMEM form is ~3× narrower and single-read.
    """
    bz, by, bx = block
    axes_np = tuple(np.asarray(a) for a in axes)
    C_raw = _block_total_capacity(cells, axes_np, margin, block, grid_shape,
                                  mc, ids=ids_np)
    C = max((C_raw + 127) // 128 * 128, 128)
    if C > max_panel:
        return None
    nz, ny, nx = grid_shape
    dims = (_block_counts(nz, bz), _block_counts(ny, by),
            _block_counts(nx, bx))
    sz = _pick_sz(bz, by, bx)
    n_sub = bz // sz
    g = group
    n_pad = (len(ids_np) + g - 1) // g * g
    ids_pad = np.concatenate(
        [ids_np, np.broadcast_to(ids_np[-1:], (n_pad - len(ids_np),))])
    ids_dev = jnp.asarray(ids_pad, jnp.int32)
    cand = _compact_gather(cells, values_sorted, axes, jnp.float32(margin),
                           tuple(block), grid_shape, mc, C, group,
                           ids=ids_dev)
    m2 = jnp.asarray([[margin * margin]], jnp.float32)
    qx, qy, qz = _build_queries(axes, tuple(block), dims, sz, ids=ids_dev)
    out = _fused_eval(m2, cand, qx, qy, qz, tuple(block), dims, sz, int(k),
                      V, C, mode, float(power))
    # (n_pad, n_sub, 8, Bt) → (n_pad, B, V+1) in local (tz, ty, tx) order
    out = out.reshape(n_pad, n_sub, 8, sz, by * bx)
    out = out.transpose(0, 1, 3, 4, 2).reshape(n_pad, bz * by * bx, 8)
    return out[:len(ids_np), :, :V + 1]


# ---------------------------------------------------------------------------
# Single-dispatch device repair
# ---------------------------------------------------------------------------

_NBLK_MAX = 4096


@functools.partial(jax.jit, static_argnames=("block", "dims", "nblk_max"))
def _repair_survey(den, skip, block, dims, nblk_max: int):
    """One device program for everything the repair driver must know before
    it can launch: ``[n_fix, n_bad, bad_block_ids...]`` as one (2+nblk_max,)
    int32 vector (ids padded with -1). One D2H pull replaces the legacy
    ladder's scalar-sum sync + nonzero + 14k-index pull
    (`tools/profile_setup_repair.py`: 0.23 s of the 0.65 s repair wall)."""
    den_eff = den if skip is None else jnp.where(skip, 1.0, den)
    bad = den_eff == 0.0
    n_fix = jnp.sum(bad, dtype=jnp.int32)
    bz, by, bx = block
    nbz, nby, nbx = dims
    nz, ny, nx = den.shape
    badp = jnp.pad(bad, ((0, nbz * bz - nz), (0, nby * by - ny),
                         (0, nbx * bx - nx)))
    blk_bad = badp.reshape(nbz, bz, nby, by, nbx, bx).any(axis=(1, 3, 5))
    n_bad = jnp.sum(blk_bad, dtype=jnp.int32)
    ids = jnp.nonzero(blk_bad.ravel(), size=nblk_max,
                      fill_value=-1)[0].astype(jnp.int32)
    return jnp.concatenate([jnp.stack([n_fix, n_bad]), ids])


@functools.partial(jax.jit, static_argnames=(
    "block", "dims", "sz", "k", "V", "C", "mode", "power", "grid_shape",
    "mc", "group", "interpret"))
def _fused_repair_apply(field, den, skip, cells, values_sorted, axes2,
                        margin2, ids_dev, n_bad, block, dims, sz, k: int,
                        V: int, C: int, mode: str, power: float, grid_shape,
                        mc, group: int = 8, interpret: bool = False):
    """The whole repair stage as ONE traced program: widened-margin panel
    gather + fused Pallas eval + row pick + certification + scatter into
    the field. Returns (field', den', n_repaired). The legacy ladder this
    replaces made ~6 host round-trips (eager picked-row gather ~0.9 s and
    eager scatter ~0.8 s at the 1M→256³ bench on a cold-shape day)."""
    bz, by, bx = block
    nbz, nby, nbx = dims
    nz, ny, nx = grid_shape
    NBLK = ids_dev.shape[0]
    n_sub = bz // sz
    B = bz * by * bx
    den_eff = den if skip is None else jnp.where(skip, 1.0, den)

    pts8_t = _build_pts8_t(cells.points_sorted, values_sorted)
    G = _compact_indices(cells, axes2, margin2, block, grid_shape, mc, C,
                         ids=ids_dev, group=group)
    cand = _panel_take(pts8_t, G)
    m2 = (margin2 * margin2).reshape(1, 1).astype(jnp.float32)
    qx, qy, qz = _build_queries(axes2, block, dims, sz, ids=ids_dev)
    sub = _fused_eval(m2, cand, qx, qy, qz, block, dims, sz, k, V, C,
                      mode, power, interpret=interpret)
    # (NBLK, n_sub, 8, Bt) → (NBLK, B, 8) rows in local (tz, ty, tx) order
    rows = sub.reshape(NBLK, n_sub, 8, sz, by * bx)
    rows = rows.transpose(0, 1, 3, 4, 2).reshape(NBLK, B, 8)
    vals_new = rows[..., :V]
    den2 = rows[..., V]

    ibz = ids_dev // (nby * nbx)
    iby = (ids_dev // nbx) % nby
    ibx = ids_dev % nbx
    tz = jnp.arange(bz, dtype=jnp.int32)
    ty = jnp.arange(by, dtype=jnp.int32)
    tx = jnp.arange(bx, dtype=jnp.int32)
    iz = (ibz[:, None, None, None] * bz + tz[None, :, None, None])
    iy = (iby[:, None, None, None] * by + ty[None, None, :, None])
    ix = (ibx[:, None, None, None] * bx + tx[None, None, None, :])
    in_grid = (iz < nz) & (iy < ny) & (ix < nx)
    flat = ((iz * ny + iy) * nx + ix).reshape(NBLK, B)
    in_grid = in_grid.reshape(NBLK, B)
    lane_ok = (jnp.arange(NBLK, dtype=jnp.int32) < n_bad)[:, None]

    n_total = nz * ny * nx
    flat_safe = jnp.clip(flat, 0, n_total - 1)
    den_at = den_eff.reshape(-1)[flat_safe]
    valid = lane_ok & in_grid & (den_at == 0.0) & (den2 > 0.0)
    # invalid rows (incl. padded lanes, which alias real blocks) are routed
    # out of range and dropped — surviving writes hit unique nodes
    idx = jnp.where(valid, flat, n_total).reshape(-1)
    field2 = field.reshape(-1, V).at[idx].set(
        vals_new.reshape(-1, V), mode="drop")
    den_out = den_eff.reshape(-1).at[idx].set(1.0, mode="drop")
    n_rep = jnp.sum(valid, dtype=jnp.int32)
    return (field2.reshape(grid_shape + (V,)), den_out.reshape(grid_shape),
            n_rep)


def fused_repair(field, den, skip_mask, cells, values_sorted, grid, k: int,
                 mode: str, power: float, block: Tuple[int, int, int],
                 margin: float, max_panel: int = 8192, group: int = 8,
                 interpret: bool = False):
    """Single-dispatch repair driver for the fused TPU path. Returns
    ``(field', den', n_left)`` — ``n_left`` nodes remain uncovered at the
    widened margin (``den'`` marks the repaired ones nonzero so the caller
    can brute-force only the rest) — or ``None`` when the fast path is
    ineligible (too many uncovered blocks for the panel budget, or a
    void-dominated cloud where per-block certification would fail anyway).
    Exactly two device syncs: the survey pull and the n_repaired pull —
    the panel eval, certification, and scatter live in one program."""
    nz, ny, nx = grid.shape
    bz, by, bx = block
    dims = (_block_counts(nz, bz), _block_counts(ny, by),
            _block_counts(nx, bx))
    skip = None if skip_mask is None else jnp.asarray(skip_mask, bool)
    survey = np.asarray(_repair_survey(den, skip, block, dims, _NBLK_MAX))
    n_fix, n_bad = int(survey[0]), int(survey[1])
    if n_fix == 0:
        return field, den, 0
    B = bz * by * bx
    if n_bad > _NBLK_MAX or n_bad * B > max(32 * n_fix, 64 * B):
        return None
    ids_np = survey[2:2 + n_bad].astype(np.int64)

    from ptv_interpolation_tpu.ops.grid_knn import _pad_axis
    from ptv_interpolation_tpu.ops.neighbors import cell_meta_np
    cell_size = 1.0 / cell_meta_np(cells)[1]
    margin2 = 1.6 * float(margin)
    dx, dy, dz = grid.spacing
    mc2 = tuple(int(math.ceil((ext + 2.0 * margin2) / cell_size)) + 1
                for ext in (bx * dx, by * dy, bz * dz))[::-1]
    axes2 = (_pad_axis(grid.x, bx), _pad_axis(grid.y, by),
             _pad_axis(grid.z, bz))
    axes2_np = tuple(np.asarray(a) for a in axes2)
    C_raw = _block_total_capacity(cells, axes2_np, margin2, block, grid.shape,
                                  mc2, ids=ids_np)
    C = max((C_raw + 127) // 128 * 128, 128)
    if C > max_panel:
        return None

    NBLK = 1 << max(n_bad - 1, 31).bit_length()
    ids_pad = np.concatenate(
        [ids_np, np.broadcast_to(ids_np[-1:], (NBLK - n_bad,))])
    ids_dev = jnp.asarray(ids_pad, jnp.int32)
    V = field.shape[-1]
    sz = _pick_sz(bz, by, bx)
    field2, den_out, n_rep = _fused_repair_apply(
        field, den, skip, cells, values_sorted, axes2, jnp.float32(margin2),
        ids_dev, jnp.asarray(n_bad, jnp.int32), tuple(block), dims, sz,
        int(k), V, C, mode, float(power), grid.shape, mc2, group,
        interpret=interpret)
    n_left = n_fix - int(n_rep)
    return field2, den_out, n_left


@functools.partial(jax.jit, static_argnames=("block", "dims", "sz",
                                             "grid_shape"))
def _reassemble(out, block, dims, sz, grid_shape):
    """(n_blocks, n_sub, 8, Bt) → (nz, ny, nx, 8) node order."""
    bz, by, bx = block
    nbz, nby, nbx = dims
    nz, ny, nx = grid_shape
    n_sub = bz // sz
    o = out.reshape(nbz, nby, nbx, n_sub, 8, sz, by, bx)
    #              0    1    2    3      4  5   6   7
    o = o.transpose(0, 3, 5, 1, 6, 2, 7, 4)
    o = o.reshape(nbz * bz, nby * by, nbx * bx, 8)
    return o[:nz, :ny, :nx]
