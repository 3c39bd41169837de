"""SPMD execution of the hot paths over a device mesh.

Two sharding patterns cover the whole framework:

* **Query sharding** (interpolation, filtering): grid points / particles
  are embarrassingly parallel over queries — ``shard_map`` runs the tiled
  neighbor+weights loop on each device's query shard with the particle set
  (or cell list) replicated. This is the TPU equivalent of the reference's
  process pool (`interpolator.py:173-182`), except the "pickle+fork" is an
  ICI broadcast and the chunks are MXU tiles.

* **Z-slab sharding** (physics): fields are sharded along z; the stencil
  operators (``jnp.roll`` + masked where) compile under ``jit`` with GSPMD
  inserting one-voxel halo exchanges, and the CG dot products become
  ``psum`` collectives. No code changes to the solvers — the same jitted
  functions run single-chip or on a pod depending on input shardings.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ptv_interpolation_tpu.grid import Grid
from ptv_interpolation_tpu.interpolate.knn_weights import (
    _idw_weights,
    _sibson_weights,
    _weighted_tile,
)
from ptv_interpolation_tpu.ops.neighbors import (
    CellList,
    bruteforce_tile_fn,
    celllist_tile_fn,
    map_query_tiles,
)
from ptv_interpolation_tpu.parallel.mesh import DATA_AXIS


def _pad_to(n: int, multiple: int) -> int:
    return (n + multiple - 1) // multiple * multiple


def sharded_interpolate_values(points, values, queries, mesh: Mesh,
                               method: str = "idw", k: int = 50,
                               power: float = 2.0,
                               cells: Optional[CellList] = None,
                               rings: int = 1, query_tile: int = 1024,
                               point_chunk: int = 4096,
                               axis_name: str = DATA_AXIS):
    """Interpolate with queries sharded over ``mesh`` (kNN methods).

    Points/values (and the cell list, if given) are replicated; each device
    runs the fused neighbor+weights tile loop over its query shard; results
    concatenate along the query axis with no cross-device traffic beyond
    the initial broadcast.
    """
    points = jnp.asarray(points, jnp.float32)
    values = jnp.asarray(values, jnp.float32)
    queries = jnp.asarray(queries, jnp.float32)
    n_dev = mesh.devices.size
    n_q = queries.shape[0]
    padded = _pad_to(n_q, n_dev * query_tile)
    queries_p = jnp.pad(queries, ((0, padded - n_q), (0, 0)))

    def local(pts, vals, cell_arg, q_shard):
        if cell_arg is not None:
            neighbor = celllist_tile_fn(cell_arg, k, rings)
        else:
            neighbor = bruteforce_tile_fn(pts, k, point_chunk)
        if method == "idw":
            weight_fn = lambda d, ok: _idw_weights(d, power, ok)  # noqa: E731
        elif method == "sibson":
            weight_fn = _sibson_weights
        else:
            raise ValueError(f"sharded interpolation supports kNN methods, "
                             f"got {method!r}")
        tile = _weighted_tile(neighbor, vals, weight_fn)
        return map_query_tiles(tile, q_shard, query_tile)

    cell_specs = (jax.tree_util.tree_map(lambda _: P(), cells)
                  if cells is not None else None)
    # check_vma=False: the tile loop's top-k scan carry is initialized from
    # replicated constants, which the varying-axes checker rejects; there
    # are no collectives inside the local function, so the check is moot.
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), cell_specs, P(axis_name)),
        out_specs=P(axis_name), check_vma=False)
    out = jax.jit(fn)(points, values, cells, queries_p)
    return out[:n_q]


def sharded_interpolate_field(points, values, grid: Grid, mesh: Mesh,
                              **kwargs):
    """Grid-output variant (→ (U, V, W) like ``interpolate_field``)."""
    queries = grid.flat_coords()
    out = sharded_interpolate_values(points, values, queries, mesh, **kwargs)
    out = out.reshape(grid.shape + (out.shape[-1],))
    return out[..., 0], out[..., 1], out[..., 2]


def sharded_grid_interpolate(points, values, grid: Grid, mesh: Mesh,
                             method: str = "sibson", k: int = 50,
                             power: float = 2.0,
                             block=(8, 8, 16), recall_target: float = 0.9,
                             group: int = 8, margin_factor: float = 1.45,
                             tau_mode: str = "bisect", skip_mask=None,
                             backend: str = "auto", interpret: bool = False,
                             axis_name: str = DATA_AXIS):
    """The block-centric τ-threshold kernel sharded over the mesh.

    The grid's z-axis is cut into one slab per device (padded to equal
    slabs); every device runs the same compiled block kernel on its slab
    with the cell list and values replicated (one ICI broadcast). This is
    the multi-chip form of the headline 1M→256³ benchmark kernel — work is
    embarrassingly parallel over slabs, so scaling is linear up to the
    broadcast cost. Returns (nz, ny, nx, C).

    ``backend``: 'auto' (the fused two-phase kernel per slab on TPU with
    ``tau_mode='bisect'``, the streaming XLA kernel elsewhere), 'fused',
    or 'xla'. The fused slab form is the single-chip headline kernel
    verbatim — phase-1 indices and the Pallas τ-bisect both run inside
    ``shard_map`` with the candidate store replicated; the panel width C
    is planned once on the host over the full padded grid, so every
    slab compiles the same static shapes. ``interpret=True`` runs the
    Pallas stage in interpret mode (the CPU-mesh parity tests).
    """
    import numpy as np

    from ptv_interpolation_tpu.interpolate.knn_weights import (
        _idw_panel_weights, _sibson_panel_weights)
    from ptv_interpolation_tpu.ops.grid_knn import (
        _grid_block_weighted_sum, _host_setup, _pad_axis,
        repair_empty_nodes)

    if method == "idw":
        weight_fn = _idw_panel_weights(float(power))
    elif method == "sibson":
        weight_fn = _sibson_panel_weights()
    else:
        raise ValueError(f"sharded grid kernel supports idw/sibson, got {method!r}")

    use_fused = backend == "fused" or (
        backend == "auto" and tau_mode == "bisect"
        and (jax.default_backend() == "tpu" or interpret))

    n_dev = mesh.devices.size
    bz = block[0]
    # z-slab size: equal slabs, each a multiple of the block z-extent
    slab = -(-grid.nz // n_dev)
    slab = -(-slab // bz) * bz
    nz_pad = slab * n_dev

    (cells, values_sorted, axes, margin, mc, row_len, values_dev) = _host_setup(
        points, values, grid, k, None, None, block, margin_factor,
        cell_divisor=3.0 if use_fused else 2.0)
    x_ax, y_ax, _ = axes
    # padded z axis, one slab per device (each slab keeps real spacing)
    z_full = np.asarray(grid.z, np.float32)
    step = float(z_full[1] - z_full[0]) if len(z_full) > 1 else 1.0
    z_pad = np.concatenate([
        z_full, z_full[-1] + step * np.arange(1, nz_pad - grid.nz + 1,
                                              dtype=np.float32)])
    z_slabs = jnp.asarray(z_pad.reshape(n_dev, slab))

    slab_shape = (slab, grid.ny, grid.nx)
    cell_specs = jax.tree_util.tree_map(lambda _: P(), cells)

    if use_fused:
        from ptv_interpolation_tpu.ops import fused_grid_knn as fg

        # panel width planned over the FULL padded grid → every slab
        # shares one static C (the max over all slabs' blocks)
        axes_np = (np.asarray(x_ax), np.asarray(y_ax), z_pad)
        C = max((fg._block_total_capacity(
            cells, axes_np, margin, tuple(block),
            (nz_pad, grid.ny, grid.nx), mc) + 127) // 128 * 128, 128)
        V = values_sorted.shape[1]
        sz = fg._pick_sz(*block)
        dims_slab = (slab // bz, fg._block_counts(grid.ny, block[1]),
                     fg._block_counts(grid.nx, block[2]))
        pts8_t = fg._build_pts8_t(cells.points_sorted, values_sorted)
        m2 = jnp.asarray([[margin * margin]], jnp.float32)

        def local(cells_l, pts8_l, m2_l, x_l, y_l, z_slab):
            axes_l = (x_l, y_l, z_slab[0])
            cand = fg._compact_gather(
                cells_l, None, axes_l, jnp.float32(margin), tuple(block),
                slab_shape, mc, C, group, pts8_t=pts8_l)
            qx, qy, qz = fg._build_queries(axes_l, tuple(block), dims_slab,
                                           sz)
            out = fg._fused_eval(m2_l, cand, qx, qy, qz, tuple(block),
                                 dims_slab, sz, int(k), V, C, method,
                                 float(power), interpret=interpret)
            out = fg._reassemble(out, tuple(block), dims_slab, sz,
                                 slab_shape)
            return out[None]                     # (1, slab, ny, nx, 8)

        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(cell_specs, P(), P(), P(), P(), P(axis_name)),
            out_specs=P(axis_name), check_vma=False)
        out = jax.jit(fn)(cells, pts8_t, m2, x_ax, y_ax, z_slabs)
        out = out.reshape(nz_pad, grid.ny, grid.nx, 8)[: grid.nz]
        out, den = out[..., :V], out[..., V]
    else:
        def local(cells_l, vals_l, x_l, y_l, z_slab):
            out, den = _grid_block_weighted_sum(
                cells_l, vals_l, (x_l, y_l, z_slab[0]), jnp.float32(margin),
                k, tuple(block), slab_shape, mc, row_len, weight_fn,
                recall_target, group, False, tau_mode)
            # carry the weight sums along so the far-field fallback (nodes
            # with an empty candidate region) can run after the slabs
            # recombine — multi-chip must match single-chip on clouds with
            # void regions
            return jnp.concatenate([out, den[..., None]], axis=-1)[None]

        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(cell_specs, P(), P(), P(), P(axis_name)),
            out_specs=P(axis_name), check_vma=False)
        out = jax.jit(fn)(cells, values_sorted, x_ax, y_ax, z_slabs)
        out = out.reshape(nz_pad, grid.ny, grid.nx, -1)[: grid.nz]
        out, den = out[..., :-1], out[..., -1]
    return repair_empty_nodes(out, den, points, values_dev,
                              grid, k, method, power, cells=cells,
                              margin=margin, skip_mask=skip_mask,
                              values_sorted=values_sorted, block=tuple(block))


# ---------------------------------------------------------------------------
# Full sharded pipeline step (the "training step" of this framework)
# ---------------------------------------------------------------------------

def make_pipeline_step(grid: Grid, mesh: Optional[Mesh] = None, k: int = 16,
                       power: float = 2.0, iterations: int = 1,
                       query_tile: int = 512, axis_name: str = DATA_AXIS):
    """Build a jitted end-to-end step: scattered vectors + fluid mask →
    divergence-cleaned grid field.

    The returned function is pure and shape-static: IDW interpolation onto
    the grid (queries sharded over the mesh when one is given), hard mask
    zeroing, and ``iterations`` of projection cleaning (fields z-sharded).
    This is the unit the driver compile-checks single-chip and dry-runs
    multi-chip.
    """
    from ptv_interpolation_tpu.physics import clean_divergence_projection

    dx, dy, dz = grid.spacing
    queries = np.asarray(grid.flat_coords())
    n_q = queries.shape[0]
    shape = grid.shape

    if mesh is not None:
        n_dev = mesh.devices.size
        padded = _pad_to(n_q, n_dev * query_tile)
        queries = np.pad(queries, ((0, padded - n_q), (0, 0)))

    def interp_local(pts, vals, q_shard):
        neighbor = bruteforce_tile_fn(pts, k)
        tile = _weighted_tile(neighbor, vals,
                              lambda d, ok: _idw_weights(d, power, ok))
        return map_query_tiles(tile, q_shard, query_tile)

    def step(points, values, fluid_mask):
        q = jnp.asarray(queries)
        if mesh is not None:
            out = jax.shard_map(
                interp_local, mesh=mesh,
                in_specs=(P(), P(), P(axis_name)),
                out_specs=P(axis_name), check_vma=False)(points, values, q)
        else:
            out = interp_local(points, values, q)
        out = out[:n_q].reshape(shape + (3,))
        maskf = fluid_mask.astype(jnp.float32)
        U = out[..., 0] * maskf
        V = out[..., 1] * maskf
        W = out[..., 2] * maskf
        res = clean_divergence_projection(U, V, W, fluid_mask, dx, dy, dz,
                                          iterations=iterations, maxiter=50)
        return res.u, res.v, res.w, res.mean_abs_div_final

    if mesh is None:
        return jax.jit(step)
    from jax.sharding import NamedSharding
    repl = NamedSharding(mesh, P())
    zshard = NamedSharding(mesh, P(axis_name))
    return jax.jit(step, in_shardings=(repl, repl, zshard),
                   out_shardings=(zshard, zshard, zshard, repl))
