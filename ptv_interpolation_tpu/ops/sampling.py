"""Point sampling of gridded fields (``map_coordinates`` equivalents).

The mesh drag integrator samples velocity/pressure at off-grid triangle
centroids (`/root/reference/velocity_analysis.py:576-590`) with
``scipy.ndimage.map_coordinates`` at orders 0, 1 and 3. JAX ships orders
0/1 only (``jax.scipy.ndimage``); the cubic sampler here is a Catmull-Rom
tricubic — a C¹ interpolant of comparable accuracy to scipy's spline
(which prefiters to a B-spline basis), fully vectorized over query points.
All samplers clamp at the volume edge (scipy ``mode='nearest'``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("order",))
def map_coordinates(volume, coords, order: int = 1):
    """Sample ``volume`` (nz, ny, nx) at ``coords`` (3, Q) index coordinates
    (z, y, x rows, scipy convention), clamped at edges.

    order 0 → nearest, 1 → trilinear, 3 → Catmull-Rom tricubic.
    """
    volume = jnp.asarray(volume, jnp.float32)
    coords = jnp.asarray(coords, jnp.float32)
    if order in (0, 1):
        from jax.scipy.ndimage import map_coordinates as jmap
        return jmap(volume, [coords[0], coords[1], coords[2]], order=order,
                    mode="nearest")
    if order == 3:
        return _catmull_rom_3d(volume, coords)
    raise NotImplementedError(f"order {order} not supported")


def _cr_weights(t):
    """Catmull-Rom basis weights for offsets (-1, 0, 1, 2)."""
    t2 = t * t
    t3 = t2 * t
    w0 = 0.5 * (-t3 + 2 * t2 - t)
    w1 = 0.5 * (3 * t3 - 5 * t2 + 2)
    w2 = 0.5 * (-3 * t3 + 4 * t2 + t)
    w3 = 0.5 * (t3 - t2)
    return jnp.stack([w0, w1, w2, w3], axis=0)           # (4, Q)


def _catmull_rom_3d(volume, coords):
    nz, ny, nx = volume.shape
    base = jnp.floor(coords)
    t = coords - base                                     # (3, Q)
    base = base.astype(jnp.int32)

    wz = _cr_weights(t[0])
    wy = _cr_weights(t[1])
    wx = _cr_weights(t[2])

    out = jnp.zeros(coords.shape[1], jnp.float32)
    for iz in range(4):
        z_idx = jnp.clip(base[0] + iz - 1, 0, nz - 1)
        for iy in range(4):
            y_idx = jnp.clip(base[1] + iy - 1, 0, ny - 1)
            # vectorize the innermost gather over the 4 x-taps
            for ix in range(4):
                x_idx = jnp.clip(base[2] + ix - 1, 0, nx - 1)
                out = out + (wz[iz] * wy[iy] * wx[ix]
                             * volume[z_idx, y_idx, x_idx])
    return out
