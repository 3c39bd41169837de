"""Delaunay-barycentric ("linear") interpolation — hybrid host/device.

The reference's default method delegates to ``scipy.interpolate.griddata``
(`/root/reference/interpolator.py:197`), whose 'linear' mode is Qhull
Delaunay + barycentric evaluation. Incremental triangulation and simplex
walking are irreducibly sequential/pointer-chasing, so that *topology* stage
stays on the host (scipy's compiled Qhull) — but it runs once per particle
set — while the *evaluation* (barycentric weights + vertex-value blend, the
O(Q) hot part) runs vectorized on device.

``fill_value=0.0`` outside the convex hull matches the reference call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def _barycentric_eval(transform, simplices, values, queries, simplex_idx,
                      fill_value):
    """Device evaluation given host-found simplex ids.

    transform : (S, 4, 3) scipy Delaunay transform blocks (Tinv rows + r)
    simplices : (S, 4) vertex indices
    """
    safe = jnp.clip(simplex_idx, 0, None)
    Tinv = transform[safe, :3, :]              # (Q, 3, 3)
    r = transform[safe, 3, :]                  # (Q, 3)
    b = jnp.einsum("qij,qj->qi", Tinv, queries - r)      # (Q, 3)
    w = jnp.concatenate([b, 1.0 - jnp.sum(b, axis=1, keepdims=True)], axis=1)
    verts = simplices[safe]                    # (Q, 4)
    vals = values[verts]                       # (Q, 4, C)
    out = jnp.einsum("qk,qkc->qc", w, vals)
    inside = (simplex_idx >= 0)[:, None]
    return jnp.where(inside, out, fill_value)


def linear_interpolate(points, values, queries, fill_value: float = 0.0,
                       tri=None):
    """Piecewise-linear interpolation of ``values`` (N, C) at ``queries``.

    Pass a prebuilt ``scipy.spatial.Delaunay`` as ``tri`` to amortize the
    triangulation across calls (e.g. per-component or sharded evaluation).
    """
    from scipy.spatial import Delaunay, QhullError

    pts = np.asarray(points, np.float64)
    qrs = np.asarray(queries, np.float64)
    if tri is None:
        try:
            tri = Delaunay(pts)
        except QhullError as e:
            raise ValueError(f"Delaunay triangulation failed: {e}")

    simplex_idx = tri.find_simplex(qrs).astype(np.int32)   # host walk (C)
    return _barycentric_eval(
        jnp.asarray(tri.transform, jnp.float32),
        jnp.asarray(tri.simplices, jnp.int32),
        jnp.asarray(values, jnp.float32),
        jnp.asarray(qrs, jnp.float32),
        jnp.asarray(simplex_idx),
        jnp.float32(fill_value),
    )
