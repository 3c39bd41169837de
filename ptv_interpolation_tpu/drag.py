"""Interface drag integration (staircase voxel faces & triangulated mesh).

Rebuild of `/root/reference/velocity_analysis.py:332-657`. Two methods:

* ``staircase`` — sums pressure and one-sided viscous tractions over
  discrete voxel faces between fluid (label 0) and a solid/phase label.
  Fully vectorized on device: the reference's per-axis/per-orientation
  python loops become six masked reductions.
* ``mesh`` — triangulates the interface (marching tetrahedra,
  :mod:`ptv_interpolation_tpu.surface` — host) and integrates stresses
  sampled at ±0.25-voxel offsets along the normal ("offset velocity"
  method). All per-triangle sampling/integration runs on device.

Reference quirk fixed deliberately (SURVEY §7 (b)): the reference's
staircase path crashes with ``KeyError: 'Fx'`` when ``volume`` is passed
(`velocity_analysis.py:503-509`) because it never combines Fx = Fx_v + Fx_p;
here both methods always emit the combined force and force density.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ptv_interpolation_tpu.ops.sampling import map_coordinates
from ptv_interpolation_tpu.surface import (
    marching_tetrahedra,
    orient_normals,
    triangle_geometry,
)


def _empty_result():
    keys = ["Fx_v", "Fy_v", "Fz_v", "Fx_v_tan", "Fy_v_tan", "Fz_v_tan",
            "Fx_v_nor", "Fy_v_nor", "Fz_v_nor", "Fx_p", "Fy_p", "Fz_p",
            "Area"]
    return {k: 0.0 for k in keys}


# ---------------------------------------------------------------------------
# Staircase method
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("axis",))
def _staircase_axis(u, v, w, pressure, label_mask, fluid_mask, axis,
                    viscosity, area, step):
    """Accumulate one axis' face contributions for one label.

    ``label_mask``/``fluid_mask`` are boolean volumes; faces are between
    cell i (curr) and i+1 (next) along ``axis``. Mirrors the index logic of
    `velocity_analysis.py:362-501` with both orientations fused.
    """
    def nxt(a):
        return jax.lax.slice_in_dim(a, 1, a.shape[axis], axis=axis)

    def cur(a):
        return jax.lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)

    m_curr_f, m_next_f = cur(fluid_mask), nxt(fluid_mask)
    m_curr_l, m_next_l = cur(label_mask), nxt(label_mask)

    # orientation A: fluid(curr) → label(next); fluid side = curr
    idx_a = m_curr_f & m_next_l
    # orientation B: label(curr) → fluid(next); fluid side = next
    idx_b = m_curr_l & m_next_f

    n_faces = jnp.sum(idx_a) + jnp.sum(idx_b)

    p_face_a = 0.5 * (cur(pressure) + nxt(pressure))
    p_face_b = p_face_a
    # pressure force on the label along +axis for A, −axis for B
    f_p_axis = (jnp.sum(jnp.where(idx_a, p_face_a, 0.0))
                - jnp.sum(jnp.where(idx_b, p_face_b, 0.0))) * area

    # one-sided wall gradients du/dn = −2 u_fluid / step
    out = {}
    comps = {"u": u, "v": v, "w": w}
    for name, f in comps.items():
        g_a = -2.0 * cur(f) / step
        g_b = -2.0 * nxt(f) / step
        out[name] = (jnp.sum(jnp.where(idx_a, g_a, 0.0))
                     + jnp.sum(jnp.where(idx_b, g_b, 0.0)))
    # viscous force accumulators: F = −Σ μ (2·normal | 1·tangential) g A
    axis_comp = {0: "w", 1: "v", 2: "u"}[axis]
    forces = {}
    for name in comps:
        factor = 2.0 if name == axis_comp else 1.0
        forces[name] = -viscosity * factor * out[name] * area
    return n_faces, f_p_axis, forces["u"], forces["v"], forces["w"]


def compute_interface_drag_staircase(u, v, w, pressure, viscosity, dx, dy, dz,
                                     mask, labels=None, volume=None):
    """Staircase drag (`velocity_analysis.py:332-511`). ``mask`` is an int
    label volume: 0 = fluid, >0 = solid/phase labels."""
    mask = np.asarray(mask)
    if labels is None:
        labels = np.unique(mask)
        labels = labels[labels > 0]
    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    p = (jnp.zeros(u.shape, jnp.float32) if pressure is None
         else jnp.asarray(pressure, jnp.float32))
    has_p = pressure is not None
    fluid = jnp.asarray(mask == 0)

    dA = {0: dy * dx, 1: dz * dx, 2: dz * dy}
    h = {0: dz, 1: dy, 2: dx}
    results = {}
    for label in labels:
        r = _empty_result()
        label_mask = jnp.asarray(mask == label)
        for axis in range(3):
            n_faces, f_p, fu, fv, fw = _staircase_axis(
                u, v, w, p, label_mask, fluid, axis,
                viscosity, dA[axis], h[axis])
            r["Area"] += float(n_faces) * dA[axis]
            axis_comp = {0: "z", 1: "y", 2: "x"}[axis]
            if has_p:
                r[f"F{axis_comp}_p"] += float(f_p)
            for cname, fval in (("x", fu), ("y", fv), ("z", fw)):
                r[f"F{cname}_v"] += float(fval)
                part = "nor" if cname == axis_comp else "tan"
                r[f"F{cname}_v_{part}"] += float(fval)
        for cname in "xyz":
            r[f"F{cname}"] = r[f"F{cname}_v"] + r[f"F{cname}_p"]
        if volume:
            for cname in "xyz":
                r[f"M{cname}"] = r[f"F{cname}"] / volume
        results[int(label)] = r
    return results


# ---------------------------------------------------------------------------
# Mesh method
# ---------------------------------------------------------------------------

@jax.jit
def _mesh_tractions(u, v, w, p, bg, centroids, n_unit_physical,
                    tri_areas, spacing_zyx, viscosity, has_bg):
    """Device part of the mesh drag: offset-sample velocities, assemble
    viscous + pressure tractions, decompose, classify, integrate.

    The voxel-space unit normals and the physical offset distance are
    derived ON DEVICE from the physical normals + spacing: pushing them
    precomputed doubles the per-triangle h2d traffic (at 3.2M triangles
    that is ~50 MB per call — seconds over a tunneled backend)."""
    n_vox = n_unit_physical / spacing_zyx[None, :]
    n_vox = n_vox / jnp.maximum(
        jnp.linalg.norm(n_vox, axis=1, keepdims=True), 1e-20)
    delta_phys = 0.25 * jnp.sqrt(
        jnp.sum((n_vox * spacing_zyx[None, :]) ** 2, axis=1))
    n_unit_voxel = n_vox
    sample_coords = (centroids + 0.25 * n_unit_voxel).T          # inside label
    outer_coords = (centroids - 0.25 * n_unit_voxel).T

    u_in = map_coordinates(u, sample_coords, order=3)
    v_in = map_coordinates(v, sample_coords, order=3)
    w_in = map_coordinates(w, sample_coords, order=3)
    u_if = map_coordinates(u, centroids.T, order=1)
    v_if = map_coordinates(v, centroids.T, order=1)
    w_if = map_coordinates(w, centroids.T, order=1)

    tx_v = viscosity * (u_if - u_in) / delta_phys
    ty_v = viscosity * (v_if - v_in) / delta_phys
    tz_v = viscosity * (w_if - w_in) / delta_phys

    p_tri = map_coordinates(p, centroids.T, order=1)
    nz_p, ny_p, nx_p = (n_unit_physical[:, 0], n_unit_physical[:, 1],
                        n_unit_physical[:, 2])
    tx_p = p_tri * nx_p
    ty_p = p_tri * ny_p
    tz_p = p_tri * nz_p

    t_dot_n = tx_v * nx_p + ty_v * ny_p + tz_v * nz_p
    tx_nor, ty_nor, tz_nor = t_dot_n * nx_p, t_dot_n * ny_p, t_dot_n * nz_p
    tx_tan, ty_tan, tz_tan = tx_v - tx_nor, ty_v - ty_nor, tz_v - tz_nor

    bg_near = map_coordinates(bg, outer_coords, order=0)
    is_water = jnp.where(has_bg, bg_near > 0.5, True)
    water = is_water.astype(jnp.float32)
    solid = 1.0 - water

    def integ(t):
        return jnp.sum(t * tri_areas)

    return {
        "Fx_v": integ(tx_v), "Fy_v": integ(ty_v), "Fz_v": integ(tz_v),
        "Fx_v_tan": integ(tx_tan), "Fy_v_tan": integ(ty_tan),
        "Fz_v_tan": integ(tz_tan),
        "Fx_v_nor": integ(tx_nor), "Fy_v_nor": integ(ty_nor),
        "Fz_v_nor": integ(tz_nor),
        "Fx_p": integ(tx_p), "Fy_p": integ(ty_p), "Fz_p": integ(tz_p),
        "Area": jnp.sum(tri_areas),
        "Fx_water": integ((tx_v + tx_p) * water),
        "Fy_water": integ((ty_v + ty_p) * water),
        "Fz_water": integ((tz_v + tz_p) * water),
        "Fx_solid": integ((tx_v + tx_p) * solid),
        "Fy_solid": integ((ty_v + ty_p) * solid),
        "Fz_solid": integ((tz_v + tz_p) * solid),
        "Area_water": jnp.sum(tri_areas * water),
        "Area_solid": jnp.sum(tri_areas * solid),
    }


@jax.jit
def _mesh_tractions_t(u, v, w, p, bg, cz, cy, cx, nzp, nyp, nxp, areas,
                      spacing_zyx, viscosity, has_bg):
    """:func:`_mesh_tractions` on lane-major component planes — the
    device-resident mesh pipeline's form (centroids/normals arrive as
    (N,) planes from ``surface.mesh_geometry_device``; padded triangles
    carry zero area, so every integral ignores them)."""
    dz_, dy_, dx_ = spacing_zyx[0], spacing_zyx[1], spacing_zyx[2]
    nvz = nzp / dz_
    nvy = nyp / dy_
    nvx = nxp / dx_
    nrm = 1.0 / jnp.maximum(
        jnp.sqrt(nvz * nvz + nvy * nvy + nvx * nvx), 1e-20)
    nvz, nvy, nvx = nvz * nrm, nvy * nrm, nvx * nrm
    delta_phys = 0.25 * jnp.sqrt((nvz * dz_) ** 2 + (nvy * dy_) ** 2
                                 + (nvx * dx_) ** 2)
    inner = jnp.stack([cz + 0.25 * nvz, cy + 0.25 * nvy, cx + 0.25 * nvx])
    outer = jnp.stack([cz - 0.25 * nvz, cy - 0.25 * nvy, cx - 0.25 * nvx])
    ctr = jnp.stack([cz, cy, cx])

    u_in = map_coordinates(u, inner, order=3)
    v_in = map_coordinates(v, inner, order=3)
    w_in = map_coordinates(w, inner, order=3)
    u_if = map_coordinates(u, ctr, order=1)
    v_if = map_coordinates(v, ctr, order=1)
    w_if = map_coordinates(w, ctr, order=1)

    tx_v = viscosity * (u_if - u_in) / delta_phys
    ty_v = viscosity * (v_if - v_in) / delta_phys
    tz_v = viscosity * (w_if - w_in) / delta_phys

    p_tri = map_coordinates(p, ctr, order=1)
    tx_p = p_tri * nxp
    ty_p = p_tri * nyp
    tz_p = p_tri * nzp

    t_dot_n = tx_v * nxp + ty_v * nyp + tz_v * nzp
    tx_nor, ty_nor, tz_nor = t_dot_n * nxp, t_dot_n * nyp, t_dot_n * nzp
    tx_tan, ty_tan, tz_tan = tx_v - tx_nor, ty_v - ty_nor, tz_v - tz_nor

    bg_near = map_coordinates(bg, outer, order=0)
    is_water = jnp.where(has_bg, bg_near > 0.5, True)
    water = is_water.astype(jnp.float32)
    solid = 1.0 - water

    def integ(t):
        return jnp.sum(t * areas)

    return {
        "Fx_v": integ(tx_v), "Fy_v": integ(ty_v), "Fz_v": integ(tz_v),
        "Fx_v_tan": integ(tx_tan), "Fy_v_tan": integ(ty_tan),
        "Fz_v_tan": integ(tz_tan),
        "Fx_v_nor": integ(tx_nor), "Fy_v_nor": integ(ty_nor),
        "Fz_v_nor": integ(tz_nor),
        "Fx_p": integ(tx_p), "Fy_p": integ(ty_p), "Fz_p": integ(tz_p),
        "Area": jnp.sum(areas),
        "Fx_water": integ((tx_v + tx_p) * water),
        "Fy_water": integ((ty_v + ty_p) * water),
        "Fz_water": integ((tz_v + tz_p) * water),
        "Fx_solid": integ((tx_v + tx_p) * solid),
        "Fy_solid": integ((ty_v + ty_p) * solid),
        "Fz_solid": integ((tz_v + tz_p) * solid),
        "Area_water": jnp.sum(areas * water),
        "Area_solid": jnp.sum(areas * solid),
    }


def compute_interface_drag_mesh(u, v, w, pressure, viscosity, dx, dy, dz,
                                mask, labels=None, mesh_step: int = 1,
                                volume=None, background_mask=None,
                                defer: bool = False):
    """Mesh drag via marching tetrahedra + offset-velocity stress recovery
    (`velocity_analysis.py:513-657`).

    ``defer=True`` returns a zero-arg finisher instead of the results:
    all device work is dispatched (and the mesh-extraction shape syncs
    paid), but the final force-scalar ``device_get`` waits until the
    finisher is called — callers overlap the traction/CG device compute
    with their own bulk host transfers."""
    mask = np.asarray(mask)
    if labels is None:
        labels = np.unique(mask)
        labels = labels[labels > 0]

    u = jnp.asarray(u, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    p = (jnp.zeros(u.shape, jnp.float32) if pressure is None
         else jnp.asarray(pressure, jnp.float32))
    has_bg = background_mask is not None
    bg = (jnp.asarray(np.asarray(background_mask), jnp.float32) if has_bg
          else jnp.zeros(u.shape, jnp.float32))

    pending = {}
    for label in labels:
        label_vol = (mask == label).astype(np.float64)
        if not label_vol.any():
            continue
        if jax.default_backend() == "tpu":
            # whole mesh pipeline on device (same case tables, f32
            # crossings): extraction, geometry, orientation, and the
            # traction integrals never materialize the 100+ MB triangle
            # arrays on the host — only the ~20 force scalars come back
            from ptv_interpolation_tpu.surface import mesh_geometry_device
            geo, n_tri = mesh_geometry_device(
                label_vol, level=0.5, spacing=(dz, dy, dx),
                step_size=mesh_step)
            if n_tri == 0:
                continue
            out = _mesh_tractions_t(
                u, v, w, p, bg, geo["cz"], geo["cy"], geo["cx"],
                geo["nzp"], geo["nyp"], geo["nxp"], geo["areas"],
                jnp.asarray([dz, dy, dx], jnp.float32),
                jnp.float32(viscosity), jnp.asarray(has_bg))
        else:
            tri_verts = marching_tetrahedra(label_vol, level=0.5,
                                            step_size=mesh_step)
            if len(tri_verts) == 0:
                continue
            centroids, tri_areas, normals = triangle_geometry(
                tri_verts, spacing=(dz, dy, dx))
            normals = orient_normals(normals, centroids, label_vol,
                                     spacing=(dz, dy, dx))

            out = _mesh_tractions(
                u, v, w, p, bg,
                jnp.asarray(centroids, jnp.float32),
                jnp.asarray(normals, jnp.float32),
                jnp.asarray(tri_areas, jnp.float32),
                jnp.asarray([dz, dy, dx], jnp.float32),
                jnp.float32(viscosity), jnp.asarray(has_bg))
        pending[int(label)] = out

    def finish():
        results = {}
        for label, out in pending.items():
            # one batched device_get: per-scalar float() pulls are ~40
            # separate host round-trips (seconds over a tunneled backend)
            out_np = jax.device_get(out)
            r = {k: float(val) for k, val in out_np.items()}
            for cname in "xyz":
                r[f"F{cname}"] = r[f"F{cname}_v"] + r[f"F{cname}_p"]
            if volume:
                for cname in "xyz":
                    r[f"M{cname}"] = r[f"F{cname}"] / volume
            results[label] = r
        return results

    return finish if defer else finish()


def compute_interface_drag(u, v, w, pressure, viscosity, dx, dy, dz, mask,
                           labels=None, method: str = "staircase",
                           mesh_step: int = 1, volume=None,
                           background_mask=None, defer: bool = False):
    """Dispatcher matching the reference signature
    (`velocity_analysis.py:332-344`). ``defer`` — see
    :func:`compute_interface_drag_mesh`; the staircase path computes
    eagerly and wraps its result."""
    if method == "mesh":
        return compute_interface_drag_mesh(
            u, v, w, pressure, viscosity, dx, dy, dz, mask, labels,
            mesh_step=mesh_step, volume=volume,
            background_mask=background_mask, defer=defer)
    if defer:
        res = compute_interface_drag_staircase(
            u, v, w, pressure, viscosity, dx, dy, dz, mask, labels,
            volume=volume)
        return lambda: res
    return compute_interface_drag_staircase(
        u, v, w, pressure, viscosity, dx, dy, dz, mask, labels,
        volume=volume)
