"""Isosurface triangulation via marching tetrahedra (host-side numpy).

The reference uses ``skimage.measure.marching_cubes``
(`/root/reference/velocity_analysis.py:543`) to mesh the fluid–solid
interface for the drag integrator. ``skimage`` is not in this image, so the
framework ships its own extractor. Marching *tetrahedra* (Kuhn subdivision
of each cube into 6 tets sharing the main diagonal) is used instead of
classic marching cubes: it needs no 256-case table, is watertight by
construction, and the drag integrator consumes only triangle
centroids/areas/normals — not shared-vertex topology — so the slightly
higher triangle count is irrelevant.

Surface extraction is output-sized (O(N^{2/3})) and pointer-heavy — it stays
on the host by design (SURVEY §7 "host-side"); the stress *sampling* over
the resulting triangles happens on device.

Vertices are returned in voxel-index coordinates (z, y, x), level-0.5
crossing, matching the skimage call the reference makes. Triangle normals
are oriented toward increasing field value (into the labeled phase), the
same convention skimage documents.
"""

from __future__ import annotations

import numpy as np

# Kuhn subdivision: 6 tetrahedra around the main diagonal (corner 0 → 7).
# Cube corners are indexed by bits (z << 2 | y << 1 | x).
_TETS = np.asarray([
    (0, 1, 3, 7),
    (0, 1, 5, 7),
    (0, 2, 3, 7),
    (0, 2, 6, 7),
    (0, 4, 5, 7),
    (0, 4, 6, 7),
], np.int64)

# tet edge ids: e0=(0,1) e1=(0,2) e2=(0,3) e3=(1,2) e4=(1,3) e5=(2,3)
_EDGES = np.asarray([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], np.int64)

# case (4-bit inside mask) → up to 2 triangles of edge ids (-1 = unused)
_TRI_TABLE = -np.ones((16, 2, 3), np.int64)
_TRI_TABLE[1, 0] = (0, 1, 2)      # v0 inside
_TRI_TABLE[2, 0] = (0, 3, 4)      # v1
_TRI_TABLE[4, 0] = (1, 3, 5)      # v2
_TRI_TABLE[8, 0] = (2, 4, 5)      # v3
_TRI_TABLE[3] = [(1, 3, 4), (1, 4, 2)]       # v0,v1
_TRI_TABLE[5] = [(0, 2, 5), (0, 5, 3)]       # v0,v2
_TRI_TABLE[6] = [(0, 1, 5), (0, 5, 4)]       # v1,v2
_TRI_TABLE[9] = [(0, 1, 5), (0, 5, 4)]       # v0,v3
_TRI_TABLE[10] = [(0, 3, 5), (0, 5, 2)]      # v1,v3
_TRI_TABLE[12] = [(1, 3, 4), (1, 4, 2)]      # v2,v3
_TRI_TABLE[7, 0] = (2, 4, 5)      # all but v3
_TRI_TABLE[11, 0] = (1, 3, 5)     # all but v2
_TRI_TABLE[13, 0] = (0, 3, 4)     # all but v1
_TRI_TABLE[14, 0] = (0, 1, 2)     # all but v0

# cube-corner offsets (dz, dy, dx) per corner id
_CORNER_OFFSETS = np.asarray(
    [[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(8)], np.float64)


def _box_smooth(vol: np.ndarray, passes: int = 1) -> np.ndarray:
    """Separable 3-point box filter (edge-clamped). Applied to binary
    volumes before extraction so edge crossings interpolate sub-voxel:
    marching a raw 0/1 field puts every crossing at t=0.5, yielding a
    jagged surface whose area overshoots by ~25%; one smoothing pass
    brings sphere areas within ~2% of truth."""
    v = vol
    for _ in range(passes):
        for axis in range(3):
            lo = np.take(v, [0], axis=axis)
            hi = np.take(v, [-1], axis=axis)
            ext = np.concatenate([lo, v, hi], axis=axis)
            n = v.shape[axis]
            v = (np.take(ext, range(0, n), axis=axis)
                 + np.take(ext, range(1, n + 1), axis=axis)
                 + np.take(ext, range(2, n + 2), axis=axis)) / 3.0
    return v


def marching_tetrahedra(volume: np.ndarray, level: float = 0.5,
                        step_size: int = 1, slab: int = 32,
                        presmooth: int | None = None) -> np.ndarray:
    """Extract the ``level`` isosurface of ``volume`` (nz, ny, nx).

    Returns ``tri_verts`` of shape (n_tri, 3, 3): triangle vertices in
    (z, y, x) voxel-index coordinates, unoriented (see
    :func:`orient_normals`). ``step_size`` coarsens the cube lattice like
    skimage's parameter; ``slab`` bounds host memory by processing the
    volume in z-chunks. ``presmooth`` box-filter passes default to 1 for
    binary volumes (see :func:`_box_smooth`), 0 otherwise.
    """
    vol = np.ascontiguousarray(volume, np.float64)
    if step_size > 1:
        vol = vol[::step_size, ::step_size, ::step_size]
    if presmooth is None:
        presmooth = 1 if np.unique(vol).size <= 2 else 0
    if presmooth:
        vol = _box_smooth(vol, presmooth)
    nz, ny, nx = vol.shape
    if min(nz, ny, nx) < 2:
        return np.zeros((0, 3, 3))

    out = []
    for z0 in range(0, nz - 1, slab):
        z1 = min(z0 + slab + 1, nz)
        sub = vol[z0:z1]
        tris = _march_block(sub, level)
        if len(tris):
            tris[:, :, 0] += z0
            out.append(tris)
    if not out:
        return np.zeros((0, 3, 3))
    tris = np.concatenate(out)
    if step_size > 1:
        tris *= step_size
    return tris


def _march_block(vol: np.ndarray, level: float) -> np.ndarray:
    nz, ny, nx = vol.shape
    inside = vol > level

    # active cubes: mixed corners (cheap prefilter, O(volume) bitwise)
    c = inside[:-1, :-1, :-1]
    any_in = np.zeros_like(c)
    all_in = np.ones_like(c)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                corner = inside[dz:nz - 1 + dz, dy:ny - 1 + dy, dx:nx - 1 + dx]
                any_in |= corner
                all_in &= corner
    active = any_in & (~all_in)
    zi, yi, xi = np.nonzero(active)
    if len(zi) == 0:
        return np.zeros((0, 3, 3))
    base = np.stack([zi, yi, xi], axis=1).astype(np.float64)   # (M, 3)

    # corner values for active cubes: (8, M)
    vals = np.empty((8, len(zi)))
    for cid in range(8):
        dz, dy, dx = (cid >> 2) & 1, (cid >> 1) & 1, cid & 1
        vals[cid] = vol[zi + dz, yi + dy, xi + dx]

    tris_out = []
    for tet in _TETS:
        tv = vals[tet]                                        # (4, M)
        bits = (tv > level)
        case = (bits[0].astype(np.int64) + 2 * bits[1]
                + 4 * bits[2] + 8 * bits[3])
        for k in range(2):
            edge_ids = _TRI_TABLE[case, k]                    # (M, 3)
            sel = edge_ids[:, 0] >= 0
            if not sel.any():
                continue
            eids = edge_ids[sel]                              # (Ms, 3)
            msel = np.nonzero(sel)[0]
            tri = np.empty((len(msel), 3, 3))
            for vtx in range(3):
                ea = _EDGES[eids[:, vtx], 0]                  # tet-local ids
                eb = _EDGES[eids[:, vtx], 1]
                ca = tet[ea]                                  # cube corner ids
                cb = tet[eb]
                va = vals[ca, msel]
                vb = vals[cb, msel]
                t = (level - va) / (vb - va)
                pa = base[msel] + _CORNER_OFFSETS[ca]
                pb = base[msel] + _CORNER_OFFSETS[cb]
                tri[:, vtx, :] = pa + t[:, None] * (pb - pa)
            tris_out.append(tri)
    if not tris_out:
        return np.zeros((0, 3, 3))
    return np.concatenate(tris_out)


def _pad_quantum(n: int, q: int = 1 << 18) -> int:
    """Pad counts to 256k multiples (pow2 below that): bounded jit-cache
    churn with ≤8% padding at multi-M sizes — a pow2 pad wastes up to
    2× of downstream sampling work on the zero-area tail."""
    if n >= q:
        return (n + q - 1) // q * q
    return 1 << max(n - 1, 1).bit_length()


def marching_tetrahedra_device(volume, level: float = 0.5,
                               step_size: int = 1,
                               presmooth: int | None = None):
    """Device-side :func:`marching_tetrahedra`: the same Kuhn subdivision
    and case tables, evaluated as flat vectorized passes on the
    accelerator (all tensors batch-minor — coordinate/value planes of
    shape (·, M) — so nothing pads to the 128-lane tile).

    Two host synchronizations bound the dynamic output size (active-cube
    count, triangle count — each padded to a power of two so the jit
    cache sees a handful of shapes); everything else, including the
    box-presmooth, runs on device. Returns the same (n_tri, 3, 3) numpy
    vertex array in (z, y, x) voxel coordinates as the host extractor —
    same triangles, same case tables, order differing only by the
    flat-index sweep.

    ~4× faster than the host sweep at 256³/3.2M triangles (≈1.3 s vs
    5.3 s incl. the output pull on this rig)."""
    import jax
    import jax.numpy as jnp

    vol = np.ascontiguousarray(volume, np.float32)
    if step_size > 1:
        vol = vol[::step_size, ::step_size, ::step_size]
    if presmooth is None:
        presmooth = 1 if np.unique(vol).size <= 2 else 0
    nz, ny, nx = vol.shape
    if min(nz, ny, nx) < 2:
        return np.zeros((0, 3, 3))

    vol_d = _device_smooth(jnp.asarray(vol), presmooth)
    active = _device_active(vol_d, jnp.float32(level))
    m = int(jnp.sum(active))
    if m == 0:
        return np.zeros((0, 3, 3))
    m_pad = _pad_quantum(m)
    planes, valid = _device_march(vol_d, active, jnp.float32(level),
                                  m_pad, m)
    n_tri = int(jnp.sum(valid))
    if n_tri == 0:
        return np.zeros((0, 3, 3))
    n_pad = _pad_quantum(n_tri)
    tris = _device_compact(planes, valid, n_pad)       # (9, n_pad)
    out = np.asarray(tris)[:, :n_tri]                  # pull once
    out = out.T.reshape(n_tri, 3, 3).astype(np.float64)
    if step_size > 1:
        out *= step_size
    return out


def _device_smooth(vol, passes: int):
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("passes",))
    def run(v, passes):
        for _ in range(passes):
            for axis in range(3):
                lo = jnp.take(v, jnp.asarray([0]), axis=axis)
                hi = jnp.take(v, jnp.asarray([v.shape[axis] - 1]), axis=axis)
                ext = jnp.concatenate([lo, v, hi], axis=axis)
                n = v.shape[axis]
                sl = [slice(None)] * 3
                parts = []
                for o in range(3):
                    sl[axis] = slice(o, o + n)
                    parts.append(ext[tuple(sl)])
                v = (parts[0] + parts[1] + parts[2]) / 3.0
        return v
    return run(vol, passes)


def _device_active(vol, level):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(v, lvl):
        inside = v > lvl
        nz, ny, nx = v.shape
        any_in = jnp.zeros((nz - 1, ny - 1, nx - 1), bool)
        all_in = jnp.ones((nz - 1, ny - 1, nx - 1), bool)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    c = inside[dz:nz - 1 + dz, dy:ny - 1 + dy,
                               dx:nx - 1 + dx]
                    any_in = any_in | c
                    all_in = all_in & c
        return any_in & (~all_in)
    return run(vol, level)


def _device_march(vol, active, level, m_pad: int, m):
    """Triangle candidate planes for the active cubes: returns
    ``(planes, valid)`` with ``planes`` (9, 12·m_pad) — rows are
    (vertex, coord) = (v0z, v0y, v0x, v1z, ...) — and ``valid``
    (12·m_pad,). Padded cube slots point at cube 0, so every per-tet
    validity vector is ANDed with ``lane < m`` (``m`` = true active
    count, traced): without it, an active cube (0,0,0) would re-emit
    its triangles once per padded lane and the drag integrals would
    double-count."""
    import functools

    import jax
    import jax.numpy as jnp

    # every per-lane quantity stays 1-D (M,): per-case edge ids come from
    # host-precomputed (16,) lookup tables gathered by `case`, and the
    # corner offsets are recovered ARITHMETICALLY from the corner id's
    # bits — no (M, 3) intermediates (their minor dim pads to the
    # 128-lane tile, which made a first draft of this kernel 16× slower
    # than the host sweep it replaces)

    @functools.partial(jax.jit, static_argnames=("m_pad",))
    def run(v, act, lvl, m_pad, m):
        nz, ny, nx = v.shape
        flat = jnp.nonzero(act.ravel(), size=m_pad, fill_value=0)[0]
        real = jnp.arange(m_pad) < m                    # padded-lane mask
        ncyx = (ny - 1) * (nx - 1)
        zi = flat // ncyx
        yi = (flat // (nx - 1)) % (ny - 1)
        xi = flat % (nx - 1)
        vflat = v.ravel()
        vals = []                                       # 8 × (M,)
        for cid in range(8):
            dz, dy, dx = (cid >> 2) & 1, (cid >> 1) & 1, cid & 1
            vals.append(vflat[((zi + dz) * ny + (yi + dy)) * nx + (xi + dx)])
        zf = zi.astype(jnp.float32)
        yf = yi.astype(jnp.float32)
        xf = xi.astype(jnp.float32)

        def corner_val(c):
            """Per-lane value of corner id array ``c`` via an 8-way
            select over the static corner planes."""
            out = vals[0]
            for cid in range(1, 8):
                out = jnp.where(c == cid, vals[cid], out)
            return out

        planes_all = [[] for _ in range(9)]
        valid_all = []
        for t in range(6):
            tet = _TETS[t]                              # host ints
            tv = [vals[int(c)] for c in tet]            # static selects
            case = ((tv[0] > lvl).astype(jnp.int32)
                    + 2 * (tv[1] > lvl) + 4 * (tv[2] > lvl)
                    + 8 * (tv[3] > lvl))
            for kk in range(2):
                # host-precomputed (16,) tables: case → cube corner ids of
                # this vertex's edge endpoints (invalid cases → corner 0)
                e_clip = np.clip(_TRI_TABLE[:, kk, :], 0, 5)  # (16, 3)
                ok = jnp.asarray(
                    (_TRI_TABLE[:, kk, 0] >= 0))[case] & real
                for vtx in range(3):
                    ca_tab = tet[_EDGES[e_clip[:, vtx], 0]]   # (16,) host
                    cb_tab = tet[_EDGES[e_clip[:, vtx], 1]]
                    ca = jnp.asarray(ca_tab, jnp.int32)[case]  # (M,)
                    cb = jnp.asarray(cb_tab, jnp.int32)[case]
                    va = corner_val(ca)
                    vb = corner_val(cb)
                    tt = (lvl - va) / (vb - va)
                    # corner offsets from the id bits — no table gather
                    az = ((ca >> 2) & 1).astype(jnp.float32)
                    ay = ((ca >> 1) & 1).astype(jnp.float32)
                    ax = (ca & 1).astype(jnp.float32)
                    bz = ((cb >> 2) & 1).astype(jnp.float32)
                    by = ((cb >> 1) & 1).astype(jnp.float32)
                    bx = (cb & 1).astype(jnp.float32)
                    planes_all[3 * vtx + 0].append(
                        zf + az + tt * (bz - az))
                    planes_all[3 * vtx + 1].append(
                        yf + ay + tt * (by - ay))
                    planes_all[3 * vtx + 2].append(
                        xf + ax + tt * (bx - ax))
                valid_all.append(ok)
        planes = jnp.stack(
            [jnp.concatenate(row) for row in planes_all])   # (9, 12·M)
        valid = jnp.concatenate(valid_all)                  # (12·M,)
        return planes, valid
    return run(vol, active, level, m_pad, jnp.int32(m))


def _device_compact(planes, valid, n_pad: int):
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n_pad",))
    def run(p, ok, n_pad):
        idx = jnp.nonzero(ok, size=n_pad, fill_value=0)[0]
        return jnp.take(p, idx, axis=1)
    return run(planes, valid, n_pad)


def mesh_geometry_device(label_vol, level: float = 0.5,
                         spacing=(1.0, 1.0, 1.0), step_size: int = 1,
                         presmooth: int | None = None):
    """Marching tetrahedra + triangle geometry + normal orientation as
    one device pipeline — nothing but two scalar counts crosses the
    host boundary (the 117 MB triangle pull dominated the device
    extractor when the mesh came back to the host).

    Returns ``(geo, n_tri)`` where ``geo`` is a dict of DEVICE arrays in
    lane-major layout, padded to ``n_pad`` triangles with zero areas
    (so integrals over the padded tail vanish): centroid planes
    ``cz, cy, cx`` (voxel coords), oriented physical unit-normal planes
    ``nzp, nyp, nxp``, and physical ``areas``. Semantics match
    :func:`triangle_geometry` + :func:`orient_normals` (orientation
    probes the raw label volume trilinearly at ±0.5 voxel)."""
    import jax
    import jax.numpy as jnp

    vol = np.ascontiguousarray(label_vol, np.float32)
    if step_size > 1:
        vol = vol[::step_size, ::step_size, ::step_size]
    if presmooth is None:
        presmooth = 1 if np.unique(vol).size <= 2 else 0
    nz, ny, nx = vol.shape
    if min(nz, ny, nx) < 2:
        return None, 0

    raw_d = jnp.asarray(vol)
    vol_d = _device_smooth(raw_d, presmooth)
    active = _device_active(vol_d, jnp.float32(level))
    m = int(jnp.sum(active))
    if m == 0:
        return None, 0
    m_pad = _pad_quantum(m)
    planes, valid = _device_march(vol_d, active, jnp.float32(level),
                                  m_pad, m)
    n_tri = int(jnp.sum(valid))
    if n_tri == 0:
        return None, 0
    n_pad = _pad_quantum(n_tri)
    tris = _device_compact(planes, valid, n_pad)       # (9, n_pad)
    geo = _device_geometry_orient(tris, raw_d,
                                  jnp.asarray(spacing, jnp.float32),
                                  jnp.int32(n_tri),
                                  jnp.float32(step_size))
    return geo, n_tri


def _device_geometry_orient(tris, raw_vol, spacing_zyx, n_tri, scale):
    """(9, N) vertex planes → lane-major centroids / oriented physical
    normals / areas (areas zeroed beyond ``n_tri``). ``scale`` rescales
    step_size-coarsened voxel coordinates back to the full lattice."""
    import functools

    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(tris, vol, sp, n_tri, scale):
        v = [tris[i] for i in range(9)]                # 9 × (N,) z,y,x ×3
        dz_, dy_, dx_ = sp[0], sp[1], sp[2]
        # physical edge vectors (note planes are (z, y, x))
        e1z, e1y, e1x = ((v[3] - v[0]) * dz_, (v[4] - v[1]) * dy_,
                         (v[5] - v[2]) * dx_)
        e2z, e2y, e2x = ((v[6] - v[0]) * dz_, (v[7] - v[1]) * dy_,
                         (v[8] - v[2]) * dx_)
        # 0.5 · e1 × e2 in (z, y, x) component order, matching
        # triangle_geometry's np.cross on (z, y, x) triples
        crz = 0.5 * (e1y * e2x - e1x * e2y)
        cry = 0.5 * (e1x * e2z - e1z * e2x)
        crx = 0.5 * (e1z * e2y - e1y * e2z)
        area = jnp.sqrt(crz * crz + cry * cry + crx * crx)
        inv = 1.0 / jnp.maximum(area, 1e-20)
        nzp, nyp, nxp = crz * inv, cry * inv, crx * inv
        cz = (v[0] + v[3] + v[6]) / 3.0
        cy = (v[1] + v[4] + v[7]) / 3.0
        cx = (v[2] + v[5] + v[8]) / 3.0

        # orientation probe on the raw label volume (trilinear, ±0.5
        # voxel along the voxel-space normal — orient_normals semantics)
        nvz = nzp / dz_
        nvy = nyp / dy_
        nvx = nxp / dx_
        nrm = 1.0 / jnp.maximum(
            jnp.sqrt(nvz * nvz + nvy * nvy + nvx * nvx), 1e-20)
        nvz, nvy, nvx = nvz * nrm, nvy * nrm, nvx * nrm
        from jax.scipy.ndimage import map_coordinates as jmap
        ahead = jmap(vol, [cz + 0.5 * nvz, cy + 0.5 * nvy,
                           cx + 0.5 * nvx], order=1, mode="nearest")
        behind = jmap(vol, [cz - 0.5 * nvz, cy - 0.5 * nvy,
                            cx - 0.5 * nvx], order=1, mode="nearest")
        sgn = jnp.where(ahead < behind, -1.0, 1.0)
        nzp, nyp, nxp = nzp * sgn, nyp * sgn, nxp * sgn

        lane = jnp.arange(tris.shape[1])
        area = jnp.where(lane < n_tri, area, 0.0) * (scale * scale)
        return {"cz": cz * scale, "cy": cy * scale, "cx": cx * scale,
                "nzp": nzp, "nyp": nyp, "nxp": nxp, "areas": area}
    return run(tris, raw_vol, spacing_zyx, n_tri, scale)


def triangle_geometry(tri_verts: np.ndarray, spacing=(1.0, 1.0, 1.0)):
    """Centroids, physical areas, and unit normals of (n, 3, 3) triangles.

    ``spacing`` is (dz, dy, dx); areas/normals are computed in physical
    space exactly as the reference does (`velocity_analysis.py:550-564`).
    Normals are unoriented here — see :func:`orient_normals`.
    """
    sp = np.asarray(spacing, np.float64)
    v0, v1, v2 = tri_verts[:, 0], tri_verts[:, 1], tri_verts[:, 2]
    e1 = (v1 - v0) * sp
    e2 = (v2 - v0) * sp
    n_scaled = 0.5 * np.cross(e1, e2)
    areas = np.linalg.norm(n_scaled, axis=1)
    normals = n_scaled / np.maximum(areas[:, None], 1e-20)
    centroids = tri_verts.mean(axis=1)
    return centroids, areas, normals


def orient_normals(normals: np.ndarray, centroids: np.ndarray,
                   volume: np.ndarray,
                   spacing=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Flip normals to point toward increasing ``volume`` (into the labeled
    phase) — skimage's marching-cubes convention, which the reference's
    drag math relies on. The field is sampled trilinearly at ±0.5 voxel
    along each normal; the normal keeps the direction of the larger value
    (robust on binary step volumes where voxel gradients vanish).

    ``normals`` are physical-space unit normals while ``centroids`` are in
    voxel-index coordinates, so the probe direction is converted with
    ``spacing`` (dz, dy, dx) — on anisotropic grids the raw physical vector
    points the wrong way in index space."""
    from scipy.ndimage import map_coordinates as _scipy_map

    vol = np.ascontiguousarray(volume, np.float64)
    sp = np.asarray(spacing, np.float64)
    n_vox = normals / sp
    n_vox = n_vox / np.maximum(
        np.linalg.norm(n_vox, axis=1, keepdims=True), 1e-20)
    ahead = _scipy_map(vol, (centroids + 0.5 * n_vox).T, order=1,
                       mode="nearest")
    behind = _scipy_map(vol, (centroids - 0.5 * n_vox).T, order=1,
                        mode="nearest")
    flip = ahead < behind
    out = normals.copy()
    out[flip] *= -1
    return out
