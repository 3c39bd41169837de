"""Analytical physics validation suite (pytest port of the reference's
`validate_analysis.py` — closed-form flows → computed invariants)."""

import numpy as np
import pytest

from ptv_interpolation_tpu.analysis import (
    compute_astarita_flow_type, compute_permeability,
    compute_permeability_from_pressure, compute_pressure_field,
    compute_strain_rate, compute_viscous_dissipation, compute_vorticity,
)


def _grid(N=32, L=1.0):
    x = np.linspace(0, L, N)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    d = x[1] - x[0]
    return X, Y, Z, d


def _to_lib(f):
    """(x,y,z)-indexed array → library (z,y,x) layout."""
    return np.ascontiguousarray(f.transpose(2, 1, 0))


def test_simple_shear_couette():
    """u = γ̇ y: strain = vorticity = γ̇, ξ = 0 (validate_analysis.py:32-76)."""
    gamma = 5.0
    X, Y, Z, d = _grid()
    u = _to_lib(gamma * Y)
    v = w = np.zeros_like(u)
    sr = np.asarray(compute_strain_rate(u, v, w, d, d, d))
    vm = np.asarray(compute_vorticity(u, v, w, d, d, d))
    xi = np.asarray(compute_astarita_flow_type(sr, vm))
    mid = 16
    assert np.allclose(sr[mid, mid, mid], gamma, rtol=1e-2)
    assert np.allclose(vm[mid, mid, mid], gamma, rtol=1e-2)
    assert np.allclose(xi[mid, mid, mid], 0.0, atol=1e-2)


def test_pure_extension():
    """u = Ex, v = −Ey: strain = 2E, vorticity = 0, ξ = 1 (:78-122)."""
    E = 2.0
    X, Y, Z, d = _grid()
    u = _to_lib(E * X)
    v = _to_lib(-E * Y)
    w = np.zeros_like(u)
    sr = np.asarray(compute_strain_rate(u, v, w, d, d, d))
    vm = np.asarray(compute_vorticity(u, v, w, d, d, d))
    xi = np.asarray(compute_astarita_flow_type(sr, vm))
    mid = 16
    assert np.allclose(sr[mid, mid, mid], 2 * E, rtol=1e-2)
    assert np.allclose(vm[mid, mid, mid], 0.0, atol=1e-2)
    assert np.allclose(xi[mid, mid, mid], 1.0, atol=1e-2)


def test_solid_body_rotation():
    """u = −Ω(y−y₀), v = Ω(x−x₀): strain = 0, vorticity = 2Ω, ξ = −1
    (:124-169)."""
    Omega, L = 3.0, 1.0
    X, Y, Z, d = _grid()
    u = _to_lib(-Omega * (Y - L / 2))
    v = _to_lib(Omega * (X - L / 2))
    w = np.zeros_like(u)
    sr = np.asarray(compute_strain_rate(u, v, w, d, d, d))
    vm = np.asarray(compute_vorticity(u, v, w, d, d, d))
    xi = np.asarray(compute_astarita_flow_type(sr, vm))
    mid = 16
    assert np.allclose(sr[mid, mid, mid], 0.0, atol=1e-2)
    assert np.allclose(vm[mid, mid, mid], 2 * Omega, rtol=1e-2)
    assert np.allclose(xi[mid, mid, mid], -1.0, atol=1e-2)


def test_permeability_energy_balance():
    """Pilotti energy balance k = μ U₀²/⟨Φ⟩ on Darcy+shear field (:171-215)."""
    N, L = 32, 1e-3
    U0, mu, gamma = 1e-4, 1e-3, 1.0
    x = np.linspace(0, L, N)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    d = x[1] - x[0]
    u = _to_lib(U0 + gamma * Y)
    v = w = np.zeros_like(u)
    sr = compute_strain_rate(u, v, w, d, d, d)
    phi = compute_viscous_dissipation(sr, mu, d, d, d)
    k = float(compute_permeability(u, v, w, phi, mu, d, d, d))
    U_darcy = U0 + gamma * L / 2
    k_exp = mu * U_darcy ** 2 / (mu * gamma ** 2)
    assert np.allclose(k, k_exp, rtol=1e-2)


@pytest.fixture(scope="module")
def poiseuille_pipe():
    """3D Poiseuille pipe along Z (validate_analysis.py:217-278 setup)."""
    nz = ny = nx = 40
    d = 20e-6
    mu = 1e-3
    coords = np.arange(40) * d
    z, y, x = np.meshgrid(coords, coords, coords, indexing="ij")
    cy, cx = coords.mean(), coords.mean()
    radius = 15 * d
    r2 = (y - cy) ** 2 + (x - cx) ** 2
    mask = r2 < radius ** 2
    U_max = 1e-3
    w = U_max * (1 - r2 / radius ** 2)
    w[~mask] = 0.0
    return dict(z=z, y=y, x=x, r2=r2, mask=mask, w=w, d=d, mu=mu,
                radius=radius, U_max=U_max)


def test_pressure_recovery_poiseuille(poiseuille_pipe):
    """Recovered ∇P vs analytical −4μU/R² within 10% (:217-278)."""
    pp = poiseuille_pipe
    d, mu = pp["d"], pp["mu"]
    u = np.zeros_like(pp["w"])
    v = np.zeros_like(pp["w"])
    p = np.asarray(compute_pressure_field(
        u, v, pp["w"], d, d, d, mu, mask=pp["mask"],
        wall_bc="inhomogeneous", verbose=False, tol=1e-10))
    expected = -4 * mu * pp["U_max"] / pp["radius"] ** 2
    dp_dz = np.gradient(p, d, axis=0)
    core = (pp["r2"] < (0.5 * pp["radius"]) ** 2) & (pp["z"] > 5 * d) \
        & (pp["z"] < 35 * d)
    measured = dp_dz[core].mean()
    err = abs((measured - expected) / expected)
    assert err < 0.10, f"pressure gradient error {err:.2%}"


def test_darcy_permeability_consistency(poiseuille_pipe):
    """k from pressure gradient has the right scale on the pipe flow."""
    pp = poiseuille_pipe
    d, mu = pp["d"], pp["mu"]
    u = np.zeros_like(pp["w"])
    # analytic linear pressure field
    grad_p = -4 * mu * pp["U_max"] / pp["radius"] ** 2
    p = grad_p * pp["z"]
    k = float(compute_permeability_from_pressure(u, u, pp["w"], p, mu,
                                                 d, d, d))
    # k = -mu * mean(w) * grad_p / grad_p^2
    k_exp = -mu * pp["w"].mean() / grad_p
    assert np.allclose(k, k_exp, rtol=1e-2)


def test_fused_derivative_fields_match_individual():
    """compute_derivative_fields (the one-dispatch analysis program) is
    bit-identical to the individual stage functions it fuses."""
    from ptv_interpolation_tpu.analysis import compute_derivative_fields
    rng = np.random.RandomState(7)
    n = 24
    u, v, w = (rng.randn(n, n, n).astype(np.float32) for _ in range(3))
    mask = rng.rand(n, n, n) > 0.3
    d = 0.7
    mu = 1e-3

    fused = compute_derivative_fields(u, v, w, d, d, d, mu, mask,
                                      want_strain=True, want_diss=True,
                                      want_vort=True, want_xi=True)
    sr = np.asarray(compute_strain_rate(u, v, w, d, d, d, mask))
    diss = np.asarray(compute_viscous_dissipation(sr, mu, d, d, d, mask))
    vm = np.asarray(compute_vorticity(u, v, w, d, d, d, mask))
    xi = np.asarray(compute_astarita_flow_type(sr, vm, mask))

    np.testing.assert_array_equal(np.asarray(fused["strain_rate"]), sr)
    np.testing.assert_array_equal(np.asarray(fused["dissipation"]), diss)
    np.testing.assert_array_equal(np.asarray(fused["vorticity"]), vm)
    np.testing.assert_array_equal(np.asarray(fused["xi"]), xi)

    # partial selections compile and return exactly the requested keys
    only_vort = compute_derivative_fields(u, v, w, d, d, d, mu, mask,
                                          want_strain=False, want_diss=False,
                                          want_vort=True, want_xi=False)
    assert set(only_vort) == {"vorticity"}
