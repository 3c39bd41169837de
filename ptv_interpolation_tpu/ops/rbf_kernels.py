"""Radial basis function kernels (scipy ``RBFInterpolator`` conventions).

Sign conventions follow scipy's ``_rbfinterp_pythran`` so that the kernel
matrix is conditionally positive (semi)definite together with the minimum
polynomial degree, and results are directly comparable with the reference's
``RBFInterpolator`` path (`/root/reference/interpolator.py:157-195`).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import xlogy

# minimal polynomial degree required for conditional positive definiteness
MIN_DEGREE = {
    "linear": 0,
    "thin_plate_spline": 1,
    "cubic": 1,
    "quintic": 2,
    "multiquadric": 0,
    "inverse_multiquadric": -1,
    "inverse_quadratic": -1,
    "gaussian": -1,
}

# kernels for which the *negative* system (−A) is positive definite without
# any polynomial tail — these admit a pure dense Cholesky solve
PD_KERNELS = ("inverse_multiquadric", "inverse_quadratic", "gaussian")

# scale-invariant kernels where scipy forbids a user epsilon ≠ 1
SCALE_INVARIANT = ("linear", "thin_plate_spline", "cubic", "quintic")


def kernel_value(name: str, r):
    """φ(r) with scipy's sign conventions; r ≥ 0 (already ε-scaled)."""
    if name == "linear":
        return -r
    if name == "thin_plate_spline":
        return xlogy(r * r, r)          # r² log r, exact 0 at r=0
    if name == "cubic":
        return r * r * r
    if name == "quintic":
        return -(r ** 5)
    if name == "multiquadric":
        return -jnp.sqrt(r * r + 1.0)
    if name == "inverse_multiquadric":
        return 1.0 / jnp.sqrt(r * r + 1.0)
    if name == "inverse_quadratic":
        return 1.0 / (r * r + 1.0)
    if name == "gaussian":
        return jnp.exp(-(r * r))
    raise ValueError(f"unknown RBF kernel {name!r}")


def polynomial_basis(x, degree: int):
    """Monomial basis of total degree ≤ ``degree`` on (…, 3) coords.

    degree -1 → empty, 0 → [1], 1 → [1, x, y, z],
    2 → [1, x, y, z, x², xy, xz, y², yz, z²] (10 terms).
    """
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    if degree < 0:
        return jnp.zeros(x.shape[:-1] + (0,), x.dtype)
    if degree == 0:
        return ones
    terms = [ones, x]
    if degree >= 2:
        xx = x[..., :, None] * x[..., None, :]
        iu, ju = jnp.triu_indices(3)
        terms.append(xx[..., iu, ju])
    if degree >= 3:
        raise NotImplementedError("polynomial degree > 2 not supported")
    return jnp.concatenate(terms, axis=-1)


def n_poly_terms(degree: int) -> int:
    return {-1: 0, 0: 1, 1: 4, 2: 10}[degree]
