"""Matrix-free Krylov solvers (pytree-generic preconditioned CG).

Replaces the reference's scipy ``lsqr``/``cg`` calls
(`/root/reference/physics.py:186,337-340,485`). The linear operators here
are fused stencils, so each CG iteration is a handful of elementwise
kernels plus two global reductions — under ``pjit`` the reductions become
``psum`` over the device mesh and the stencils exchange one-voxel halos.

Singular (pure-Neumann) systems are handled by explicit null-space
projection each iteration, which reproduces the role of the reference's
``b − mean(b)`` compatibility shift plus LSQR's least-squares robustness.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


def _dot(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return sum(jnp.vdot(x.astype(jnp.float32), y.astype(jnp.float32))
               for x, y in zip(leaves_a, leaves_b))


def _axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


class CGResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    residual_norm: jax.Array
    converged: jax.Array


def pcg(A: Callable, b, x0=None, M_inv: Optional[Callable] = None,
        project: Optional[Callable] = None, tol: float = 1e-8,
        maxiter: int = 1000) -> CGResult:
    """Preconditioned conjugate gradients for SPD (or PSD + projected) A.

    Parameters
    ----------
    A : linear operator over a pytree.
    M_inv : preconditioner application (approximate A⁻¹).
    project : projector onto range(A) applied to residuals/iterates each
        iteration — pass the zero-mean projector for pure-Neumann Poisson.
    """
    if x0 is None:
        x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
    if project is not None:
        b = project(b)

    r = _axpy(-1.0, A(x0), b)
    if project is not None:
        r = project(r)
    z = M_inv(r) if M_inv is not None else r
    if project is not None and M_inv is not None:
        z = project(z)   # keep preconditioned directions out of the null space
    p = z
    rz = _dot(r, z)
    b_norm = jnp.sqrt(_dot(b, b))
    atol2 = (tol * b_norm) ** 2

    def cond(state):
        _, r, _, _, rz, it = state
        rr = _dot(r, r)
        return (rr > atol2) & (it < maxiter)

    def body(state):
        x, r, z, p, rz, it = state
        Ap = A(p)
        if project is not None:
            Ap = project(Ap)
        alpha = rz / jnp.maximum(_dot(p, Ap), 1e-37)
        x = _axpy(alpha, p, x)
        r = _axpy(-alpha, Ap, r)
        if project is not None:
            r = project(r)
        z = M_inv(r) if M_inv is not None else r
        if project is not None and M_inv is not None:
            z = project(z)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-37)
        p = _axpy(beta, p, z)
        return x, r, z, p, rz_new, it + 1

    x, r, _, _, _, it = jax.lax.while_loop(
        cond, body, (x0, r, z, p, rz, jnp.int32(0)))
    rr = jnp.sqrt(_dot(r, r))
    return CGResult(x=x, iterations=it, residual_norm=rr,
                    converged=rr <= jnp.sqrt(atol2))
