"""From-scratch Krylov / Newton solvers (the PETSc-KSP/SNES replacement).

Replaces the reference's linear-solver surface (SURVEY.md §2.3):
``Conjugate_Gradient_Method`` (dense, MaxIter=25, src/Linear-Solvers/
Conjugate-Gradient.c:6), ``Jacobi_Conjugate_Gradient_Method``
(Jacobi-Conjugate-Gradient.c:3), the LAPACK LU fallback, and the PETSc
SNES+KSP+PCJACOBI stack embedded in U-Newmark-beta.c:270-356.

TPU-native design:
* operators are *functions* (matrix-free SpMV or assembled BSR apply) — CG
  never sees a matrix layout;
* fixed-shape ``lax.while_loop`` iterations, convergence by masked residual
  norms — jit/vmap/shard_map friendly;
* all reductions are plain ``jnp.sum``/``vdot`` so they lower to ``psum``
  under shard_map on a device mesh.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    residual: jax.Array  # final ||r||


def _vdot(a, b):
    return jnp.sum(a * b)


def pcg(
    A: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    M_inv: Optional[Callable[[jax.Array], jax.Array]] = None,
    x0: Optional[jax.Array] = None,
    tol: float = 1e-7,
    atol: float = 0.0,
    maxiter: int = 100,
) -> CGResult:
    """Preconditioned conjugate gradients on an SPD operator.

    Matches the reference's Jacobi-CG semantics
    (Jacobi-Conjugate-Gradient.c: relative tolerance on ||r||) but with a
    functional operator and fixed-bound while_loop.
    """
    if M_inv is None:
        M_inv = lambda r: r
    x = jnp.zeros_like(b) if x0 is None else x0

    r = b - A(x)
    z = M_inv(r)
    p = z
    rz = _vdot(r, z)
    bnorm = jnp.sqrt(_vdot(b, b))
    threshold = jnp.maximum(tol * bnorm, atol)

    def cond(state):
        x, r, p, rz, it = state
        return (jnp.sqrt(_vdot(r, r)) > threshold) & (it < maxiter)

    def body(state):
        x, r, p, rz, it = state
        Ap = A(p)
        pAp = _vdot(p, Ap)
        alpha = rz / jnp.where(pAp == 0.0, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_inv(r)
        rz_new = _vdot(r, z)
        beta = rz_new / jnp.where(rz == 0.0, 1.0, rz)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    x, r, p, rz, it = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.array(0)))
    return CGResult(x=x, iters=it, residual=jnp.sqrt(_vdot(r, r)))


class NewtonResult(NamedTuple):
    x: jax.Array
    iters: jax.Array
    residual_norm: jax.Array
    converged: jax.Array


def newton_krylov(
    residual: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    M_inv: Optional[Callable[[jax.Array], jax.Array]] = None,
    tol: float = 1e-5,
    maxiter: int = 20,
    cg_tol: float = 1e-7,
    cg_maxiter: int = 100,
) -> NewtonResult:
    """Newton's method with matrix-free Jacobian-vector products.

    The Jacobian action J·v is computed by forward-mode AD through the
    residual (jax.jvp) — the *exact consistent tangent* for every
    constitutive model, with no hand-assembled stiffness densities
    (replaces __jacobian_evaluation, U-Newmark-beta.c:1646-1830).

    Convergence: ||R|| <= tol * max(1, ||R_0||)  (the reference's SNES rtol
    semantics, U-Newmark-beta.c:336-343).
    """

    r0 = residual(x0)
    r0_norm = jnp.sqrt(_vdot(r0, r0))
    threshold = tol * jnp.maximum(1.0, r0_norm)
    # Float32 noise floor: P2G reductions accumulate O(100s·eps) of relative
    # error, so ||R|| plateaus around ~1e3·eps·||R_0|| no matter how many
    # Newton iterations run (the reference's 1e-5 TOL assumes f64).  Detect
    # stagnation and accept if the residual dropped by >100x.
    eps = jnp.finfo(r0.dtype).eps

    def cond(state):
        x, r, rnorm, best, stall_count, it = state
        return (rnorm > threshold) & (it < maxiter) & (stall_count < 3)

    def body(state):
        x, r, rnorm, best, stall_count, it = state

        def Jv(v):
            return jax.jvp(residual, (x,), (v,))[1]

        dx = pcg(Jv, -r, M_inv=M_inv, tol=cg_tol, maxiter=cg_maxiter).x

        # Backtracking line search (the reference's SNESNEWTONLS,
        # U-Newmark-beta.c:281): evaluate a fixed candidate set and keep the
        # step with the smallest residual — branch-free, jit-stable.
        def eval_alpha(alpha):
            r_a = residual(x + alpha * dx)
            return jnp.sqrt(_vdot(r_a, r_a))

        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.0625], dx.dtype)
        norms = jnp.stack([eval_alpha(a) for a in [1.0, 0.5, 0.25, 0.0625]])
        k = jnp.argmin(norms)
        x_new = x + alphas[k] * dx
        r_new = residual(x_new)
        rnorm_new = norms[k]
        improved = rnorm_new < 0.5 * best
        stall_count = jnp.where(improved, 0, stall_count + 1)
        best = jnp.minimum(best, rnorm_new)
        return (x_new, r_new, rnorm_new, best, stall_count, it + 1)

    x, r, rnorm, best, stall_count, it = jax.lax.while_loop(
        cond, body, (x0, r0, r0_norm, r0_norm, jnp.array(0), jnp.array(0))
    )
    converged = (rnorm <= threshold) | (
        (stall_count >= 3) & (rnorm <= 1e-2 * r0_norm)
    )
    return NewtonResult(x=x, iters=it, residual_norm=rnorm, converged=converged)
